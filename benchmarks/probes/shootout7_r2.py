"""Shootout 7 — sort tail + hash-claim primitive (completes 5/6):
sort-groupby@10M, argsort i32, top_k, gather, searchsorted, and the
open-addressing claim scatter (colliding u32 min at ~50% fill) that the
enable_hash_groupby decision depends on.

Run:  /opt/venv/bin/python -m benchmarks.shootout7_r2
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t():
    return time.perf_counter()


_counter = [900]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.random(n).astype(np.float32))

    def compile_chain(body, K):
        def looped(carry0, *cs):
            def step(i, carry):
                return body(carry, *cs)

            return jax.lax.fori_loop(0, K, step, carry0)

        return jax.jit(looped)

    def timed_call(fn, consts):
        _counter[0] += 1
        c0 = jnp.float32(_counter[0] * 0.001 + 1.0)
        t0 = t()
        out = fn(c0, *consts)
        float(jax.device_get(out))
        return t() - t0

    def bench(name, body, *consts, klo=2, khi=8):
        flo = compile_chain(body, klo)
        fhi = compile_chain(body, khi)
        timed_call(flo, consts)
        timed_call(fhi, consts)
        tlo = min(timed_call(flo, consts) for _ in range(2))
        thi = min(timed_call(fhi, consts) for _ in range(2))
        per = max(thi - tlo, 0.0) / (khi - klo)
        log(f"{name}: {per*1e3:.2f}ms/op  (Tlo={tlo:.2f}s Thi={thi:.2f}s)")
        return per

    # ---- hash-claim: colliding u32 min scatter at ~50% fill ----
    # (the BaselineHash slot-claim primitive; NDV=1M keys, table 2M)
    ndv = 1_000_000
    table_n = 2 * ndv
    keys = jnp.asarray(rng.integers(0, 1 << 62, n), jnp.int64)

    def claim_body(carry, kk):
        k2 = kk + carry.astype(jnp.int64)
        h = (k2.astype(jnp.uint64)
             * jnp.uint64(0x9E3779B97F4A7C15)) >> jnp.uint64(34)
        slot = (h % jnp.uint64(table_n)).astype(jnp.int32)
        fp = (k2 & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        claimed = jnp.full(table_n, jnp.uint32(0xFFFFFFFF)).at[slot].min(fp)
        return carry * 0.5 + (claimed[0] % 3).astype(jnp.float32)

    bench("claim u32-min scatter 20M->2M tbl", claim_body, keys)

    # ---- sort-groupby at 10M sparse slots (BH003/BH004 shape) ----
    slots = 10_000_000
    g = jnp.asarray(rng.integers(0, slots, n), jnp.int32)

    def sortgb_body(carry, gg, vv):
        g2 = (gg + carry.astype(jnp.int32)) % slots
        order = jnp.argsort(g2)
        sg = g2[order]
        sv = vv[order]
        seg = jnp.concatenate([jnp.ones(1, jnp.bool_), sg[1:] != sg[:-1]])
        sid = jnp.cumsum(seg.astype(jnp.int32)) - 1
        sm = jnp.zeros(slots, jnp.float32).at[sid].add(sv, mode="drop")
        return carry * 0.5 + sm[0] * 1e-9 + (sid[-1] % 3).astype(jnp.float32)

    bench("sort-groupby 10M slots", sortgb_body, g, v, klo=2, khi=6)

    def topk_body(carry, vv):
        vals, _ = jax.lax.top_k(vv + carry * 1e-9, 100)
        return carry * 0.5 + vals[0]

    bench("lax.top_k(100) 20M", topk_body, v, klo=2, khi=10)

    k32 = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)

    def argsort_body(carry, kk):
        o = jnp.argsort(kk ^ carry.astype(jnp.int32))
        return carry * 0.5 + (o[0] % 3).astype(jnp.float32)

    bench("argsort 20M i32", argsort_body, k32, klo=2, khi=6)

    build_n = 1_000_000
    tbl = jnp.asarray(rng.integers(0, 100, build_n), jnp.int32)
    pk = jnp.asarray(rng.integers(0, build_n, n), jnp.int64)

    def gather_body(carry, keys2, table):
        r = table[(keys2 + carry.astype(jnp.int64)) % build_n]
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("gather 20M from 1M", gather_body, pk, tbl, klo=4, khi=36)

    sk = jnp.asarray(np.arange(build_n, dtype=np.int64))

    def ss_body(carry, keys2, skk):
        r = jnp.searchsorted(skk, (keys2 + carry.astype(jnp.int64))
                             % build_n)
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("searchsorted 20M in 1M", ss_body, pk, sk, klo=4, khi=36)

    log("shootout7 done")


if __name__ == "__main__":
    main()
