"""Shootout 6 — crossover + sort tail (complements shootout5):
one-hot vs scatter at 2k-32k slots, sort-groupby at 10M slots, top_k,
argsort, gather, searchsorted.  Same AOT chained protocol.

Run:  /opt/venv/bin/python -m benchmarks.shootout6_r2
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t():
    return time.perf_counter()


_counter = [500]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.random(n).astype(np.float32))

    def compile_chain(body, K, nconsts):
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

    def bench(name, body, *consts, klo=4, khi=20):
        flo = compile_chain(body, klo, len(consts))
        fhi = compile_chain(body, khi, len(consts))
        timed_call(flo, consts)
        timed_call(fhi, consts)
        tlo = min(timed_call(flo, consts) for _ in range(2))
        thi = min(timed_call(fhi, consts) for _ in range(2))
        per = max(thi - tlo, 0.0) / (khi - klo)
        log(f"{name}: {per*1e3:.2f}ms/op  (Tlo={tlo:.2f}s Thi={thi:.2f}s)")
        return per

    from heavydb_tpu.ops.groupby import _onehot_scan

    for slots in (2048, 4096, 8192, 16384, 32768):
        g = jnp.asarray(rng.integers(0, slots, n), jnp.int32)

        def onehot_body(carry, gg, vv):
            g2 = (gg + carry.astype(jnp.int32)) % slots
            m = jnp.ones(n, jnp.bool_)
            res = _onehot_scan(g2, m, [vv], slots)
            return carry * 0.5 + (res[0][0] % 3).astype(jnp.float32) \
                + res[1][0] * 1e-9

        bench(f"onehot cnt+sum slots={slots}", onehot_body, g, v,
              klo=2, khi=8)

    # sort-based group-by at 10M sparse slots (the BH003/BH004 shape)
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

    def scatter10_body(carry, gg, vv):
        g2 = (gg + carry.astype(jnp.int32)) % slots
        cnt = jnp.zeros(slots, jnp.int32).at[g2].add(1, mode="drop")
        sm = jnp.zeros(slots, jnp.float32).at[g2].add(vv, mode="drop")
        return carry * 0.5 + (cnt[0] % 3).astype(jnp.float32) + sm[0] * 1e-9

    bench("scatter cnt+sum 10M slots", scatter10_body, g, v, klo=2, khi=8)

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

    def gather_body(carry, keys, table):
        r = table[(keys + carry.astype(jnp.int64)) % build_n]
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("gather 20M from 1M", gather_body, pk, tbl, klo=4, khi=36)

    sk = jnp.asarray(np.arange(build_n, dtype=np.int64))

    def ss_body(carry, keys, skk):
        r = jnp.searchsorted(skk, (keys + carry.astype(jnp.int64)) % build_n)
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("searchsorted 20M in 1M", ss_body, pk, sk, klo=4, khi=36)

    log("shootout6 done")


if __name__ == "__main__":
    main()
