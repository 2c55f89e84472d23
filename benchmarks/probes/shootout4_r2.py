"""Strategy shootout v4 — in-jit carry-chained loops.

The axon relay makes host-side timing useless: block_until_ready returns
before remote completion, identical executions memoize, and scalar D2H
round-trips cost ~26s with seconds of jitter.  The only trustworthy
instrument: ONE executable running K data-dependent iterations of the op
(carry feeds iteration i+1, so XLA can neither elide nor overlap them),
measured at two K values; device time/op = (T_hi - T_lo) / (K_hi - K_lo).
Each T is wall time to a completed D2H of the final carry — the 26s
constant cancels in the difference.

Run:  /opt/venv/bin/python -m benchmarks.shootout4_r2
"""

import sys
import time

import numpy as np

K_LO, K_HI = 16, 144  # 128 net iterations


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t():
    return time.perf_counter()


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from functools import partial

    log(f"backend={jax.default_backend()} K={K_LO}->{K_HI}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.random(n).astype(np.float32))

    # D2H distribution (distinct values to defeat memoization)
    d2h = []
    for i in range(3):
        x = jnp.float32(i)
        t0 = t()
        float(jax.device_get(x + 1))
        d2h.append(t() - t0)
    log("scalar D2H secs: " + " ".join(f"{x:.1f}" for x in d2h))

    def run_chain(body, K, *consts):
        @partial(jax.jit, static_argnums=())
        def looped(carry0):
            def step(i, carry):
                return body(carry, *consts)

            return jax.lax.fori_loop(0, K, step, carry0)

        t0 = t()
        out = looped(jnp.float32(1.0))
        val = float(jax.device_get(out))
        return t() - t0, val

    def bench(name, body, *consts, klo=K_LO, khi=K_HI):
        # warm-compile both K variants (cheap via compile cache on reruns)
        run_chain(body, klo, *consts)
        run_chain(body, khi, *consts)
        tlo, _ = run_chain(body, klo, *consts)
        thi, _ = run_chain(body, khi, *consts)
        per = max(thi - tlo, 0.0) / (khi - klo)
        log(f"{name}: {per*1e3:.1f}ms/op   (T{klo}={tlo:.1f}s T{khi}={thi:.1f}s)")
        return per

    # ---- memory-bound ceiling: filter+sum ----
    def scan_body(carry, vv):
        m = vv > (carry % 1.0)
        return carry * 0.999 + jnp.where(m, vv, 0).sum() * 1e-9

    per = bench("scan+filter+sum 20M f32", scan_body, v)
    log(f"  -> {n*4/max(per,1e-9)/1e9:.0f} GB/s effective")

    # ---- group-by strategies ----
    for slots in (1000, 65536, 1 << 20, 10_000_000):
        g = jnp.asarray(rng.integers(0, slots, n), jnp.int32)

        def scatter_body(carry, gg, vv):
            g2 = (gg + carry.astype(jnp.int32)) % slots
            cnt = jnp.zeros(slots, jnp.int32).at[g2].add(1, mode="drop")
            sm = jnp.zeros(slots, jnp.float32).at[g2].add(vv, mode="drop")
            return carry * 0.5 + (cnt[0] % 3).astype(jnp.float32) + sm[0] * 1e-9

        bench(f"scatter cnt+sum slots={slots}", scatter_body, g, v)

        if slots <= 65536:
            from heavydb_tpu.ops.groupby import _onehot_scan

            def onehot_body(carry, gg, vv):
                g2 = (gg + carry.astype(jnp.int32)) % slots
                m = jnp.ones(n, jnp.bool_)
                res = _onehot_scan(g2, m, [vv], slots)
                return carry * 0.5 + (res[0][0] % 3).astype(jnp.float32) \
                    + res[1][0] * 1e-9

            bench(f"onehot cnt+sum slots={slots}", onehot_body, g, v,
                  klo=4, khi=36)

        if slots >= (1 << 20):
            def sortgb_body(carry, gg, vv):
                g2 = (gg + carry.astype(jnp.int32)) % slots
                order = jnp.argsort(g2)
                sg = g2[order]
                sv = vv[order]
                seg = jnp.concatenate(
                    [jnp.ones(1, jnp.bool_), sg[1:] != sg[:-1]]
                )
                sid = jnp.cumsum(seg.astype(jnp.int32)) - 1
                sm = jnp.zeros(slots, jnp.float32).at[sid].add(
                    sv, mode="drop")
                return carry * 0.5 + sm[0] * 1e-9 + (sid[-1] % 3)

            bench(f"sort-groupby slots={slots}", sortgb_body, g, v,
                  klo=4, khi=20)

    # ---- sorts / topk ----
    def topk_body(carry, vv):
        vals, _ = jax.lax.top_k(vv + carry * 1e-9, 100)
        return carry * 0.5 + vals[0]

    bench("lax.top_k(100) 20M f32", topk_body, v)

    k32 = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)

    def argsort_body(carry, kk):
        o = jnp.argsort(kk ^ carry.astype(jnp.int32))
        return carry * 0.5 + (o[0] % 3).astype(jnp.float32)

    bench("argsort 20M i32", argsort_body, k32, klo=4, khi=20)

    k64 = jnp.asarray(rng.integers(0, 1 << 40, n), jnp.int64)

    def argsort64_body(carry, kk):
        o = jnp.argsort(kk ^ carry.astype(jnp.int64))
        return carry * 0.5 + (o[0] % 3).astype(jnp.float32)

    bench("argsort 20M i64", argsort64_body, k64, klo=4, khi=20)

    # ---- join probes ----
    build_n = 1_000_000
    tbl = jnp.asarray(rng.integers(0, 100, build_n), jnp.int32)
    pk = jnp.asarray(rng.integers(0, build_n, n), jnp.int64)

    def gather_body(carry, keys, table):
        r = table[(keys + carry.astype(jnp.int64)) % build_n]
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("gather 20M from 1M", gather_body, pk, tbl)

    sk = jnp.asarray(np.arange(build_n, dtype=np.int64))

    def ss_body(carry, keys, skk):
        r = jnp.searchsorted(skk, (keys + carry.astype(jnp.int64)) % build_n)
        return carry * 0.5 + (r[0] % 3).astype(jnp.float32)

    bench("searchsorted 20M in 1M", ss_body, pk, sk, klo=4, khi=36)

    log("shootout4 done")


if __name__ == "__main__":
    main()
