"""Strategy shootout v2 — distinct inputs per repetition (the axon runtime
memoizes identical (executable, args) executions, so min-of-reps over the
same buffers reads ~0ms).  Each rep gets its own pre-staged key array.

Run:  /opt/venv/bin/python -m benchmarks.shootout2_r2
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


REPS = 3


def steady(fn, variants, extra=()):
    """Compile on variants[0], then time one call per remaining variant."""
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(variants[0], *extra))
    first = time.perf_counter() - t0
    times = []
    for v in variants[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v, *extra))
        times.append(time.perf_counter() - t0)
    return first, min(times)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.random(n).astype(np.float32))

    for slots in (1000, 65536, 1 << 20, 10_000_000):
        base = rng.integers(0, slots, n).astype(np.int32)
        gs = [jnp.asarray(np.roll(base, r)) for r in range(REPS + 1)]

        @jax.jit
        def scatter(gg, vv):
            cnt = jnp.zeros(slots, jnp.int32).at[gg].add(1, mode="drop")
            sm = jnp.zeros(slots, jnp.float32).at[gg].add(vv, mode="drop")
            return cnt, sm

        f, b = steady(scatter, gs, (v,))
        msg = f"slots={slots}: scatter={f:.1f}s/{b*1e3:.0f}ms"

        if slots <= (1 << 20):
            from heavydb_tpu.ops.groupby import _onehot_scan

            @jax.jit
            def onehot(gg, vv):
                m = jnp.ones(n, jnp.bool_)
                res = _onehot_scan(gg, m, [vv], slots)
                return res[0], res[1]

            f, b = steady(onehot, gs, (v,))
            msg += f"  onehot={f:.1f}s/{b*1e3:.0f}ms"

        @jax.jit
        def sortpath(gg, vv):
            order = jnp.argsort(gg)
            sg = gg[order]
            sv = vv[order]
            seg_start = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), sg[1:] != sg[:-1]]
            )
            sid = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
            cnt = jnp.zeros(slots, jnp.int32).at[sid].add(1, mode="drop")
            sm = jnp.zeros(slots, jnp.float32).at[sid].add(sv, mode="drop")
            return cnt, sm

        f, b = steady(sortpath, gs, (v,))
        msg += f"  sort={f:.1f}s/{b*1e3:.0f}ms"
        log(msg)

    vs = [jnp.asarray(np.roll(rng.random(n).astype(np.float32), r))
          for r in range(REPS + 1)]

    @jax.jit
    def topk(vv):
        return jax.lax.top_k(vv, 100)

    f, b = steady(topk, vs)
    log(f"lax.top_k 20M: first={f:.1f}s steady={b*1e3:.0f}ms")

    from heavydb_tpu.ops.sort import radix_select_topk  # noqa: F401

    @jax.jit
    def fullsort(vv):
        return jnp.sort(vv)

    f, b = steady(fullsort, vs)
    log(f"jnp.sort 20M f32: first={f:.1f}s steady={b*1e3:.0f}ms")

    ks = [jnp.asarray(np.roll(rng.integers(0, 1 << 40, n), r))
          for r in range(REPS + 1)]

    @jax.jit
    def argsort64(kk):
        return jnp.argsort(kk)

    f, b = steady(argsort64, ks)
    log(f"argsort 20M i64: first={f:.1f}s steady={b*1e3:.0f}ms")

    build_n = 1_000_000
    tbl = jnp.asarray(rng.integers(0, 100, build_n), jnp.int32)
    pks = [jnp.asarray(np.roll(rng.integers(0, build_n, n), r))
           for r in range(REPS + 1)]

    @jax.jit
    def gather_probe(keys, table):
        return table[keys % build_n]

    f, b = steady(gather_probe, pks, (tbl,))
    log(f"random gather 20M from 1M: first={f:.1f}s steady={b*1e3:.0f}ms")

    sk = jnp.asarray(np.arange(build_n, dtype=np.int64))

    @jax.jit
    def ss_probe(keys, skk):
        return jnp.searchsorted(skk, keys)

    f, b = steady(ss_probe, pks, (sk,))
    log(f"searchsorted 20M in 1M: first={f:.1f}s steady={b*1e3:.0f}ms")

    # streaming scan ceiling reference: memory-bound filter+sum at 20M
    @jax.jit
    def scanagg(vv):
        m = vv > 0.5
        return m.sum(dtype=jnp.int32), jnp.where(m, vv, 0).sum()

    f, b = steady(scanagg, vs)
    gbps = n * 4 / b / 1e9
    log(f"scan+filter+agg 20M f32: steady={b*1e3:.1f}ms -> {gbps:.0f} GB/s")
    log("shootout2 done")


if __name__ == "__main__":
    main()
