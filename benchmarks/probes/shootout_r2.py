"""Round-2 strategy shootout on the real TPU runtime.

Round 1 tuned the group-by/join strategy tables against a runtime where
colliding scatters cost ~4.6us/slot and dispatch cost ~31ms.  The round-2
probe measured scatters at ~90ms per 8M rows (slot-count independent) and
dispatch at ~0.1ms — so every routing decision needs re-measurement.

Measures, at 20M rows:
  group-by COUNT+SUM(f32) per strategy x slot count:
    scatter (.at[].add), one-hot lax.scan, pallas VMEM one-hot, sort-based
  plus sort/top-k and join probe primitives.

Run:  /opt/venv/bin/python benchmarks/shootout_r2.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return first, best


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v_host = rng.random(n).astype(np.float32)
    v = jnp.asarray(v_host)

    results = {}
    for slots in (1000, 8192, 65536, 1 << 20, 10_000_000):
        g_host = rng.integers(0, slots, n).astype(np.int32)
        g = jnp.asarray(g_host)
        row = {}

        @jax.jit
        def scatter(gg, vv):
            cnt = jnp.zeros(slots, jnp.int32).at[gg].add(1, mode="drop")
            sm = jnp.zeros(slots, jnp.float32).at[gg].add(vv, mode="drop")
            return cnt, sm

        f, b = timeit(scatter, g, v)
        row["scatter"] = (f, b)

        if slots <= (1 << 20):
            from heavydb_tpu.ops.groupby import _onehot_scan

            @jax.jit
            def onehot(gg, vv):
                m = jnp.ones(n, jnp.bool_)
                res = _onehot_scan(gg, m, [vv], slots)
                return res[0], res[1]

            try:
                f, b = timeit(onehot, g, v)
                row["onehot"] = (f, b)
            except Exception as e:
                row["onehot"] = f"FAIL {type(e).__name__}"

        if slots <= 65536:
            try:
                import heavydb_tpu.kernels.groupby_pallas as GP

                # temporarily lift the slot cap to measure
                def pallas_run(gg, vv):
                    m = jnp.ones(n, jnp.bool_)
                    c = GP.count_per_slot(gg, m, slots)
                    s = GP.sum_f32_per_slot(gg, vv, m, slots)
                    return c, s

                f, b = timeit(pallas_run, g, v)
                row["pallas"] = (f, b)
                # correctness spot check
                c, s = pallas_run(g, v)
                cref = np.bincount(g_host, minlength=slots)
                ok = bool((np.asarray(c[:slots]) == cref).all())
                row["pallas_ok"] = ok
            except Exception as e:
                row["pallas"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"

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

        f, b = timeit(sortpath, g, v)
        row["sort"] = (f, b)

        results[slots] = row
        log(f"slots={slots}: " + "  ".join(
            f"{k}={v if isinstance(v, str) else (f'{v[0]:.1f}s/{v[1]*1e3:.0f}ms' if isinstance(v, tuple) else v)}"
            for k, v in row.items()
        ))

    # ---- top-k ----
    @jax.jit
    def topk(vv):
        return jax.lax.top_k(vv, 100)

    f, b = timeit(topk, v)
    log(f"lax.top_k 20M: first={f:.1f}s steady={b*1e3:.0f}ms")

    # ---- sort 20M ----
    @jax.jit
    def fullsort(vv):
        return jnp.sort(vv)

    f, b = timeit(fullsort, v)
    log(f"jnp.sort 20M f32: first={f:.1f}s steady={b*1e3:.0f}ms")

    k_host = rng.integers(0, 1 << 40, n).astype(np.int64)
    k = jnp.asarray(k_host)

    @jax.jit
    def argsort64(kk):
        return jnp.argsort(kk)

    f, b = timeit(argsort64, k)
    log(f"argsort 20M i64: first={f:.1f}s steady={b*1e3:.0f}ms")

    @jax.jit
    def argsort32(gg):
        return jnp.argsort(gg)

    f, b = timeit(argsort32, jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32))
    log(f"argsort 20M i32: first={f:.1f}s steady={b*1e3:.0f}ms")

    # ---- join probe: gather-heavy ----
    build_n = 1_000_000
    bk = jnp.asarray(np.arange(build_n, dtype=np.int64))
    pk = jnp.asarray(rng.integers(0, build_n, n), jnp.int64)

    @jax.jit
    def gather_probe(table, keys):
        return table[keys % build_n]

    tbl = jnp.asarray(rng.integers(0, 100, build_n), jnp.int32)
    f, b = timeit(gather_probe, tbl, pk)
    log(f"random gather 20M from 1M table: first={f:.1f}s steady={b*1e3:.0f}ms")

    @jax.jit
    def searchsorted_probe(sk, keys):
        return jnp.searchsorted(sk, keys)

    f, b = timeit(searchsorted_probe, bk, pk)
    log(f"searchsorted 20M in 1M: first={f:.1f}s steady={b*1e3:.0f}ms")

    log("shootout done")


if __name__ == "__main__":
    main()
