"""Strategy shootout v3 — trustworthy device timing on the axon relay.

block_until_ready on this runtime returns before remote execution
completes, and identical executions memoize — so neither min-of-reps nor
block-based timing measures device work.  Protocol here:

  - each measured op is wrapped in a CHAINED step: the next iteration's
    input depends on the previous iteration's output (buffer-level
    dependency the server cannot reorder or memoize);
  - one tiny scalar D2H at the end forces full completion;
  - per-op time = (T(K=Klong) - T(K=Kshort)) / (Klong - Kshort), which
    cancels the D2H/tunnel constant.

Run:  /opt/venv/bin/python -m benchmarks.shootout3_r2
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t():
    return time.perf_counter()


def chain_time(step, x0, carry0, K):
    import jax

    x, carry = x0, carry0
    t0 = t()
    for _ in range(K):
        x, carry = step(x, carry)
    # force completion: single-scalar D2H
    float(jax.device_get(carry))
    return t() - t0


def measure(step, x0, carry0, k_short=2, k_long=10):
    # warm/compile
    chain_time(step, x0, carry0, 1)
    a = chain_time(step, x0, carry0, k_short)
    b = chain_time(step, x0, carry0, k_long)
    return max((b - a) / (k_long - k_short), 0.0)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    n = 20_000_000
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.random(n).astype(np.float32))

    # D2H scalar floor for context
    s = jnp.float32(1.0)
    t0 = t()
    for _ in range(5):
        float(jax.device_get(s + 1))
    log(f"scalar D2H round-trip ~{(t()-t0)/5*1e3:.0f}ms")

    # ---- scan+filter+agg (memory-bound ceiling) ----
    @jax.jit
    def scan_step(x, carry):
        m = x > 0.5
        r = jnp.where(m, x, 0).sum()
        return x + (r * 0) + 1e-9, carry + r

    per = measure(scan_step, v, jnp.float32(0))
    log(f"scan+filter+sum 20M f32: {per*1e3:.1f}ms -> "
        f"{n*4/max(per,1e-9)/1e9:.0f} GB/s")

    # ---- group-by strategies ----
    for slots in (1000, 65536, 1 << 20, 10_000_000):
        g0 = jnp.asarray(rng.integers(0, slots, n), jnp.int32)

        @jax.jit
        def scatter_step(g, carry):
            cnt = jnp.zeros(slots, jnp.int32).at[g].add(1, mode="drop")
            sm = jnp.zeros(slots, jnp.float32).at[g].add(v, mode="drop")
            g2 = (g + (cnt[0] & 1)) % slots
            return g2, carry + sm[0]

        per_sc = measure(scatter_step, g0, jnp.float32(0))
        msg = f"slots={slots}: scatter={per_sc*1e3:.0f}ms"

        if slots <= (1 << 20):
            from heavydb_tpu.ops.groupby import _onehot_scan

            @jax.jit
            def onehot_step(g, carry):
                m = jnp.ones(n, jnp.bool_)
                res = _onehot_scan(g, m, [v], slots)
                g2 = (g + (res[0][0] & 1)) % slots
                return g2, carry + res[1][0]

            per_oh = measure(onehot_step, g0, jnp.float32(0))
            msg += f"  onehot={per_oh*1e3:.0f}ms"

        @jax.jit
        def sort_step(g, carry):
            order = jnp.argsort(g)
            sg = g[order]
            sv = v[order]
            seg = jnp.concatenate([jnp.ones(1, jnp.bool_), sg[1:] != sg[:-1]])
            sid = jnp.cumsum(seg.astype(jnp.int32)) - 1
            sm = jnp.zeros(slots, jnp.float32).at[sid].add(sv, mode="drop")
            g2 = (g + (sid[0] & 1)) % slots
            return g2, carry + sm[0]

        per_st = measure(sort_step, g0, jnp.float32(0), 2, 6)
        msg += f"  sort={per_st*1e3:.0f}ms"
        log(msg)

    # ---- top-k ----
    @jax.jit
    def topk_step(x, carry):
        vals, _ = jax.lax.top_k(x, 100)
        return x + (vals[0] * 0) + 1e-9, carry + vals[0]

    per = measure(topk_step, v, jnp.float32(0))
    log(f"lax.top_k(100) 20M: {per*1e3:.0f}ms")

    # ---- argsort i64 / i32 ----
    k0 = jnp.asarray(rng.integers(0, 1 << 40, n), jnp.int64)

    @jax.jit
    def as64_step(x, carry):
        o = jnp.argsort(x)
        return x ^ (o[0] & 1), carry + o[0]

    per = measure(as64_step, k0, jnp.int64(0), 2, 6)
    log(f"argsort 20M i64: {per*1e3:.0f}ms")

    k32 = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)

    @jax.jit
    def as32_step(x, carry):
        o = jnp.argsort(x)
        return x ^ (o[0] & 1), carry + o[0]

    per = measure(as32_step, k32, jnp.int32(0), 2, 6)
    log(f"argsort 20M i32: {per*1e3:.0f}ms")

    # ---- join probes ----
    build_n = 1_000_000
    tbl = jnp.asarray(rng.integers(0, 100, build_n), jnp.int32)
    p0 = jnp.asarray(rng.integers(0, build_n, n), jnp.int64)

    @jax.jit
    def gather_step(keys, carry):
        r = tbl[keys % build_n]
        return keys + (r[0] & 1), carry + r[0]

    per = measure(gather_step, p0, jnp.int64(0))
    log(f"random gather 20M from 1M: {per*1e3:.0f}ms")

    sk = jnp.asarray(np.arange(build_n, dtype=np.int64))

    @jax.jit
    def ss_step(keys, carry):
        r = jnp.searchsorted(sk, keys)
        return keys + (r[0] & 1), carry + r[0]

    per = measure(ss_step, p0, jnp.int64(0))
    log(f"searchsorted 20M in 1M: {per*1e3:.0f}ms")

    log("shootout3 done")


if __name__ == "__main__":
    main()
