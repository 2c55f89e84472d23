"""Round-2 TPU runtime probe: answers the measurement questions that shape
bench.py and the compile-latency plan.

1. Does the jax persistent compilation cache engage on the axon backend?
2. Do async dispatches pipeline (K enqueues, one block) — i.e. can we
   amortize the ~31ms tunnel dispatch floor?
3. Compile-time breakdown: trace (lower) vs backend compile, small vs
   fused-large kernels.
4. Does a Pallas (Mosaic) kernel compile+run on this runtime?
5. In-jit fori_loop repetition: device-time measurement with one dispatch.

Run:  /opt/venv/bin/python benchmarks/probe_r2.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t():
    return time.perf_counter()


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} dev={dev}")

    # ---------- 1+3: compile times, persistent cache ----------
    n = 8_000_000
    x = jnp.arange(n, dtype=jnp.int32)
    y = jnp.ones(n, jnp.float32)

    def q(xa, ya, c):
        m = xa > c
        return m.sum(dtype=jnp.int32), jnp.where(m, ya, 0.0).sum()

    t0 = t()
    lowered = jax.jit(q).lower(x, y, 5)
    t1 = t()
    compiled = lowered.compile()
    t2 = t()
    log(f"small kernel: lower={t1-t0:.2f}s compile={t2-t1:.2f}s")
    jax.block_until_ready(compiled(x, y, 5))
    log("small kernel ran ok")

    # same fn again with a fresh jit: should hit the persistent cache if
    # it works (watch wall time)
    t0 = t()
    c2 = jax.jit(q).lower(x, y, 5).compile()
    t2 = t()
    log(f"small kernel RE-compile (persistent-cache probe): {t2-t0:.2f}s")

    import os

    cache_files = []
    for r, _, fs in os.walk("/root/repo/.jax_cache"):
        cache_files += [os.path.join(r, f) for f in fs]
    log(f"persistent cache files: {len(cache_files)}")

    # ---------- 2: dispatch pipelining ----------
    @jax.jit
    def step(a, c):
        m = a > c
        return m.sum(dtype=jnp.int32)

    jax.block_until_ready(step(x, 5))
    # serial (block each)
    t0 = t()
    for i in range(8):
        jax.block_until_ready(step(x, i))
    ser = (t() - t0) / 8
    # pipelined (block once)
    t0 = t()
    outs = [step(x, i + 100) for i in range(16)]
    jax.block_until_ready(outs)
    pip = (t() - t0) / 16
    log(f"dispatch: serial={ser*1e3:.1f}ms/iter pipelined={pip*1e3:.2f}ms/iter")

    # ---------- 5: in-jit fori_loop repetition ----------
    K = 32

    @jax.jit
    def loop_q(xa, ya):
        def body(i, acc):
            c, s = q(xa, ya, i)
            return acc[0] + c, acc[1] + s

        return jax.lax.fori_loop(0, K, body, (jnp.int32(0), jnp.float32(0)))

    t0 = t()
    jax.block_until_ready(loop_q(x, y))
    log(f"fori_loop first (compile+run): {t()-t0:.1f}s")
    t0 = t()
    jax.block_until_ready(loop_q(x, y))
    per = (t() - t0) / K
    bw = n * 8 / per / 1e9
    log(f"fori_loop x{K}: {per*1e3:.3f}ms/iter -> {bw:.0f} GB/s effective")

    # ---------- 4: Pallas ----------
    try:
        from jax.experimental import pallas as pl

        def pk(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        arr = jnp.ones((1024, 512), jnp.float32)
        out = pl.pallas_call(
            pk, out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype)
        )(arr)
        jax.block_until_ready(out)
        ok = bool((np.asarray(out[:2, :2]) == 2.0).all())
        log(f"pallas: RAN ok={ok}")
    except Exception as e:
        log(f"pallas: FAILED {type(e).__name__}: {e}")

    # ---------- bonus: scatter cost spot-check ----------
    for slots in (1 << 16, 1 << 20, 1 << 24):
        g = jnp.asarray(np.random.default_rng(0).integers(0, slots, n), jnp.int32)

        @jax.jit
        def scat(gg):
            return jnp.zeros(slots, jnp.int32).at[gg].add(1)

        t0 = t()
        jax.block_until_ready(scat(g))
        tc = t() - t0
        t0 = t()
        jax.block_until_ready(scat(g))
        tr = t() - t0
        log(f"scatter count {slots>>10}k slots: first={tc:.1f}s steady={tr*1e3:.0f}ms")

    log("probe done")


if __name__ == "__main__":
    main()
