"""Time the window fns-stage building blocks at padded=2^25 (20M bench).

Protocol: jit once, run K iters with a perturbed scalar input folded in
(defeats relay memoization), sync via device_get of one element, report
(t(K_hi)-t(K_lo))/(K_hi-K_lo) slope per iteration.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from heavydb_tpu.ops import scan as SC
from heavydb_tpu.ops import window as W

N = 1 << 25


def timeit(name, fn, *args):
    jitted = jax.jit(fn)

    def run(K, seed):
        t0 = time.perf_counter()
        out = None
        for i in range(K):
            out = jitted(jnp.int32(seed * 1000 + i), *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[:1])
        return time.perf_counter() - t0

    try:
        run(1, 0)  # compile
        lo = run(2, 1)
        hi = run(8, 2)
        ms = (hi - lo) / 6 * 1e3
        print(f"{name:44s} {ms:9.2f} ms", flush=True)
        return ms
    except Exception as e:
        print(f"{name:44s} ERROR {e!r}", flush=True)


def main():
    rng = np.random.default_rng(0)
    v = jax.device_put(rng.random(N).astype(np.float32))
    # ~1000 partitions sorted order: pstart True ~1000 times
    pstart_np = np.zeros(N, np.bool_)
    pstart_np[0] = True
    pstart_np[rng.integers(1, N, 1000)] = True
    pstart = jax.device_put(pstart_np)
    ostart_np = np.zeros(N, np.bool_)
    ostart_np[rng.integers(1, N, N // 2)] = True
    ostart = jax.device_put(ostart_np)
    perm = jax.device_put(rng.permutation(N).astype(np.int32))
    i32 = jax.device_put(rng.integers(0, 1 << 20, N).astype(np.int32))

    timeit("cumsum_i32", lambda p, x: SC.cumsum(x + p), i32)
    timeit("cumsum_f32", lambda p, x: SC.cumsum(x + p.astype(jnp.float32)), v)
    timeit("cumsum_ds", lambda p, x: SC.cumsum_ds(x + p.astype(jnp.float32)), v)
    timeit("seg_prop_1ch", lambda p, ps, x: W.seg_propagate(ps, x + p.astype(jnp.float32)), pstart, v)
    timeit("seg_prop_2ch", lambda p, ps, x, y: W.seg_propagate(ps, x + p.astype(jnp.float32), y), pstart, v, v)
    timeit("seg_prop_3ch_rev", lambda p, ps, x, y, z: W.seg_propagate(ps, x + p.astype(jnp.float32), y, z + p, reverse=True), ostart, v, v, i32)
    timeit("row_number", lambda p, ps: W.row_number(ps ^ (p < 0)), pstart)
    timeit("scatter_f32", lambda p, pm, x: jnp.zeros(N, jnp.float32).at[pm].set(x + p.astype(jnp.float32)), perm, v)
    timeit("scatter_i32", lambda p, pm, x: jnp.zeros(N, jnp.int32).at[pm].set(x + p), perm, i32)
    timeit("scatter_i8", lambda p, pm, x: jnp.zeros(N, jnp.int8).at[pm].set((x + p).astype(jnp.int8)), perm, i32)
    timeit("gather_f32", lambda p, pm, x: (x + p.astype(jnp.float32))[pm], perm, v)
    timeit("running_sum_ds", lambda p, ps, os_, x: W.running_agg(x + p.astype(jnp.float32), None, ps, os_, "SUM", np.dtype(np.float64)), pstart, ostart, v)
    timeit("sort_1key_i32", lambda p, x: lax.sort([x + p], num_keys=1)[0], i32)


if __name__ == "__main__":
    main()
