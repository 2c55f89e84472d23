"""MAX(i64) per-group at 134M rows, 20 slots: current tier vs i32 splits."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu.ops import groupby as G

N = 1 << 27
SLOTS = 20


def timeit(name, fn, *args):
    jitted = jax.jit(fn)

    def run(K, seed):
        t0 = time.perf_counter()
        out = None
        for i in range(K):
            out = jitted(jnp.int32(seed * 100 + i), *args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return time.perf_counter() - t0

    try:
        run(1, 0)
        lo = run(2, 1)
        hi = run(6, 2)
        ms = (hi - lo) / 4 * 1e3
        print(f"{name:44s} {ms:9.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} ERROR {e!r}", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gid = jax.random.randint(k1, (N,), 0, SLOTS, jnp.int32)
    v64 = jax.random.randint(k2, (N,), 0, 1 << 40, jnp.int64)
    v32 = v64.astype(jnp.int32)
    mask = jnp.ones(N, jnp.bool_)

    timeit("segment_minmax_i64_20slots",
           lambda p, g, v, m: G.segment_minmax(g ^ (p & 0), v, m, SLOTS, False),
           gid, v64, mask)
    timeit("segment_minmax_i32_20slots",
           lambda p, g, v, m: G.segment_minmax(g ^ (p & 0), v, m, SLOTS, False),
           gid, v32, mask)

    def split_max(p, g, v, m):
        g = g ^ (p & 0)
        u = v.astype(jnp.uint64) ^ jnp.uint64(1 << 63)
        hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
        hi_i = (hi ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        lo = u.astype(jnp.uint32)
        lo_i = (lo ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        hb = G.segment_minmax(g, hi_i, m, SLOTS, False)
        m2 = m & (hi_i == hb[g])
        lb = G.segment_minmax(g, lo_i, m2, SLOTS, False)
        hu = (hb.astype(jnp.int64) ^ 0x80000000) & 0xFFFFFFFF
        lu = (lb.astype(jnp.int64) ^ 0x80000000) & 0xFFFFFFFF
        return ((hu << 32) | lu) ^ (1 << 63)

    timeit("split_hi_lo_i32_twopass", split_max, gid, v64, mask)


if __name__ == "__main__":
    main()
