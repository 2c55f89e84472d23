"""TPU primitive microbenchmarks — measures the building blocks our query
kernels rely on (scatter, sort, searchsorted, cumsum, gather, one-hot
matmul) so kernel strategy thresholds are driven by hardware data.

Run: /opt/venv/bin/python -m benchmarks.tpu_primitives [--rows 10000000]
Times are device-side (block_until_ready, no D2H).
"""

import argparse
import sys
import time

import numpy as np


def bench(name, fn, *args, iters=3):
    import jax

    jitted = jax.jit(fn)
    try:
        out = jitted(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = jitted(*args)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        ms = min(times) * 1e3
        print(f"{name:42s} {ms:10.2f} ms", file=sys.stderr, flush=True)
        return ms
    except Exception as e:
        print(f"{name:42s} ERROR {e!r}", file=sys.stderr, flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    n = args.rows
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} rows={n:,}", file=sys.stderr)

    gid2 = jax.device_put(rng.integers(0, 2, n).astype(np.int32))
    gid1k = jax.device_put(rng.integers(0, 1000, n).astype(np.int32))
    gid1m = jax.device_put(rng.integers(0, 1_000_000, n).astype(np.int32))
    vals = jax.device_put(rng.random(n).astype(np.float32))
    keys = jax.device_put(rng.integers(0, 1 << 40, n).astype(np.int64))
    uniq_pos = jax.device_put(np.arange(n, dtype=np.int32))

    bench("masked reduce (keyless)", lambda v: v.sum(), vals)
    bench("scatter-add 2 slots",
          lambda g, v: jnp.zeros(3, jnp.float32).at[g].add(v), gid2, vals)
    bench("scatter-add 1k slots",
          lambda g, v: jnp.zeros(1001, jnp.float32).at[g].add(v), gid1k, vals)
    bench("scatter-add 1M slots",
          lambda g, v: jnp.zeros(1_000_001, jnp.float32).at[g].add(v),
          gid1m, vals)
    bench("scatter-set UNIQUE idx (compaction)",
          lambda p, v: jnp.zeros(n, jnp.float32).at[p].set(v), uniq_pos, vals)
    bench("per-slot masked reduce x8",
          lambda g, v: jnp.where(
              g[None, :] == jnp.arange(8, dtype=jnp.int32)[:, None],
              v[None, :], 0.0).sum(axis=1),
          gid2, vals)

    def onehot_chunked(g, v, slots=1000, chunk=1 << 17):
        nn = g.shape[0]
        nchunks = nn // chunk
        gg = g[: nchunks * chunk].reshape(nchunks, chunk)
        vv = v[: nchunks * chunk].reshape(nchunks, chunk)

        def body(acc, xs):
            gc, vc = xs
            oh = (gc[:, None] == jnp.arange(slots, dtype=jnp.int32)[None, :])
            contrib = jnp.dot(vc[None, :], oh.astype(jnp.float32),
                              preferred_element_type=jnp.float32)[0]
            return acc + contrib, None

        out, _ = lax.scan(body, jnp.zeros(slots, jnp.float32), (gg, vv))
        return out

    bench("one-hot matmul 1k slots (scan chunks)", onehot_chunked, gid1k, vals)
    bench("sort 1 key i64", lambda k: lax.sort([k], num_keys=1)[0], keys)
    bench("sort key+payload",
          lambda k, v: lax.sort([k, v], num_keys=1)[0], keys, vals)
    bench("sort 3 operands 2 keys",
          lambda k, g, v: lax.sort([k, g, v], num_keys=2)[0], keys, gid1k, vals)
    bench("argsort i32", lambda g: jnp.argsort(g), gid1k)
    bench("cumsum i64", lambda k: jnp.cumsum(k), keys)
    bench("cumsum i32", lambda g: jnp.cumsum(g), gid1k)
    bench("gather (perm)", lambda v, p: v[p], vals, uniq_pos)
    small = jax.device_put(rng.integers(0, 1 << 40, 1 << 20).astype(np.int64))
    bench("searchsorted 10M in 1M",
          lambda s, k: jnp.searchsorted(jnp.sort(s), k), small, keys)
    bench("where+compare (filter mask)",
          lambda k: (k > (1 << 39)).sum(), keys)
    bench("segment one-hot small via dot bf16",
          lambda g, v: jnp.dot(
              v[None, :].astype(jnp.bfloat16),
              (g[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]
               ).astype(jnp.bfloat16),
              preferred_element_type=jnp.float32)[0],
          gid2, vals)


if __name__ == "__main__":
    main()
