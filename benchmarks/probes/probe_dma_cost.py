"""Measure per-DMA issue cost for small dynamic-offset VMEM->HBM copies
(sizing the radix-partition pipeline's per-bucket append writes), and
the 128k-row bitonic tile sort cost with 1 payload at 20M rows."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def dma_append(n_copies_per_tile: int, rows_per_copy: int, ntiles: int):
    """Each grid step issues n_copies DMAs of (rows_per_copy,128) i32 at
    dynamic dst offsets, then waits for all."""
    R = 1024  # tile rows

    def kernel(x_ref, o_ref, cur_ref, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cur_ref[0] = jnp.int32(0)

        def body(i, c):
            src = (i * jnp.int32(rows_per_copy)) & jnp.int32(R - 8)
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(src, rows_per_copy), :],
                o_ref.at[pl.ds(c, rows_per_copy), :], sem)
            cp.start()
            cp.wait()
            return c + jnp.int32(rows_per_copy)

        c = lax.fori_loop(jnp.int32(0), jnp.int32(n_copies_per_tile), body,
                          cur_ref[0])
        cur_ref[0] = c

    x = jnp.ones((R * ntiles, 128), jnp.int32)
    out_rows = ntiles * n_copies_per_tile * rows_per_copy + 64
    f = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (jnp.int32(i),
                                                    jnp.int32(0)))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    return bench(jax.jit(lambda a: f(a)), x)


def main():
    n = 20 * 1024 * 1024 // (1024 * 128) * 1024 * 128  # ~20M, tile mult
    ntiles = n // (1024 * 128)  # 160 tiles of 128k
    print(f"rows={n:,} tiles={ntiles}")
    # copy volume == data volume in all cases; vary the split
    for ncopies, rows in [(16, 64), (32, 32), (64, 16), (128, 8)]:
        t = dma_append(ncopies, rows, ntiles)
        total = ncopies * ntiles
        print(f"copies/tile={ncopies:4d} rows/copy={rows:3d} "
              f"total_dmas={total:6d}  t={t*1e3:7.2f}ms  "
              f"per_dma={t/total*1e9:6.0f}ns")
        sys.stdout.flush()

    # bitonic 128k tile with 1 payload over ~20M rows
    from heavydb_tpu.kernels import tile_sort
    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 10_000_000,
                             jnp.int32)
    pay = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)
    for tr in (65536, 131072):
        f = jax.jit(lambda k, p: tile_sort.sort_tiles(
            k, [p], rows_per_tile=tr, n_payloads=1))
        t = bench(f, key, pay)
        print(f"tile_sort rows_per_tile={tr}: {t*1e3:.1f}ms "
              f"({n/t/1e9:.2f}G rows/s)")
        sys.stdout.flush()
    # key-only
    for tr in (65536, 131072):
        f = jax.jit(lambda k: tile_sort.sort_tiles(
            k, [], rows_per_tile=tr, n_payloads=0))
        t = bench(f, key)
        print(f"tile_sort key-only rows_per_tile={tr}: {t*1e3:.1f}ms "
              f"({n/t/1e9:.2f}G rows/s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
