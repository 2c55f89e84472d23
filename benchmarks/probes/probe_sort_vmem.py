"""Probe: tile_sort VMEM/compile limits vs (rows_per_tile, n_payloads)
and runtime at 20M rows."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from heavydb_tpu.kernels import tile_sort


def main():
    n = 160 * 65536  # ~10.5M... use 20M-ish: 160*131072
    n = 160 * 131072
    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 10_000_000,
                             jnp.int32)
    pays = [jax.random.uniform(jax.random.PRNGKey(i + 1), (n,), jnp.float32)
            for i in range(5)]
    for tr in (32768, 65536):
        for k in (0, 1, 2, 3, 4):
            try:
                f = jax.jit(lambda kk, *ps: tile_sort.sort_tiles(
                    kk, list(ps), rows_per_tile=tr, n_payloads=k))
                t0 = time.perf_counter()
                lowered = f.lower(key, *pays[:k]).compile()
                tc = time.perf_counter() - t0
                out = lowered(key, *pays[:k])
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(3):
                    jax.block_until_ready(lowered(key, *pays[:k]))
                tr_ms = (time.perf_counter() - t0) / 3 * 1e3
                print(f"tile={tr} payloads={k}: compile={tc:.1f}s "
                      f"run={tr_ms:.2f}ms ({n/tr_ms*1e3/1e9:.1f}G rows/s)")
            except Exception as e:
                s = str(e).replace("\n", " ")[:100]
                print(f"tile={tr} payloads={k}: {type(e).__name__} {s}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
