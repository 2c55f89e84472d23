"""Does the jax persistent compilation cache hit across PROCESSES on the
axon runtime?  Run twice back-to-back; the second run's compile time and
the cache-miss explanations give the answer.

  /opt/venv/bin/python -m benchmarks.cacheprobe
"""

import logging
import sys
import time

import numpy as np


def main():
    import jax

    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/cacheprobe_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_explain_cache_misses", True)
    import jax.numpy as jnp

    n = 4_000_000
    x = jnp.asarray(np.arange(n, dtype=np.int64))

    def f(a):
        # enough structure to take ~1s+ to compile
        out = a
        for i in range(30):
            out = jnp.sort((out * (i + 3)) % (n + 7))
        return out.sum()

    t0 = time.perf_counter()
    r = jax.jit(f).lower(x).compile()
    print(f"compile: {time.perf_counter()-t0:.2f}s", file=sys.stderr,
          flush=True)
    import os

    files = sum(len(fs) for _, _, fs in os.walk("/tmp/cacheprobe_cache"))
    print(f"cache files now: {files}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
