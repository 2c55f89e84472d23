"""Dump the jax persistent-cache key COMPONENTS for a fixed computation —
run twice (two processes); any differing component explains why the disk
cache never hits across processes on this runtime."""

import hashlib
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax._src import cache_key as ck
    from jax._src import compiler as jcompiler
    from jax._src import xla_bridge

    lowered = jax.jit(lambda a: a * 2 + 1).lower(jnp.zeros((8,), jnp.int32))
    module = lowered.compiler_ir()
    backend = xla_bridge.get_backend()
    devices = np.array([[jax.devices()[0]]])
    opts = jcompiler.get_compile_options(
        num_replicas=1, num_partitions=1
    )

    def h(fn, *args):
        o = hashlib.sha256()
        try:
            fn(o, *args)
            return o.hexdigest()[:16]
        except Exception as e:
            return f"ERR {type(e).__name__}: {str(e)[:60]}"

    print("computation:",
          h(lambda o: ck._hash_computation(o, module)), flush=True)
    print("devices:", h(ck._hash_devices, devices), flush=True)
    print("accel_config:", h(ck._hash_accelerator_config, devices),
          flush=True)
    print("compile_options:",
          h(ck._hash_serialized_compile_options, opts), flush=True)
    print("xla_flags:", h(ck._hash_xla_flags, ck.get_flag_prefixes()),
          flush=True)
    print("platform:",
          h(lambda o: ck._hash_platform(o, backend)), flush=True)
    try:
        full = ck.get(module, devices, opts, backend)
        print("FULL KEY:", full, flush=True)
    except Exception as e:
        print("full key ERR:", repr(e)[:120], flush=True)


if __name__ == "__main__":
    main()
