"""Multi-process jax.distributed probe: N CPU processes, one coordinator,
global mesh, psum + all_gather across processes.  Run with no args to
spawn workers."""

import os
import subprocess
import sys


def worker(pid: int, nprocs: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS; force CPU in-process
    # (two concurrent TPU clients wedge the tunnel)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    devs = jax.devices()
    print(f"[{pid}] global devices={len(devs)} local={jax.local_device_count()}",
          flush=True)
    mesh = Mesh(np.array(devs), ("shard",))
    sharding = NamedSharding(mesh, P("shard"))
    local = np.full(8, pid + 1, np.int64)
    garr = jax.make_array_from_process_local_data(sharding, local)

    @jax.jit
    def total(x):
        return x.sum()

    out = total(garr)
    got = int(jax.device_get(out))
    want = sum(8 * (p + 1) for p in range(nprocs))
    print(f"[{pid}] psum-style sum={got} want={want} ok={got == want}",
          flush=True)
    b = multihost_utils.broadcast_one_to_all(np.int64(42 + pid))
    print(f"[{pid}] broadcast={int(b)} ok={int(b) == 42}", flush=True)


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
        return
    nprocs, port = 2, 19731
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(p), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(nprocs)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=180)
        print(out)
        print(f"rc={p.returncode}")


if __name__ == "__main__":
    main()
