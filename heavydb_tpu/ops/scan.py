"""Blocked prefix sums for TPU.

XLA lowers a 1-D ``jnp.cumsum`` to a reduce-window whose scoped-VMEM
working set grows with the array: at ~20M elements the allocation can
exceed the 16MB scoped-vmem limit when the op sits inside a
``while_loop`` body (measured: "Allocation with size 19.07M ... exceeded
scoped vmem limit"), and even when it fits it is ~2x slower than a
two-level formulation (measured 4.4ms vs 2.0ms per 20M-i32 scan on
v5e).

``cumsum`` here reshapes to (blocks, block) rows, scans the short minor
axis (small reduce-window), then adds an exclusive scan of the per-block
totals — the classic scan-then-propagate decomposition (reference uses
thrust::inclusive_scan for the same role in
QueryEngine/InPlaceSort.cpp's partition offsets).
"""

import jax.numpy as jnp

# below this size the plain lowering fits VMEM comfortably and the
# reshape/pad of the blocked form is pure overhead
_BLOCKED_MIN = 1 << 20
_BLK = 1 << 15


def cumsum(x, dtype=None):
    """Inclusive 1-D prefix sum; blocked two-level scan above _BLOCKED_MIN."""
    if dtype is not None:
        x = x.astype(dtype)
    n = x.shape[0]
    if x.ndim != 1 or n < _BLOCKED_MIN:
        return jnp.cumsum(x)
    nb = -(-n // _BLK)
    pad = nb * _BLK - n
    xp = jnp.pad(x, (0, pad)) if pad else x
    within = jnp.cumsum(xp.reshape(nb, _BLK), axis=1)
    base = jnp.concatenate(
        [jnp.zeros(1, x.dtype), jnp.cumsum(within[:, -1])[:-1]]
    )
    out = (within + base[:, None]).reshape(-1)
    return out[:n] if pad else out
