"""Device-resident columnar batches.

A Batch is the unit flowing between execution steps — the analogue of the
reference's intermediate ResultSet/ColumnarResults (QueryEngine/
ColumnarResults.cpp): padded dense device arrays (one per column) plus the
actual row count.  Padding rounds row counts up to power-of-two buckets so
compiled kernels are reused across sizes (the reference's CodeCache economics
— see SURVEY §7 "recompilation economics"); pad rows hold null sentinels and
are excluded by the in-domain mask (iota < nrows) inside kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu import types as T

MIN_BUCKET = 8


def bucket(n: int) -> int:
    """Next {1, 1.25, 1.5, 1.75}·2^k ≥ n (min MIN_BUCKET).

    Pure powers of two waste up to half the domain as padding (a 20M-row
    table pads to 32M — every kernel then streams/scatters 1.6x the real
    rows).  Quarter-steps cap padding at 25% for a bounded 4x growth in
    distinct compiled shapes (the kernel cache keys on the bucket)."""
    if n <= MIN_BUCKET:
        return MIN_BUCKET
    step = 1 << ((n - 1).bit_length() - 3)  # quarter points of the octave
    return -(-n // step) * step


def pad_to(arr: np.ndarray, size: int, ti: T.TypeInfo) -> np.ndarray:
    n = arr.shape[0]
    if n == size:
        return arr
    pad_val = ti.null_sentinel()
    out = np.full(size, pad_val, arr.dtype)
    out[:n] = arr
    return out


@dataclass
class Batch:
    """cols[i] is a device array of length `padded` (or None if pruned)."""

    cols: List[Optional[jax.Array]]
    nrows: int
    types: List[T.TypeInfo]

    @property
    def padded(self) -> int:
        for c in self.cols:
            if c is not None:
                return c.shape[0]
        return bucket(self.nrows)

    def col(self, i: int) -> jax.Array:
        c = self.cols[i]
        assert c is not None, f"column {i} was pruned"
        return c

    def to_numpy(self) -> List[Optional[np.ndarray]]:
        # Device-slice every column to the live row count BEFORE the D2H
        # transfer: a LIMIT 5 over a 20M-row window/projection batch must
        # ship 5 rows over the link, not the padded 20M (measured: the
        # full-column egress cost 1.6s at 2M rows / 21s at 20M on the
        # relay; the slice itself is one async device op)
        need = bucket(max(self.nrows, 1))
        present = [
            (i, c if c.shape[0] <= need else c[:need])
            for i, c in enumerate(self.cols) if c is not None
        ]
        # ONE transfer per DTYPE GROUP: device_get of a list fetches
        # leaves SEQUENTIALLY and every fetch is a full relay round trip
        # (~150ms measured round 5) — same-dtype columns concatenate on
        # device and come back in one piece
        out: List[Optional[np.ndarray]] = [None] * len(self.cols)
        sliced = dict(present)
        groups: dict = {}
        for i, c in present:
            groups.setdefault(np.dtype(c.dtype), []).append(i)
        for dt, idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                out[i] = np.asarray(jax.device_get(sliced[i]))[
                    : self.nrows]
                continue
            try:
                import jax.numpy as jnp

                cat = jnp.concatenate([sliced[i] for i in idxs])
                host = np.asarray(jax.device_get(cat))
            except Exception:
                for i in idxs:
                    out[i] = np.asarray(
                        jax.device_get(sliced[i]))[: self.nrows]
                continue
            off = 0
            for i in idxs:
                n = sliced[i].shape[0]
                out[i] = host[off:off + n][: self.nrows]
                off += n
        return out


def from_host_columns(
    arrays: Sequence[Optional[np.ndarray]],
    nrows: int,
    types: Sequence[T.TypeInfo],
    device=None,
) -> Batch:
    size = bucket(nrows)
    cols = []
    for arr, ti in zip(arrays, types):
        if arr is None:
            cols.append(None)
            continue
        padded = pad_to(np.ascontiguousarray(arr), size, ti)
        cols.append(jax.device_put(padded, device))
    return Batch(list(cols), nrows, list(types))


def concat_batches(batches: Sequence[Batch]) -> Batch:
    """Union-all of same-schema batches (device concat, re-bucketed)."""
    total = sum(b.nrows for b in batches)
    size = bucket(total)
    types = batches[0].types
    out_cols = []
    for i, ti in enumerate(types):
        if any(b.cols[i] is None for b in batches):
            out_cols.append(None)
            continue
        parts = [b.cols[i][: b.nrows] for b in batches]
        cat = jnp.concatenate(parts) if parts else jnp.empty(0, ti.np_dtype())
        if cat.shape[0] < size:
            pad_val = ti.null_sentinel()
            pad = jnp.full(size - cat.shape[0], pad_val, cat.dtype)
            cat = jnp.concatenate([cat, pad])
        out_cols.append(cat)
    return Batch(out_cols, total, list(types))
