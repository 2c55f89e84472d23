"""Window-function kernels.

Reference: QueryEngine/WindowContext.cpp (WindowFunctionContext) builds
partition hash tables, sorts each partition, and walks rows with segment
trees for framed aggregates.  TPU-native restatement: ONE global sort by
(partition keys, order keys) turns every per-partition quantity into a
segmented scan over the sorted row order — positions, ranks, prefix
aggregates — which then scatter back to original row order.  No hash
tables, no per-partition loops; everything is O(n log n) sorts + O(n)
scans that XLA vectorizes.

All helpers below operate in SORTED order and take:
  pstart: bool[n]  — row starts a new partition
  ostart: bool[n]  — row starts a new peer group (order-key change)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

TV = Tuple[object, Optional[object]]


def segmented_prefix_sum(x, pstart):
    """Inclusive prefix sum that resets at partition starts."""
    c = jnp.cumsum(x, axis=0)
    # value of c just before each partition start, broadcast forward
    base = jnp.where(pstart, c - x, 0)
    run_base = jax.lax.associative_scan(jnp.maximum, jnp.where(pstart, c - x, jnp.asarray(0, c.dtype)))
    # run_base holds, for each row, the cumsum offset at its partition start
    return c - run_base


def forward_fill_value(x, pstart):
    """Broadcast the value at each partition start to the whole partition.
    x must already be zero except at partition starts (or any value; only
    start positions are used)."""
    marked = jnp.where(pstart, x, jnp.asarray(0, x.dtype))
    idx = jnp.arange(x.shape[0])
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(pstart, idx, 0)
    )
    return x[start_idx], start_idx


def partition_ids(pstart):
    return jnp.cumsum(pstart.astype(jnp.int32)) - 1


def row_number(pstart):
    idx = jnp.arange(pstart.shape[0])
    _, start_idx = forward_fill_value(idx, pstart)
    return (idx - start_idx + 1).astype(jnp.int64)


def rank(pstart, ostart):
    idx = jnp.arange(pstart.shape[0])
    _, pstart_idx = forward_fill_value(idx, pstart)
    newgrp = pstart | ostart
    _, grp_idx = forward_fill_value(idx, newgrp)
    return (grp_idx - pstart_idx + 1).astype(jnp.int64)


def dense_rank(pstart, ostart):
    pid = partition_ids(pstart)
    newgrp = (pstart | ostart).astype(jnp.int64)
    g = jnp.cumsum(newgrp)
    base, _ = forward_fill_value(g - 1, pstart)
    return g - base


def partition_counts(pstart):
    """Partition size broadcast to each row (sorted order)."""
    n = pstart.shape[0]
    pid = partition_ids(pstart)
    counts = jnp.zeros(n + 1, jnp.int64).at[pid].add(1)[:n]
    return counts[pid]


def percent_rank(pstart, ostart):
    r = rank(pstart, ostart)
    c = partition_counts(pstart)
    return jnp.where(c > 1, (r - 1) / jnp.maximum(c - 1, 1), 0.0)


def cume_dist(pstart, ostart):
    """# peers with order-key ≤ current / partition size."""
    n = pstart.shape[0]
    idx = jnp.arange(n)
    # last row index of each peer group, broadcast backward: compute group id,
    # then for each group its end position
    newgrp = pstart | ostart
    gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    gmax = jnp.zeros(n + 1, jnp.int64).at[gid].max(idx)[:n]
    peer_end = gmax[gid]
    _, pstart_idx = forward_fill_value(idx, pstart)
    c = partition_counts(pstart)
    return (peer_end - pstart_idx + 1) / c


def ntile(pstart, n_buckets):
    rn = row_number(pstart) - 1
    c = partition_counts(pstart)
    nb = jnp.asarray(n_buckets, jnp.int64)
    base = c // nb
    rem = c % nb
    # first `rem` buckets get base+1 rows
    big = rem * (base + 1)
    in_big = rn < big
    t = jnp.where(
        in_big,
        rn // jnp.maximum(base + 1, 1),
        rem + (rn - big) // jnp.maximum(base, 1),
    )
    return (t + 1).astype(jnp.int64)


def shift_in_partition(vals, valid, pstart, offset: int, default_tv=None):
    """LAG (offset>0) / LEAD (offset<0) within partitions, sorted order."""
    n = vals.shape[0]
    idx = jnp.arange(n)
    src = idx - offset
    ok = (src >= 0) & (src < n)
    src_c = jnp.clip(src, 0, n - 1)
    pid = partition_ids(pstart)
    same = ok & (pid[src_c] == pid)
    out = vals[src_c]
    outv = valid[src_c] if valid is not None else jnp.ones(n, jnp.bool_)
    outv = outv & same
    if default_tv is not None:
        dval, dvalid = default_tv
        out = jnp.where(same, out, jnp.asarray(dval, out.dtype))
        dv = jnp.asarray(True) if dvalid is None else dvalid
        outv = jnp.where(same, outv, dv)
    return out, outv


def first_value(vals, valid, pstart):
    out, _ = forward_fill_value(vals, pstart)
    if valid is None:
        return out, None
    v, _ = forward_fill_value(valid, pstart)
    return out, v


def last_value_frame(vals, valid, pstart, ostart):
    """LAST_VALUE over the default frame (… AND CURRENT ROW with RANGE
    peers): value at the last peer row."""
    n = vals.shape[0]
    idx = jnp.arange(n)
    newgrp = pstart | ostart
    gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    gmax = jnp.zeros(n + 1, jnp.int64).at[gid].max(idx)[:n]
    peer_end = gmax[gid]
    out = vals[peer_end]
    outv = valid[peer_end] if valid is not None else None
    return out, outv


def running_agg(vals, valid, pstart, ostart, kind: str, acc_dtype):
    """SUM/COUNT/AVG/MIN/MAX over UNBOUNDED PRECEDING..CURRENT ROW with
    RANGE peer semantics (all peers share the value at their last peer)."""
    n = vals.shape[0]
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    if kind in ("SUM", "AVG", "COUNT"):
        contrib = jnp.where(ok, jnp.asarray(vals, acc_dtype), 0) if kind != "COUNT" \
            else ok.astype(jnp.int64)
        pre = jnp.cumsum(contrib)
        base, _ = forward_fill_value(pre - contrib, pstart)
        run = pre - base
    elif kind in ("MIN", "MAX"):
        # segmented running min/max via associative scan with partition reset
        fp = np.dtype(acc_dtype).kind == "f"
        if kind == "MIN":
            ident = jnp.asarray(np.inf if fp else np.iinfo(acc_dtype).max,
                                acc_dtype)
            op = jnp.minimum
        else:
            ident = jnp.asarray(-np.inf if fp else np.iinfo(acc_dtype).min,
                                acc_dtype)
            op = jnp.maximum
        x = jnp.where(ok, jnp.asarray(vals, acc_dtype), ident)

        def combine(a, b):
            av, areset = a
            bv, breset = b
            return jnp.where(breset, bv, op(av, bv)), areset | breset

        run, _ = jax.lax.associative_scan(combine, (x, pstart))
    else:
        raise ValueError(kind)
    cnt_contrib = ok.astype(jnp.int64)
    cpre = jnp.cumsum(cnt_contrib)
    cbase, _ = forward_fill_value(cpre - cnt_contrib, pstart)
    crun = cpre - cbase
    # RANGE frame: every row sees the value at the END of its peer group
    idx = jnp.arange(n)
    newgrp = pstart | ostart
    gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    gmax = jnp.zeros(n + 1, jnp.int64).at[gid].max(idx)[:n]
    peer_end = gmax[gid]
    run = run[peer_end]
    crun = crun[peer_end]
    if kind == "COUNT":
        return run, None
    if kind == "AVG":
        return run / jnp.maximum(crun, 1), crun > 0
    return run, crun > 0


def whole_partition_agg(vals, valid, pstart, kind: str, acc_dtype):
    """Aggregate over the ENTIRE partition (no ORDER BY in the window)."""
    n = vals.shape[0]
    pid = partition_ids(pstart)
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    nparts = n  # upper bound
    seg = jnp.where(ok, pid, nparts)
    if kind == "COUNT":
        c = jnp.zeros(nparts + 1, jnp.int64).at[seg].add(1)[:nparts]
        return c[pid], None
    x = jnp.asarray(vals, acc_dtype)
    counts = jnp.zeros(nparts + 1, jnp.int64).at[seg].add(1)[:nparts]
    if kind in ("SUM", "AVG"):
        s = jnp.zeros(nparts + 1, acc_dtype).at[seg].add(
            jnp.where(ok, x, 0)
        )[:nparts]
        if kind == "AVG":
            out = s[pid] / jnp.maximum(counts[pid], 1)
        else:
            out = s[pid]
        return out, counts[pid] > 0
    if kind in ("MIN", "MAX"):
        if np.dtype(acc_dtype).kind == "f":
            ident = np.inf if kind == "MIN" else -np.inf
        else:
            info = np.iinfo(acc_dtype)
            ident = info.max if kind == "MIN" else info.min
        buf = jnp.full(nparts + 1, ident, acc_dtype)
        x2 = jnp.where(ok, x, jnp.asarray(ident, acc_dtype))
        if kind == "MIN":
            m = buf.at[seg].min(x2)[:nparts]
        else:
            m = buf.at[seg].max(x2)[:nparts]
        return m[pid], counts[pid] > 0
    raise ValueError(kind)
