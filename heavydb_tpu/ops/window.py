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

from heavydb_tpu.ops import scan as SC

TV = Tuple[object, Optional[object]]


class DsPair:
    """A running f64-accurate value carried as (hi, lo) f32 double-single
    parts.  Kept SPLIT through peer propagation and row-order egress:
    64-bit scatters/gathers are 4-16x the cost of two f32 scatters on
    TPU, and h+l combines to f64 identically before or after the
    permutation."""

    __slots__ = ("h", "l")

    def __init__(self, h, l):
        self.h = h
        self.l = l

    def combine(self):
        return self.h.astype(jnp.float64) + self.l.astype(jnp.float64)


def seg_propagate(flag, *vals, reverse: bool = False):
    """Propagate each value AT a flag position across its segment —
    forward (toward later rows) or backward.  One multi-channel blocked
    associative scan; NO gather.  (A 128M-row random gather costs ~2s
    f32 / ~4s f64 on TPU; the scan is ~0.1s — this replaces every
    "value-at-segment-start/end" gather in the window path.)"""
    fi = flag.astype(jnp.int32)

    def comb(a, b):
        take_b = b[0] == 1
        return (jnp.maximum(a[0], b[0]),) + tuple(
            jnp.where(take_b, bv, av) for av, bv in zip(a[1:], b[1:])
        )

    out = SC.assoc_scan(comb, (fi,) + tuple(vals), reverse=reverse)
    return out[1:] if len(vals) > 1 else out[1]


def forward_fill_value(x, pstart):
    """Broadcast the value at each partition start to the whole partition
    (gather-free: segmented propagate).  Also returns the start index of
    each row's partition.  Index math stays int32 — under jax_enable_x64
    a bare arange is int64 and every scan stage runs EMULATED 64-bit
    (measured ~4x on the 100M window path)."""
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    filled, start_idx = seg_propagate(pstart, x, idx)
    return filled, start_idx


def partition_ids(pstart):
    return SC.cumsum(pstart.astype(jnp.int32)) - 1


def row_number(pstart):
    idx = jnp.arange(pstart.shape[0], dtype=jnp.int32)
    _, start_idx = forward_fill_value(idx, pstart)
    return idx - start_idx + 1  # int32; widened at egress


def rank(pstart, ostart):
    idx = jnp.arange(pstart.shape[0], dtype=jnp.int32)
    _, pstart_idx = forward_fill_value(idx, pstart)
    newgrp = pstart | ostart
    _, grp_idx = forward_fill_value(idx, newgrp)
    return grp_idx - pstart_idx + 1  # int32; widened at egress


def dense_rank(pstart, ostart):
    newgrp = (pstart | ostart).astype(jnp.int32)
    g = SC.cumsum(newgrp)
    base, _ = forward_fill_value(g - jnp.int32(1), pstart)
    return g - base  # int32; widened at egress


def _next_start_idx(starts):
    """For each row, the index of the next segment start AFTER it (n if
    none).  Reverse min-scan — no scatter (a scatter keyed by segment id
    serializes on TPU when segments are few and large)."""
    n = starts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    s = jnp.where(starts, idx, jnp.int32(n))
    r = SC.assoc_scan(jnp.minimum, s, reverse=True)
    return jnp.concatenate([r[1:], jnp.full(1, n, jnp.int32)])


def segment_bounds(starts):
    """(start_idx[i], end_idx[i]) of the segment containing each row.
    starts[0] must be True."""
    idx = jnp.arange(starts.shape[0], dtype=jnp.int32)
    _, start_idx = forward_fill_value(idx, starts)
    return start_idx.astype(jnp.int32), _next_start_idx(starts) - 1


def partition_counts(pstart):
    """Partition size broadcast to each row (sorted order)."""
    ps, pe = segment_bounds(pstart)
    return pe - ps + 1  # int32; widened at egress


def percent_rank(pstart, ostart):
    r = rank(pstart, ostart)
    c = partition_counts(pstart)
    return jnp.where(c > 1, (r - 1) / jnp.maximum(c - 1, 1), 0.0)


def cume_dist(pstart, ostart):
    """# peers with order-key ≤ current / partition size."""
    _, peer_end = segment_bounds(pstart | ostart)
    pstart_idx, _ = segment_bounds(pstart)
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
    return t + 1  # int32; widened at egress


def nonnull_lookup(vals, valid, pstart):
    """IGNORE NULLS support (reference WindowContext
    IGNORE_NULLS navigation): globally compact the non-null values, and
    per row expose (compact[], base[i] — compact index of the partition's
    first non-null, c[i] — inclusive non-null count within the partition).
    The j-th non-null of a partition is compact[base + j - 1]."""
    n = vals.shape[0]
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    oki = ok.astype(jnp.int32)
    cpre = SC.cumsum(oki)
    pos = cpre - 1
    compact = jnp.zeros(n + 1, vals.dtype).at[
        jnp.where(ok, pos, n)
    ].set(vals, mode="drop")[:n]
    before_part, _ = forward_fill_value(cpre - oki, pstart)
    c = cpre - before_part  # inclusive non-null count within partition
    base = before_part  # global compact index of partition's first non-null
    return compact, base.astype(jnp.int32), c.astype(jnp.int32), ok


def _static_shift(x, offset: int, fill):
    """out[i] = x[i - offset] (STATIC offset) via slice + pad — a dynamic
    gather `x[idx - off]` costs ~480ms at 2^25 on v5e; this is one copy."""
    n = x.shape[0]
    k = min(abs(int(offset)), n)
    if k == 0:
        return x
    pad = jnp.full(k, fill, x.dtype)
    if offset > 0:
        return jnp.concatenate([pad, x[:n - k]])
    return jnp.concatenate([x[k:], pad])


def shift_in_partition(vals, valid, pstart, offset: int, default_tv=None):
    """LAG (offset>0) / LEAD (offset<0) within partitions, sorted order.
    Gather-free: the offset is STATIC, so the shift is a slice+pad and
    the partition check compares each row's partition id with the
    shifted id."""
    n = vals.shape[0]
    pid = partition_ids(pstart)
    same = _static_shift(pid, offset, jnp.int32(-1)) == pid
    out = _static_shift(vals, offset, jnp.asarray(0, vals.dtype))
    if valid is not None:
        outv = _static_shift(
            valid.astype(jnp.int8), offset, jnp.int8(0)
        ).astype(jnp.bool_) & same
    else:
        outv = same
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
    peers): value at the last peer row.  Gather-free: reverse segmented
    propagate from peer-group-end rows (a row ends its peer group iff
    the next row starts one)."""
    pg = pstart | ostart
    endf = jnp.concatenate([pg[1:], jnp.ones(1, jnp.bool_)])
    if valid is not None:
        out, outv8 = seg_propagate(endf, vals, valid.astype(jnp.int8),
                                   reverse=True)
        return out, outv8.astype(jnp.bool_)
    return seg_propagate(endf, vals, reverse=True), None


def running_agg(vals, valid, pstart, ostart, kind: str, acc_dtype):
    """SUM/COUNT/AVG/MIN/MAX over UNBOUNDED PRECEDING..CURRENT ROW with
    RANGE peer semantics (all peers share the value at their last peer)."""
    n = vals.shape[0]
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    if kind in ("SUM", "AVG", "COUNT"):
        if kind != "COUNT" and _ds_eligible(acc_dtype, n, vals):
            # double-single running sum: f32 pairs with ~2^-48 accuracy;
            # avoids the large-shape f64 op chains that crash/stall the
            # remote compile helper at 100M rows
            c32 = jnp.where(ok, jnp.asarray(vals, jnp.float32), 0.0)
            ph, pl = SC.cumsum_ds(c32)
            bh0, bl0 = SC.ds_add(ph, pl, -c32, jnp.zeros_like(c32))
            bh, bl = seg_propagate(pstart, bh0, bl0)
            rh, rl = SC.ds_add(ph, pl, -bh, -bl)
            run = DsPair(rh, rl)
        else:
            contrib = (
                jnp.where(ok, jnp.asarray(vals, acc_dtype), 0)
                if kind != "COUNT" else ok.astype(jnp.int32)
            )
            pre = SC.cumsum(contrib)
            base = seg_propagate(pstart, pre - contrib)
            run = pre - base
        # COUNT stays int32 (n < 2^31); widened at egress
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

        run, _ = SC.assoc_scan(combine, (x, pstart))
    else:
        raise ValueError(kind)
    cnt_contrib = ok.astype(jnp.int32)
    cpre = SC.cumsum(cnt_contrib)
    cbase = seg_propagate(pstart, cpre - cnt_contrib)
    crun = cpre - cbase
    # RANGE frame: every row sees the value at the END of its peer group
    # (backward propagate from peer-group last rows — gather-free; ds
    # pairs propagate split so the scan stays f32)
    pg = pstart | ostart
    endf = jnp.concatenate([pg[1:], jnp.ones(1, jnp.bool_)])
    if isinstance(run, DsPair):
        rh, rl, crun = seg_propagate(endf, run.h, run.l, crun,
                                     reverse=True)
        run = DsPair(rh, rl)
    else:
        run, crun = seg_propagate(endf, run, crun, reverse=True)
    if kind == "COUNT":
        return run, None
    if kind == "AVG":
        v = run.combine() if isinstance(run, DsPair) else run
        return v / jnp.maximum(crun, 1), crun > 0
    return run, crun > 0


def whole_partition_agg(vals, valid, pstart, kind: str, acc_dtype):
    """Aggregate over the ENTIRE partition (no ORDER BY in the window).
    Gather-free (round 5): forward segmented running aggregate, then the
    partition-END value propagates BACKWARD to every row — two blocked
    scans, replacing the framed-agg formulation's per-row prefix gathers
    (two random gathers of the padded domain, ~480ms each at 2^27)."""
    n = vals.shape[0]
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    endf = jnp.concatenate([pstart[1:], jnp.ones(1, jnp.bool_)])
    cnt_run = _seg_running_op(ok.astype(jnp.int32), pstart,
                              lambda a, b: a + b)
    if kind in ("SUM", "AVG"):
        if _ds_eligible(acc_dtype, n, vals):
            c32 = jnp.where(ok, jnp.asarray(vals, jnp.float32), 0.0)
            rh, rl = _seg_scan_pair(c32, pstart)
            th, tl, cnt = seg_propagate(endf, rh, rl, cnt_run,
                                        reverse=True)
            s = th.astype(jnp.float64) + tl.astype(jnp.float64)
        else:
            x = jnp.where(ok, jnp.asarray(vals, acc_dtype),
                          jnp.asarray(0, acc_dtype))
            run = _seg_running_op(x, pstart, lambda a, b: a + b)
            s, cnt = seg_propagate(endf, run, cnt_run, reverse=True)
        if kind == "AVG":
            return s / jnp.maximum(cnt, 1), cnt > 0
        return s, cnt > 0
    if kind == "COUNT":
        return seg_propagate(endf, cnt_run, reverse=True), None
    if kind in ("MIN", "MAX"):
        ident, op = _minmax_ident(kind, acc_dtype)
        x = jnp.where(ok, jnp.asarray(vals, acc_dtype), ident)
        run = _seg_running_op(x, pstart, op)
        out, cnt = seg_propagate(endf, run, cnt_run, reverse=True)
        return out, cnt > 0
    raise ValueError(kind)


def _seg_scan_pair(c32, pstart):
    """Segmented double-single running sum (reset at partition starts)."""
    def combine(a, b):
        (ah, al, ar) = a
        (bh, bl, br) = b
        s = ah + bh
        bv = s - ah
        err = (ah - (s - bv)) + (bh - bv)
        l2 = al + bl + err
        hh = s + l2
        ll = l2 - (hh - s)
        return (
            jnp.where(br == 1, bh, hh),
            jnp.where(br == 1, bl, ll),
            jnp.maximum(ar, br),
        )

    rh, rl, _ = SC.assoc_scan(
        combine, (c32, jnp.zeros_like(c32), pstart.astype(jnp.int32))
    )
    return rh, rl


def _minmax_ident(kind: str, acc_dtype):
    fp = np.dtype(acc_dtype).kind == "f"
    if kind == "MIN":
        return jnp.asarray(np.inf if fp else np.iinfo(acc_dtype).max,
                           acc_dtype), jnp.minimum
    return jnp.asarray(-np.inf if fp else np.iinfo(acc_dtype).min,
                       acc_dtype), jnp.maximum


_DS_MIN_ROWS = 1 << 25


def _ds_eligible(acc_dtype, n: int, vals=None) -> bool:
    """Use double-single f32 pairs instead of emulated f64 for big-n
    FLOAT sums: on the relay toolchain every ≥2^25-element f64 op costs
    tens of seconds of compile and long f64 chains crash the compile
    helper (window SUM at 100M rows).  Int arguments keep real f64 —
    values above 2^24 would lose exactness in the f32 hi limb."""
    import numpy as _np

    if vals is not None and _np.dtype(vals.dtype).kind != "f":
        return False
    return (_np.dtype(acc_dtype) == _np.float64
            and n >= _DS_MIN_ROWS)


def _seg_running_op(x, starts, op):
    """Segmented inclusive running op (reset at starts)."""

    def combine(a, b):
        av, areset = a
        bv, breset = b
        return jnp.where(breset, bv, op(av, bv)), areset | breset

    run, _ = SC.assoc_scan(combine, (x, starts))
    return run


def _prefix(x):
    c = SC.cumsum(x)
    return jnp.concatenate([jnp.zeros(1, c.dtype), c])


def _window_minmax_table(x, lo, hi, max_width: int, op, ident):
    """min/max over [lo, hi] per row via a doubling sparse table with
    ceil(log2(max_width)) levels; windows are ≤ max_width after clamping.
    Cost: log2(w) shifted elementwise ops + 2 gathers — no sort, no
    scatter."""
    n = x.shape[0]
    tables = [x]
    shift = 1
    while shift < max_width:
        prev = tables[-1]
        shifted = jnp.concatenate(
            [prev[shift:], jnp.full(shift, ident, x.dtype)]
        )
        tables.append(op(prev, shifted))
        shift *= 2
    stk = jnp.stack(tables).reshape(-1)  # [L*n]
    length = jnp.maximum(hi - lo + 1, 1).astype(jnp.uint32)
    j = (jnp.uint32(31) - lax.clz(length)).astype(jnp.int32)
    pw = jnp.left_shift(jnp.int32(1), j)
    a = stk[j * n + lo]
    b = stk[j * n + hi - pw + 1]
    return op(a, b)


def framed_agg(vals, valid, pstart, lo, hi, kind: str, acc_dtype,
               lo_unbounded: bool, hi_unbounded: bool,
               rows_max_width: Optional[int] = None,
               group_starts=None, rows_offsets=None):
    """SUM/COUNT/AVG/MIN/MAX over the per-row frame [lo, hi] (row-space
    bounds already clamped to the partition; empty frame iff lo > hi).

    Reference: WindowContext.cpp segment-tree walks per row.  TPU-native:
    prefix sums for the invertible aggregates; for MIN/MAX one of three
    scan forms depending on which side is unbounded — forward segmented
    scan (prefix frames), reverse segmented scan (suffix frames), or a
    doubling sparse table (bounded ROWS frames, `rows_max_width` static).
    `group_starts` marks peer-group starts for RANGE CURRENT..CURRENT."""
    n = vals.shape[0]
    ok = valid if valid is not None else jnp.ones(n, jnp.bool_)
    empty = lo > hi
    if rows_offsets is not None and kind in ("SUM", "AVG", "COUNT") \
            and not (kind in ("SUM", "AVG")
                     and _ds_eligible(acc_dtype, n, vals)):
        # bounded ROWS frame with STATIC offsets: the prefix lookups are
        # shifts of the cumsum except where the frame clamps at the
        # partition edge — there the boundary value propagates from the
        # edge (two scans + static shifts; the gather formulation cost
        # two ~480ms random gathers at 2^27, round 5)
        return _rows_frame_agg(vals, ok, pstart, rows_offsets, kind,
                               acc_dtype, empty)
    loc = jnp.clip(lo, 0, n - 1)
    hic = jnp.clip(hi, 0, n - 1)
    # counts in int32 (n < 2^31; int64 cumsum is emulated and slow on TPU)
    pc = _prefix(ok.astype(jnp.int32))
    cnt = jnp.where(empty, 0, pc[hic + 1] - pc[loc])
    if kind == "COUNT":
        return cnt, None  # int32; widened at egress
    if kind in ("SUM", "AVG") and _ds_eligible(acc_dtype, n, vals):
        # double-single prefix (see running_agg) — frame sums become ds
        # diffs of the gathered prefixes, combined to f64 at the end
        c32 = jnp.where(ok, jnp.asarray(vals, jnp.float32), 0.0)
        H, L = SC.cumsum_ds(c32)
        Hp = jnp.concatenate([jnp.zeros(1, jnp.float32), H])
        Lp = jnp.concatenate([jnp.zeros(1, jnp.float32), L])
        sh, sl = SC.ds_add(Hp[hic + 1], Lp[hic + 1], -Hp[loc], -Lp[loc])
        s = sh.astype(jnp.float64) + sl.astype(jnp.float64)
        s = jnp.where(empty, jnp.asarray(0, jnp.float64), s)
        if kind == "AVG":
            return s / jnp.maximum(cnt, 1), cnt > 0
        return s, cnt > 0
    x = jnp.asarray(vals, acc_dtype)
    if kind in ("SUM", "AVG"):
        pv = _prefix(jnp.where(ok, x, jnp.asarray(0, acc_dtype)))
        s = jnp.where(empty, jnp.asarray(0, acc_dtype),
                      pv[hic + 1] - pv[loc])
        if kind == "AVG":
            return s / jnp.maximum(cnt, 1), cnt > 0
        return s, cnt > 0
    if kind in ("MIN", "MAX"):
        ident, op = _minmax_ident(kind, acc_dtype)
        xm = jnp.where(ok, x, ident)
        if lo_unbounded:
            run = _seg_running_op(xm, pstart, op)
            out = run[hic]
        elif hi_unbounded:
            pend_flag = jnp.concatenate(
                [pstart[1:], jnp.ones(1, jnp.bool_)]
            )
            run = _seg_running_op(xm[::-1], pend_flag[::-1], op)[::-1]
            out = run[loc]
        elif group_starts is not None:
            # RANGE CURRENT ROW .. CURRENT ROW: peer-group aggregate
            run = _seg_running_op(xm, group_starts, op)
            _, ge = segment_bounds(group_starts)
            out = run[ge]
        else:
            assert rows_max_width is not None
            out = _window_minmax_table(xm, loc, hic, rows_max_width, op,
                                       ident)
        return out, cnt > 0
    raise ValueError(kind)


def _rows_frame_agg(vals, ok, pstart, rows_offsets, kind, acc_dtype,
                    empty):
    """SUM/AVG/COUNT over [i+lo_off, i+hi_off] clamped to the partition,
    gather-free: global inclusive cumsums, static shifts for in-range
    lookups, and partition-edge boundary values via propagation."""
    lo_off, hi_off = rows_offsets
    n = vals.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    ps, pe = segment_bounds(pstart)
    endf = jnp.concatenate([pstart[1:], jnp.ones(1, jnp.bool_)])

    def framed_sum(contrib, dt):
        c = SC.cumsum(jnp.asarray(contrib, dt))
        zero = jnp.asarray(0, dt)
        # c just before the partition start (0 for the first partition)
        c_prev = _static_shift(c, 1, zero)
        c_before, _ = seg_propagate(pstart, c_prev, c_prev)
        c_end = seg_propagate(endf, c, reverse=True)
        # c[min(i+hi_off, pe)]
        hi_in = (i + jnp.int32(hi_off)) <= pe
        c_hi = jnp.where(hi_in, _static_shift(c, -hi_off, zero), c_end)
        # low side clamps at ps → c[ps-1] = c_before
        lo_in = (i + jnp.int32(lo_off)) >= ps
        c_lo = jnp.where(lo_in, _static_shift(c, -(lo_off - 1), zero),
                         c_before)
        return c_hi - c_lo

    cnt = framed_sum(ok.astype(jnp.int32), jnp.int32)
    cnt = jnp.where(empty, 0, cnt)
    if kind == "COUNT":
        return cnt, None
    s = framed_sum(jnp.where(ok, jnp.asarray(vals, acc_dtype),
                             jnp.asarray(0, acc_dtype)), acc_dtype)
    s = jnp.where(empty, jnp.asarray(0, acc_dtype), s)
    if kind == "AVG":
        return s / jnp.maximum(cnt, 1), cnt > 0
    return s, cnt > 0


def frame_bounds(pstart, ostart, frame):
    """Row-space [lo, hi] per row for an explicit frame spec
    (unit, lo_bound, hi_bound).  RANGE bounds are peer-group based
    (UNBOUNDED/CURRENT only); ROWS bounds are row offsets.  Clamped to
    the partition; empty frames come out as lo > hi."""
    unit, b1, b2 = frame
    n = pstart.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    ps, pe = segment_bounds(pstart)
    if unit == "ROWS":
        def bnd(b):
            if b[0] == "UP":
                return ps
            if b[0] == "UF":
                return pe
            if b[0] == "CR":
                return i
            return i - b[1] if b[0] == "P" else i + b[1]
        lo, hi = bnd(b1), bnd(b2)
    else:
        gs, ge = segment_bounds(pstart | ostart)
        lo = ps if b1[0] == "UP" else gs
        hi = pe if b2[0] == "UF" else ge
    return jnp.maximum(lo, ps), jnp.minimum(hi, pe)
