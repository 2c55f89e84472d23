"""Pallas TPU pipeline: sparse / huge-cardinality group-by at bandwidth.

The TPU-native replacement for the reference's baseline-hash group-by
(QueryEngine/GroupByRuntime.cpp:25 get_group_value, MurmurHash open
addressing; JoinHashTable/Runtime/HashJoinRuntime.cpp is the same kernel
family) for key spaces far beyond VMEM — e.g. 10M distinct keys at 20M
rows, where the round-2 engine bottomed out at two lax.sort HBM
round-trip networks (~190ms/20M; docs/sparse_groupby_shootout.md).

Round-3 capability probes (benchmarks/probe_mosaic_caps.py) showed this
toolchain's Mosaic supports every dynamic-addressing form the shootout
doc believed blocked: dynamic sublane-offset VMEM reads/writes,
dynamic-row async copies in all directions, data-dependent lane
gathers, dynamic trip counts, and SMEM scalars carried across the
sequential grid.  DMA issue cost measured 5-60ns, and the in-VMEM
bitonic tile sort is ~bandwidth-bound.  That unlocks the classic
radix-partition design:

  0. hash    h = gid * 0x9E3779B1 (u32 Fibonacci: BIJECTIVE, so equal
             hash <=> equal gid, and gid = h * INV recovers keys; no
             gid < 2^31 hashes to the sentinel — checked).  Biased by
             XOR 2^31 so signed int32 compares give unsigned order.
  1. L1 partition: per 32k-element tile — bitonic sort by h, bucket
             run boundaries via threshold counts, chunked (8,128) DMA
             append of each run to its bucket region at an SMEM row
             cursor.  Boundary-row fringe elements ride along and are
             filtered downstream by their own bucket bits; sequential
             grid steps make later appends overwrite chunk padding.
             Region buffers are SENT-initialized (input/output
             aliasing) so stale rows self-identify.
  2. L2 partition: same kernel over each L1 region -> P1*P2 final
             partitions of <= 32k elements.
  3. group   per partition: bitonic sort by h, segment boundaries,
             segmented-scan ladders (count / f32 sum / double-single
             f32-pair sum / int32 sum / min / max), per-group records
             at segment-END rows, a compaction sort, and a
             carry-blended append to the global output (sub-row
             alignment via a data-dependent lane gather).

Overflow (a final partition exceeding capacity, or an int-limb sum
segment longer than the exactness bound) sets a flag; the executor
reruns on the sort tier (same pattern as err_count_distinct_overflow).

Exactness:
- counts: int32 ladders (n < 2^31).
- f32 sums: segmented tree sums in f32; f64 accumulators use
  double-single f32 pairs (TwoSum ladder, ~2^-48 — the engine's
  established big-sum representation).
- int sums: EXACT via two 16-bit limbs of the bias-flipped value in
  int32 ladders; exact while every group has <= 32767 contributing
  rows (flagged otherwise).
- min/max: exact selects in the value's own (<= 4-byte) dtype.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heavydb_tpu.kernels.tile_sort import _tile_bitonic

# one tile = 32k elements = (256,128): the largest whose bitonic holds 4
# payloads within scoped VMEM (benchmarks/probe_sort_vmem.py)
_R = 256
_TILE = _R * 128
_CH = 8                        # DMA chunk rows (min 4-byte sublane tile)
_SENT = np.int32(0x7FFFFFFF)   # biased-h sentinel: sorts last
_NBIAS = np.int32(-0x80000000)  # bit pattern 0x80000000
_MULT = np.uint32(0x9E3779B1)
_INV = np.uint32(pow(0x9E3779B1, -1, 1 << 32))
# int-limb segment sums stay exact in int32 while count*65535 < 2^31
MAX_SEG_INT = 32767
# payload streams one 32k bitonic carries (probe_sort_vmem.py)
MAX_STREAMS = 4
# per-partition target fill: leaves room for fringe + chunk padding
_TARGET_FILL = 24576
_OPS = ("sumf", "sumi32", "min", "max", "sumds_hi", "sumds_lo")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _next_pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


# ---------------------------------------------------------------------------
# in-VMEM element-order shift / segmented scan helpers
# ---------------------------------------------------------------------------


def _sum_scalar(x):
    """Scalar int32 sum of a 2-D tile, x64-safe inside Mosaic: FULL
    reductions promote the accumulator to i64 under jax_enable_x64
    (Mosaic rejects 64-bit); staged per-axis reductions with an explicit
    dtype stay 32-bit."""
    r = jnp.sum(x, axis=0, keepdims=True, dtype=jnp.int32)
    return jnp.sum(r, axis=1, keepdims=True, dtype=jnp.int32)[0, 0]


def _lane_gather(x, idx):
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(x, idx[:, :, None], dnums, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _shift_down(x, d: int, fill):
    """y[i] = x[i-d] in flattened (row*128+lane) order; y[:d] = fill.
    d: power of two."""
    R = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    if d >= 128:
        rs = d >> 7
        y = pltpu.roll(x, shift=jnp.int32(rs), axis=0)
        return jnp.where(rows < rs, fill, y)
    lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = (lanes - jnp.int32(d)) & jnp.int32(127)
    g = _lane_gather(x, idx)
    gprev = pltpu.roll(g, shift=jnp.int32(1), axis=0)
    y = jnp.where(lanes >= d, g, gprev)
    return jnp.where((rows == 0) & (lanes < d), fill, y)


def _shift_up1(x, fill):
    """y[i] = x[i+1]; y[last] = fill."""
    R = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = (lanes + jnp.int32(1)) & jnp.int32(127)
    g = _lane_gather(x, idx)
    xup = pltpu.roll(x, shift=jnp.int32(R - 1), axis=0)  # xup[r] = x[r+1]
    gup = _lane_gather(xup, idx)
    y = jnp.where(lanes == 127, gup, g)
    return jnp.where((rows == R - 1) & (lanes == 127), fill, y)


def _tile_compact(keep, chans, R: int):
    """Stable in-VMEM stream compaction: kept elements move to the FRONT
    in original order via hypercube packing — monotone destinations
    route congestion-free dimension by dimension (LSB→MSB, the classic
    packing-on-butterfly result), so compaction costs log2(n) xor-
    partner exchanges instead of a full bitonic sort's log²-stage
    network (~8× fewer vector ops; verified collision-free over 200
    random masks host-side).  Rows past the kept count hold garbage."""
    from heavydb_tpu.kernels.tile_sort import _lane_xor_gather, _row_xor

    n = R * 128
    rows = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    p = rows * jnp.int32(128) + lanes
    ki = keep.astype(jnp.int32)
    first = jnp.where(
        (rows == jnp.int32(0)) & (lanes == jnp.int32(0)),
        jnp.int32(1), jnp.int32(0),
    )
    rank = _seg_scan(ki, first, lambda a, b: a + b)  # global inclusive
    dest = jnp.where(keep, rank - jnp.int32(1), jnp.int32(0))
    alive = ki
    cur = list(chans) + [dest]
    for k in range(n.bit_length() - 1):
        s = 1 << k

        def ex(x, _s=s):
            return (_lane_xor_gather(x, _s) if _s < 128
                    else _row_xor(x, _s >> 7))

        dcur = cur[-1]
        cross = jnp.where(
            alive == 1,
            ((p ^ dcur) >> jnp.int32(k)) & jnp.int32(1),
            jnp.int32(0),
        )
        take = ex(cross) == 1
        stay = (alive == 1) & (cross == 0)
        cur = [jnp.where(take, ex(c), c) for c in cur]
        alive = jnp.where(take | stay, jnp.int32(1), jnp.int32(0))
    return cur[:-1]


def _shift_down_dyn(x, s):
    """y[i] = x[i-s] for DYNAMIC 0 <= s < 128 (garbage in y[:s])."""
    lanes = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    idx = (lanes - s) & jnp.int32(127)
    g = _lane_gather(x, idx)
    gprev = pltpu.roll(g, shift=jnp.int32(1), axis=0)
    return jnp.where(lanes >= s, g, gprev)


def _seg_scan(v, blocked0, op):
    """Inclusive segmented scan in flattened order: at element i, the
    op-reduction of its segment's prefix.  blocked0: int32 1 at segment
    starts."""
    n = v.shape[0] * 128
    blocked = blocked0
    d = 1
    while d < n:
        pv = _shift_down(v, d, jnp.zeros((), v.dtype))
        pb = _shift_down(blocked, d, jnp.int32(1))
        take = blocked == 0
        v = jnp.where(take, op(v, pv), v)
        blocked = jnp.where(take, pb, blocked)
        d <<= 1
    return v


def _seg_scan_ds(hi, lo, blocked0):
    """Segmented scan of double-single f32 pairs (TwoSum + renorm)."""
    n = hi.shape[0] * 128
    blocked = blocked0
    d = 1
    while d < n:
        ph = _shift_down(hi, d, jnp.float32(0))
        plo = _shift_down(lo, d, jnp.float32(0))
        pb = _shift_down(blocked, d, jnp.int32(1))
        s = hi + ph
        bv = s - hi
        err = (hi - (s - bv)) + (ph - bv)
        l2 = lo + plo + err
        hh = s + l2
        ll = l2 - (hh - s)
        take = blocked == 0
        hi = jnp.where(take, hh, hi)
        lo = jnp.where(take, ll, lo)
        blocked = jnp.where(take, pb, blocked)
        d <<= 1
    return hi, lo


# ---------------------------------------------------------------------------
# partition kernel (levels 1 and 2)
# ---------------------------------------------------------------------------


def _partition_call(hb2, streams2, P: int, shift: int, region_log: int,
                    cap_rows: int, check_shift: int, n_regions: int,
                    interpret: bool, presorted: bool = False,
                    ch: int = _CH):
    """Run one partition pass.  hb2/streams2: (rows,128) tiled input.
    Returns (hb_out, stream_outs, flag[8,128]).

    presorted: the input rows are 128-aligned sorted runs (a previous
    partition pass's output) — the tile bitonic warm-starts at level 8
    and OTHER-REGION fringe elements ride RAW instead of being filtered
    to SENT (replacing them would break the sorted-row precondition);
    they sort to the tile edges, append into edge buckets as fringe,
    and are dropped by the group stage's membership check.  NOTE: kept
    OFF for the L2 pass — L1 run boundaries carry ~25% fringe (runs are
    only ~8 rows), and riding that through L2 overflowed final
    partitions (measured round 5); the SENT pre-filter both drops the
    fringe and keeps rows sorted for the GROUP stage's warm start."""
    n_streams = len(streams2)
    ntiles = hb2.shape[0] // _R
    out_rows = n_regions * P * cap_rows
    trip_shift = int(np.log2(ch))

    def kernel(*refs):
        h_ref = refs[0]
        s_refs = refs[1: 1 + n_streams]
        # refs[1+n_streams] is the aliased SENT-init buffer (unused here)
        houtb = refs[2 + n_streams]
        soutb = refs[3 + n_streams: 3 + 2 * n_streams]
        flag_ref = refs[3 + 2 * n_streams]
        scr = refs[4 + 2 * n_streams: 5 + 3 * n_streams]
        cur_ref = refs[5 + 3 * n_streams]
        sem = refs[6 + 3 * n_streams]

        i = pl.program_id(0)
        region = lax.shift_right_logical(i, jnp.int32(region_log))
        tile_in_region = i & jnp.int32((1 << region_log) - 1)

        @pl.when(i == 0)
        def _():
            flag_ref[...] = jnp.zeros_like(flag_ref)

        @pl.when(tile_in_region == 0)
        def _():
            for b in range(P):
                cur_ref[b] = jnp.int32(0)

        hb = h_ref[...]
        if check_shift >= 0 and not presorted:
            # level 2: fringe rows carry another region's bucket bits,
            # stale rows are SENT-initialized — both filter by value
            l1b = lax.shift_right_logical(hb ^ _NBIAS,
                                          jnp.int32(check_shift))
            hb = jnp.where(l1b == region, hb, _SENT)
        # element counts are permutation-invariant: count PRE-sort so
        # all-SENT tiles (region padding past the L1 cursor — ~40% of L2
        # tiles at the 1.45 margin + pow2 rounding) skip the bitonic
        # entirely
        n_valid = _sum_scalar((hb < _SENT).astype(jnp.int32))

        @pl.when(n_valid > 0)
        def _process():
            ops = _tile_bitonic(hb, [r[...] for r in s_refs], _R,
                                presorted_rows=presorted)
            # scratch carries one SENT-padded chunk past the tile: the
            # last bucket's chunked DMA may read up to ch-1 rows past
            # rend (trip counts round nrows up to ch), and those
            # overshoot rows must be self-identifying garbage, not an
            # OOB read of the 256-row tile
            for ci, (r, o) in enumerate(zip(scr, ops)):
                fill = jnp.full((ch, 128), _SENT, jnp.int32) if ci == 0 \
                    else jnp.zeros((ch, 128), o.dtype)
                r[...] = jnp.concatenate([o, fill], axis=0)
            hs = ops[0]

            if check_shift >= 0:
                base_u = lax.shift_left(region, jnp.int32(check_shift))
            else:
                base_u = jnp.int32(0)
            # ALL bucket boundaries at once, at ROW granularity (the
            # element-exact ends were only ever consumed as floor/ceil
            # row indices; boundary rows go to both buckets as fringe
            # either way).  One (R,P) compare + one staged reduce
            # replaces 2P data-dependent SCALAR reductions whose
            # serialized latency — not their data volume — cost
            # ~3.3ms/pass (probe_rg_inner round 5).
            first_col = hs[:, 0:1]
            last_col = hs[:, 127:128]
            bidx = lax.broadcasted_iota(jnp.int32, (1, P), 1) \
                + jnp.int32(1)
            thr_vec = (base_u + lax.shift_left(
                bidx, jnp.int32(shift))) ^ _NBIAS
            rends_v = jnp.sum((first_col < thr_vec).astype(jnp.int32),
                              axis=0, keepdims=True, dtype=jnp.int32)
            r0s_v = jnp.sum((last_col < thr_vec).astype(jnp.int32),
                            axis=0, keepdims=True, dtype=jnp.int32)
            nvrows = _sum_scalar(
                (first_col < jnp.int32(_SENT)).astype(jnp.int32))
            prev_r0 = jnp.int32(0)
            total_trips = jnp.int32(0)
            chans = list(zip(scr, [houtb] + list(soutb)))
            for b in range(P):
                if b == P - 1:
                    rend = nvrows
                else:
                    rend = jnp.minimum(rends_v[0, b], nvrows)
                r0 = prev_r0
                if b < P - 1:
                    prev_r0 = jnp.minimum(r0s_v[0, b], nvrows)
                nrows = jnp.maximum(rend - r0, 0)
                trips = lax.shift_right_logical(
                    nrows + jnp.int32(ch - 1), jnp.int32(trip_shift))
                cur = cur_ref[b]
                fits = (cur + trips * jnp.int32(ch)) \
                    <= jnp.int32(cap_rows)
                dst0 = region * jnp.int32(P * cap_rows) \
                    + jnp.int32(b * cap_rows)

                @pl.when(jnp.logical_not(fits))
                def _():
                    flag_ref[...] = jnp.ones_like(flag_ref)

                @pl.when(fits & (nrows > 0))
                def _():
                    # start-only: chunk DMAs from all buckets stay in
                    # flight and drain once at the end of the grid step —
                    # a start();wait() pair per 4KB chunk serialized at
                    # ~1µs apiece and dominated the pass cost
                    def body(t, c):
                        src = r0 + t * jnp.int32(ch)
                        d = dst0 + c
                        for ci, (sref, oref) in enumerate(chans):
                            pltpu.make_async_copy(
                                sref.at[pl.ds(src, ch), :],
                                oref.at[pl.ds(d, ch), :],
                                sem.at[jnp.int32(ci)]).start()
                        return c + jnp.int32(ch)

                    lax.fori_loop(jnp.int32(0), trips, body, cur)

                cur_ref[b] = jnp.where(fits, cur + nrows, cur)
                total_trips = total_trips + jnp.where(
                    fits & (nrows > 0), trips, jnp.int32(0))

            # drain before this grid step ends: the next step overwrites
            # the scratch (DMA sources) and appends over this step's
            # chunk padding.  Chunk shape is identical per channel, so
            # waits are interchangeable within a channel's semaphore.
            def drain(t, z):
                for ci, (sref, oref) in enumerate(chans):
                    pltpu.make_async_copy(
                        sref.at[pl.ds(jnp.int32(0), ch), :],
                        oref.at[pl.ds(jnp.int32(0), ch), :],
                        sem.at[jnp.int32(ci)]).wait()
                return z

            lax.fori_loop(jnp.int32(0), total_trips, drain, jnp.int32(0))

    sent_init = jnp.full((out_rows, 128), _SENT, jnp.int32)
    in_specs = (
        [pl.BlockSpec((_R, 128),
                      lambda i: (jnp.int32(i), jnp.int32(0)))]
        * (1 + n_streams)
        + [pl.BlockSpec(memory_space=pl.ANY)]
    )
    out_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)] * (1 + n_streams)
        + [pl.BlockSpec((8, 128),
                        lambda i: (jnp.int32(0), jnp.int32(0)))]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((out_rows, 128), jnp.int32)]
        + [jax.ShapeDtypeStruct((out_rows, 128), s.dtype)
           for s in streams2]
        + [jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    )
    scratch = (
        [pltpu.VMEM((_R + ch, 128), jnp.int32)]
        + [pltpu.VMEM((_R + ch, 128), s.dtype) for s in streams2]
        + [pltpu.SMEM((P,), jnp.int32),
           pltpu.SemaphoreType.DMA((1 + n_streams,))]
    )
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={1 + n_streams: 0},
        interpret=interpret,
    )(hb2, *streams2, sent_init)
    return res[0], list(res[1: 1 + n_streams]), res[1 + n_streams]


# ---------------------------------------------------------------------------
# stage 3: per-partition sort + segmented reduce + compacted append
# ---------------------------------------------------------------------------


def _groupby_call(hb2, streams2, ops: Tuple[str, ...], check_shift: int,
                  cap_out_rows: int, interpret: bool,
                  presorted: bool = False):
    """Grid over final partitions (one 32k tile each).  Returns
    (hb_out, len_out, totals..., stats[8,128]) where stats[0,0] =
    num_groups, stats[0,1] = int-limb overflow flag."""
    n_streams = len(streams2)
    nparts = hb2.shape[0] // _R
    need_seg_flag = any(o == "sumi32_limb" for o in ops)
    kop = tuple(("sumi32" if o == "sumi32_limb" else o) for o in ops)
    n_chan = 2 + n_streams  # hb, len, totals...

    def kernel(*refs):
        h_ref = refs[0]
        s_refs = refs[1: 1 + n_streams]
        out_refs = refs[1 + n_streams: 1 + n_streams + n_chan]
        stats_ref = refs[1 + n_streams + n_chan]
        stg = refs[2 + n_streams + n_chan:
                   2 + n_streams + 2 * n_chan]
        carry = refs[2 + n_streams + 2 * n_chan:
                     2 + n_streams + 3 * n_chan]
        smem = refs[2 + n_streams + 3 * n_chan]
        sem = refs[3 + n_streams + 3 * n_chan]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            smem[0] = jnp.int32(0)   # out row cursor
            smem[1] = jnp.int32(0)   # carry element count
            smem[2] = jnp.int32(0)   # total groups
            smem[3] = jnp.int32(0)   # int-limb overflow flag

        hb = h_ref[...]
        if check_shift >= 0 and not presorted:
            pb = lax.shift_right_logical(hb ^ _NBIAS,
                                         jnp.int32(check_shift))
            hb = jnp.where(pb == i, hb, _SENT)

        def _groupby_tile(hbv):
            srt = _tile_bitonic(hbv, [r[...] for r in s_refs], _R,
                                presorted_rows=presorted)
            hs = srt[0]
            svals = srt[1:]

            prev = _shift_down(hs, 1, jnp.asarray(_SENT, jnp.int32))
            is_sent = hs == _SENT
            new_seg = ((hs != prev) | ((lax.broadcasted_iota(
                jnp.int32, (_R, 128), 0) == 0) & (lax.broadcasted_iota(
                    jnp.int32, (_R, 128), 1) == 0))).astype(jnp.int32)
            nxt = _shift_up1(hs, jnp.asarray(_SENT, jnp.int32))
            keep = (hs != nxt) & jnp.logical_not(is_sent)
            if check_shift >= 0 and presorted:
                # fringe from neighbor partitions rode the sort RAW (a
                # pre-sort SENT rewrite would break the sorted-row warm
                # start); equal h implies equal partition, so dropping
                # their segment-end records drops the whole segment
                pbs = lax.shift_right_logical(hs ^ _NBIAS,
                                              jnp.int32(check_shift))
                keep = keep & (pbs == i)

            ln = _seg_scan(jnp.ones((_R, 128), jnp.int32), new_seg,
                           lambda a, b: a + b)
            totals = []
            si = 0
            while si < n_streams:
                op = kop[si]
                if op == "sumds_hi":
                    th, tl = _seg_scan_ds(svals[si], svals[si + 1],
                                          new_seg)
                    totals.append(th)
                    totals.append(tl)
                    si += 2
                    continue
                v = svals[si]
                if op == "sumf":
                    totals.append(
                        _seg_scan(v, new_seg, lambda a, b: a + b))
                elif op == "sumi32":
                    totals.append(
                        _seg_scan(v, new_seg, lambda a, b: a + b))
                elif op == "min":
                    totals.append(_seg_scan(v, new_seg, jnp.minimum))
                else:
                    totals.append(_seg_scan(v, new_seg, jnp.maximum))
                si += 1

            if need_seg_flag:
                over = _sum_scalar(
                    (keep & (ln > jnp.int32(MAX_SEG_INT))).astype(
                        jnp.int32))

                @pl.when(over > 0)
                def _():
                    smem[3] = jnp.int32(1)

            m = _sum_scalar(keep.astype(jnp.int32))
            # stable compaction: kept records first, original order
            # preserved (hypercube packing — log n exchanges, replacing
            # a second full bitonic sort)
            chans = [hs, ln] + totals
            comp = _tile_compact(keep, chans, _R)

            # carry-blended append: shift by the carried element count,
            # blend the carry row, DMA whole 128-rows, keep the remainder
            s = smem[1]
            total = s + m
            full = lax.shift_right_logical(total, jnp.int32(7))
            # staging pad = 2*_CH: shifted data can end at row 257 (s>0
            # with every element kept), the trailing DMA chunk reads up
            # to row full+_CH, and the carry read at pl.ds(full, _CH)
            # must stay in bounds for full = 257
            for ci in range(n_chan):
                x = comp[ci]
                pad = jnp.zeros((2 * _CH, 128), x.dtype)
                ext = jnp.concatenate([x, pad], axis=0)   # (_R+16, 128)
                sh = _shift_down_dyn(ext, s)
                rows2 = lax.broadcasted_iota(jnp.int32, (_R + 16, 128), 0)
                lanes2 = lax.broadcasted_iota(jnp.int32, (_R + 16, 128), 1)
                cv = carry[ci][0:1, :]
                blended = jnp.where(
                    (rows2 == 0) & (lanes2 < s),
                    jnp.broadcast_to(cv, (_R + 16, 128)), sh)
                stg[ci][...] = blended
            cur = smem[0]
            trips = lax.shift_right_logical(full + jnp.int32(_CH - 1),
                                            jnp.int32(3))
            fits = (cur + trips * jnp.int32(_CH)) \
                <= jnp.int32(cap_out_rows)

            @pl.when(fits & (full > 0))
            def _():
                # start-only chunk DMAs; drained below before the next
                # grid step can append over this step's chunk padding
                def body(t, c):
                    src = t * jnp.int32(_CH)
                    for ci in range(n_chan):
                        pltpu.make_async_copy(
                            stg[ci].at[pl.ds(src, _CH), :],
                            out_refs[ci].at[pl.ds(c, _CH), :],
                            sem.at[jnp.int32(ci)]).start()
                    return c + jnp.int32(_CH)

                lax.fori_loop(jnp.int32(0), trips, body, cur)

            trips_eff = jnp.where(fits & (full > 0), trips, jnp.int32(0))

            def drain(t, z):
                for ci in range(n_chan):
                    pltpu.make_async_copy(
                        stg[ci].at[pl.ds(jnp.int32(0), _CH), :],
                        out_refs[ci].at[pl.ds(jnp.int32(0), _CH), :],
                        sem.at[jnp.int32(ci)]).wait()
                return z

            lax.fori_loop(jnp.int32(0), trips_eff, drain, jnp.int32(0))

            # new carry = the partial row at `full`
            for ci in range(n_chan):
                carry[ci][...] = stg[ci][pl.ds(full, 8), :]
            smem[0] = jnp.where(fits, cur + full, cur)
            smem[1] = total & jnp.int32(127)
            smem[2] = smem[2] + m

        # skip empty partitions pre-sort (counts are permutation-
        # invariant); carry/cursors/stats persist untouched
        n_valid0 = _sum_scalar((hb < _SENT).astype(jnp.int32))

        @pl.when(n_valid0 > 0)
        def _():
            _groupby_tile(hb)

        @pl.when(i == jnp.int32(nparts - 1))
        def _():
            # flush the carry row, export stats
            c2 = smem[0]

            @pl.when(c2 + jnp.int32(_CH) <= jnp.int32(cap_out_rows))
            def _():
                for ci in range(n_chan):
                    cp = pltpu.make_async_copy(
                        carry[ci].at[pl.ds(jnp.int32(0), _CH), :],
                        out_refs[ci].at[pl.ds(c2, _CH), :],
                        sem.at[jnp.int32(ci)])
                    cp.start()
                    cp.wait()

            st = jnp.zeros((8, 128), jnp.int32)
            st = jnp.where(
                (lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                & (lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0),
                smem[2], st)
            st = jnp.where(
                (lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)
                & (lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 1),
                smem[3], st)
            stats_ref[...] = st

    chan_dtypes = [jnp.int32, jnp.int32] + [s.dtype for s in streams2]
    in_specs = [pl.BlockSpec((_R, 128),
                             lambda i: (jnp.int32(i), jnp.int32(0)))] \
        * (1 + n_streams)
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_chan \
        + [pl.BlockSpec((8, 128),
                        lambda i: (jnp.int32(0), jnp.int32(0)))]
    out_shape = [jax.ShapeDtypeStruct((cap_out_rows, 128), dt)
                 for dt in chan_dtypes] \
        + [jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    scratch = (
        [pltpu.VMEM((_R + 16, 128), dt) for dt in chan_dtypes]
        + [pltpu.VMEM((8, 128), dt) for dt in chan_dtypes]
        + [pltpu.SMEM((4,), jnp.int32),
           pltpu.SemaphoreType.DMA((n_chan,))]
    )
    res = pl.pallas_call(
        kernel,
        grid=(nparts,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(hb2, *streams2)
    return res[:n_chan], res[n_chan]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _plan(n_p_tiles: int):
    """Partition layout for ntiles of input: returns
    (p1, p2, region_log, cap1_rows).  P_total = 2^(p1+p2) partitions of
    ~_TARGET_FILL elements."""
    n = n_p_tiles * _TILE
    pt = max(0, int(np.ceil(np.log2(max(n / _TARGET_FILL, 1)))))
    pt = min(pt, 12)
    if pt <= 5:
        return pt, 0, 0, 0
    p1 = (pt + 1) // 2
    p2 = pt - p1
    # L1 region capacity: mean n/P1 elements * 1.45 margin, in tiles
    cap1_tiles = _next_pow2(int(np.ceil(n / (1 << p1) * 1.45 / _TILE)))
    return p1, p2, int(np.log2(cap1_tiles)), cap1_tiles * _R


def _ref_sparse_groupby(g, streams, num_slots: int,
                        ops: Tuple[str, ...], cap: int):
    """Numpy reference of the kernel contract (used via pure_callback on
    non-TPU backends — interpret-mode Pallas inside an engine jit
    compiles the full emulation graph, minutes per shape).  Semantics
    must match sparse_groupby bit-for-bit: hash output order, overflow
    bits, per-op dtypes."""
    g = np.asarray(g)
    valid = (g >= 0) & (g < num_slots)
    gv = g[valid].astype(np.int64)
    h = (gv.astype(np.uint64) * 0x9E3779B1) & 0xFFFFFFFF  # u32 Fibonacci
    order = np.argsort(h, kind="stable")
    hs = h[order]
    first = np.ones(hs.shape[0], bool)
    first[1:] = hs[1:] != hs[:-1]
    seg = np.cumsum(first) - 1
    ng = int(first.sum())
    uh = hs[first]
    gid_out = ((uh.astype(np.uint64) * np.uint64(_INV))
               & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)
    cnt = np.bincount(seg, minlength=max(ng, 1)).astype(np.int32)
    hard = 0
    if ng > 0 and int(cnt.max(initial=0)) > _TILE:
        hard = 1  # a single hash bucket can't fit one partition region
    totals = []
    si = 0
    while si < len(ops):
        op = ops[si]
        sv = np.asarray(streams[si])[valid][order]
        if op == "sumds_hi":
            lo = np.asarray(streams[si + 1])[valid][order]
            tot = np.zeros(max(ng, 1), np.float64)
            np.add.at(tot, seg, sv.astype(np.float64)
                      + lo.astype(np.float64))
            th = tot.astype(np.float32)
            tl = (tot - th.astype(np.float64)).astype(np.float32)
            totals.append(th)
            totals.append(tl)
            si += 2
            continue
        if op == "sumf":
            tot = np.zeros(max(ng, 1), np.float64)
            np.add.at(tot, seg, sv.astype(np.float64))
            totals.append(tot.astype(np.float32))
        elif op in ("sumi32", "sumi32_limb"):
            tot = np.zeros(max(ng, 1), np.int64)
            np.add.at(tot, seg, sv.astype(np.int64))
            totals.append(tot.astype(np.int32))
            if op == "sumi32_limb" and ng > 0 \
                    and int(cnt.max(initial=0)) > MAX_SEG_INT:
                hard = 1
        elif op == "min":
            tot = np.full(max(ng, 1), np.inf if sv.dtype.kind == "f"
                          else np.iinfo(sv.dtype).max, sv.dtype)
            np.minimum.at(tot, seg, sv)
            totals.append(tot)
        else:
            tot = np.full(max(ng, 1), -np.inf if sv.dtype.kind == "f"
                          else np.iinfo(sv.dtype).min, sv.dtype)
            np.maximum.at(tot, seg, sv)
            totals.append(tot)
        si += 1

    def padc(x, fill=0):
        out = np.full(cap, fill, x.dtype)
        m = min(ng, cap)
        out[:m] = x[:m]
        return out

    ovf = np.int32(hard + (2 if ng > cap else 0))
    return (padc(gid_out), padc(cnt),
            [padc(t) for t in totals],
            np.int32(ng), ovf)


def sparse_groupby_host(gid, stream_vals, num_slots: int,
                        ops: Tuple[str, ...], cap: int,
                        interpret: bool = False):
    """Jit-friendly wrapper dispatching the numpy reference through
    pure_callback — the engine's non-TPU path for the radix tier (the
    `interpret` arg is accepted for signature compatibility)."""
    streams = [jnp.asarray(s) for s in stream_vals]
    shapes = (
        jax.ShapeDtypeStruct((cap,), jnp.int32),
        jax.ShapeDtypeStruct((cap,), jnp.int32),
        tuple(jax.ShapeDtypeStruct((cap,), s.dtype) for s in streams),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )

    def cb(g, *sv):
        return _ref_sparse_groupby(g, list(sv), num_slots, ops, cap)

    out = jax.pure_callback(cb, shapes, jnp.asarray(gid, jnp.int32),
                            *streams)
    gid_out, len_out, totals, ng, ovf = out
    return gid_out, len_out, list(totals), ng, ovf


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "ops", "cap", "interpret"))
def sparse_groupby(gid, stream_vals, num_slots: int,
                   ops: Tuple[str, ...], cap: int,
                   interpret: bool = False):
    """Group rows by dense slot id gid (int32, in [0, num_slots); rows
    with gid outside the range are dropped) and aggregate streams.

    stream_vals: one array per op; ops from
      'sumf' (f32), 'sumi32' (int32, caller bounds totals),
      'sumi32_limb' (int32 16-bit limb: exact, flagged past
      MAX_SEG_INT-row groups), 'min'/'max' (4-byte dtype),
      'sumds_hi'/'sumds_lo' (adjacent pair: double-single f32 sum).

    Returns (gid_out[cap], len_out[cap] int32, totals...[cap],
    num_groups int32, overflow int32 bitmask).  num_groups is the EXACT
    total group count (may exceed cap).  overflow bit 0 = hard failure
    (a partition overflowed its region — rows were dropped — or an
    int-limb segment exceeded the exactness bound): results are invalid
    and the caller must fall back to the sort tier.  Bit 1 = output cap
    exceeded: num_groups is still exact, so the caller retries with
    cap >= num_groups.  Output order is hash order; entries past
    min(num_groups, cap) are garbage."""
    n = gid.shape[0]
    g = jnp.asarray(gid, jnp.int32)
    h = (g.astype(jnp.uint32) * _MULT).astype(jnp.uint32)
    hb = (h ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    valid = (g >= 0) & (g < num_slots)
    hb = jnp.where(valid, hb, jnp.asarray(_SENT, jnp.int32))

    ntiles = max(1, -(-n // _TILE))
    n_p = ntiles * _TILE
    if n_p != n:
        hb = jnp.concatenate(
            [hb, jnp.full(n_p - n, _SENT, jnp.int32)])
        stream_vals = [
            jnp.concatenate([jnp.asarray(s),
                             jnp.zeros(n_p - n, jnp.asarray(s).dtype)])
            for s in stream_vals]
    else:
        stream_vals = [jnp.asarray(s) for s in stream_vals]
    hb2 = hb.reshape(-1, 128)
    s2 = [s.reshape(-1, 128) for s in stream_vals]

    p1, p2, region_log, cap1_rows = _plan(ntiles)
    flags = []
    if p1 > 0:
        hb2, s2, f1 = _partition_call(
            hb2, s2, P=1 << p1, shift=32 - p1, region_log=30,
            cap_rows=(cap1_rows if p2 > 0 else _R), check_shift=-1,
            n_regions=1, interpret=interpret,
            ch=(2 * _CH if p2 > 0 else _CH))
        flags.append(f1[0, 0])
    if p2 > 0:
        hb2, s2, f2 = _partition_call(
            hb2, s2, P=1 << p2, shift=32 - p1 - p2,
            region_log=region_log, cap_rows=_R, check_shift=32 - p1,
            n_regions=1 << p1, interpret=interpret)
        flags.append(f2[0, 0])

    cap_out_rows = _round_up(cap, 128) // 128 + 2 * _CH
    check3 = (32 - p1 - p2) if (p1 + p2) > 0 else -1
    chans, stats = _groupby_call(
        hb2, s2, ops, check3, cap_out_rows, interpret=interpret,
        presorted=(p1 + p2) > 0)

    def flat(x):
        return x.reshape(-1)[:cap]

    hb_out = flat(chans[0])
    h_out = (hb_out.astype(jnp.int32) ^ jnp.int32(_NBIAS)).astype(
        jnp.uint32)
    gid_out = (h_out * _INV).astype(jnp.uint32).astype(jnp.int32)
    len_out = flat(chans[1])
    totals = [flat(c) for c in chans[2:]]
    num_groups = stats[0, 0]
    hard = stats[0, 1]  # int-limb exactness overflow
    for f in flags:    # partition region overflow (rows dropped)
        hard = jnp.maximum(hard, f)
    cap_ov = (num_groups > jnp.int32(cap)).astype(jnp.int32)
    overflow = jnp.minimum(hard, 1) + 2 * cap_ov
    return (gid_out, len_out, totals, num_groups, overflow)
