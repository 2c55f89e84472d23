"""Pallas TPU kernel: fused radix-factorized one-hot group-by histogram.

The TPU-native replacement for the reference's bandwidth-class group-by
probes (QueryEngine/GroupByRuntime.cpp get_group_value_fast /
get_matching_group_value_perfect_hash) for mid cardinalities
(~256 < slots <= 64k; below that kernels/lane_agg wins, above it the
sorted tier takes over): ONE MXU pass over the rows computes per-slot
counts plus every count/sum-style aggregate stream of the query.

Formulation (histogram-as-GEMM): split slot = hi*B + lo and contract
over rows —

    out[w, lo] = sum_r piece_w[r] * oh_hi[r, hi_w] * oh_lo[r, lo]

with lhs pieces stacked along w: the base one-hot (counts) plus the
one-hot times each value stream.  Per-row VPU cost is A + B one-hot
compares + A multiplies per stream — not `slots` — and the factor
matrices exist only in VMEM (XLA's jitted equivalent materializes them
to HBM because TPU matmuls read materialized operands; measured 44ms
for count+sum @20M rows/1k slots vs 4.9ms here).

Everything rides ONE default-precision dot:
- the MXU's k-streaming floor is ~0.25 cycles/row per pass at any
  (W, B) <= 128, so extra passes (e.g. Precision.HIGHEST) dominate cost;
- bf16 operands are EXACT for 0/1 one-hots, 0/1 count streams, and
  [0,255] limb streams (8-bit mantissa), and the dot accumulates in f32
  (exact for per-block sums < 2^24);
- f32 value streams are decomposed into THREE bf16 limbs
  (v = v1 + v2 + v3 exactly, 24 mantissa bits) whose partial histograms
  are summed outside — per-slot rounding matches a chunked f32 sum;
- when NO float streams exist, an int8 x int8 -> int32 dot halves the
  dominant VMEM traffic (the (block, B) one-hot tile): limbs are biased
  by -128 into int8 and the bias is undone with the base counts outside.

Accumulators stay VMEM-resident across the grid (constant output index
map), flushed once per super-chunk row so int32 limb partials cannot
overflow; int64/float64 recombination happens outside the kernel (64-bit
types are unsupported by Mosaic on v5e).

Measured on v5e, 20M rows, carry-chained (benchmarks/probe_hist.py):
count+sum(float) 4.9ms @1k slots (4.1G rows/s), count+sum(int, exact)
3.2ms @1k; versus 44-59ms for the XLA scan — 9-18x.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

# 1-D f32/i32 operands are XLA-tiled T(1024): 1-D block shapes must be
# multiples of 1024 (learned round 1, kernels/groupby_pallas.py).
_BLOCK_Q = 1024
_VMEM_BUDGET = 8 << 20
# int32 limb-partial exactness: 255 * 2^22 < 2^31
_SUPER_ROWS = 1 << 22
# f64-accumulated streams take per-super f32 partials; keep supers small
# so the cross-super f64 accumulation dominates the rounding story
_SUPER_ROWS_F64 = 1 << 19

# slot ceiling: MXU MACs/row grow with pieces*slots past W,B=128, and the
# one-hot build cost grows as sqrt(slots) — the sorted tier takes over
MAX_SLOTS = 1 << 16


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _choose_factors(num_slots: int, n_pieces: int) -> Tuple[int, int]:
    """(A_pad, B) minimizing per-row cost A*n_pieces + B; A padded to a
    sublane multiple of 8 (extra hi rows never match)."""
    best = None
    for B in (128, 256, 512, 1024):
        A = -(-num_slots // B)
        A_p = max(8, _round_up(A, 8))
        cost = A_p * max(n_pieces, 1) + B
        if best is None or cost < best[0]:
            best = (cost, A_p, B)
    return best[1], best[2]


def _im_row(i):
    return (jnp.int32(i),)


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "n_int", "n_f32", "int8_path",
                     "f64_rounding", "interpret"),
)
def _fused_hist(g, int_streams, f_streams, num_slots: int, n_int: int,
                n_f32: int, int8_path: bool, f64_rounding: bool = False,
                interpret: bool = False):
    """g: int32[n] slot ids (-1 = masked out).
    int_streams: f32[n] each, exact ints in [0, 255] per row.
    f_streams: f32[n] each (split into 3 bf16 limbs in-kernel).
    Returns (acc_i int64[(1+n_int)*A_p, B], acc_f float64[3*n_f32*A_p, B]):
    A_p-row bands, band 0 = base counts; int8_path biases limbs by -128
    (undone by the caller with the base counts)."""
    n = g.shape[0]
    n_pieces = 1 + n_int + 3 * n_f32
    A_p, B = _choose_factors(num_slots, n_pieces)
    W_i = (1 + n_int) * A_p
    W_f = 3 * n_f32 * A_p
    shift = B.bit_length() - 1

    per_row = 4 * (1 + n_int + n_f32)          # inputs
    el = 1 if int8_path else 2
    per_row += el * (W_i + W_f)                 # lhs pieces
    per_row += el * B                           # rhs one-hot
    block = _VMEM_BUDGET // max(per_row, 1)
    block = max(_BLOCK_Q, (block // _BLOCK_Q) * _BLOCK_Q)
    block = int(min(block, 16 * _BLOCK_Q))

    n_p = _round_up(max(n, block), block)
    pad = n_p - n
    if pad:
        g = jnp.concatenate([g, jnp.full(pad, -1, jnp.int32)])
        int_streams = [jnp.concatenate([s, jnp.zeros(pad, jnp.float32)])
                       for s in int_streams]
        f_streams = [jnp.concatenate([s, jnp.zeros(pad, jnp.float32)])
                     for s in f_streams]
    nblocks = n_p // block
    super_rows = _SUPER_ROWS_F64 if f64_rounding else _SUPER_ROWS
    bps = max(1, super_rows // block)
    n_super = -(-nblocks // bps)

    def im_super(i):
        return (jnp.int32(i) // jnp.int32(bps), jnp.int32(0), jnp.int32(0))

    op_dt = jnp.int8 if int8_path else jnp.bfloat16
    acc_dt = jnp.int32 if int8_path else jnp.float32

    def kernel(*refs):
        g_ref = refs[0]
        is_refs = refs[1:1 + n_int]
        fs_refs = refs[1 + n_int:1 + n_int + n_f32]
        out_i_ref = refs[1 + n_int + n_f32]
        out_f_ref = refs[2 + n_int + n_f32] if W_f else None

        @pl.when(pl.program_id(0) % jnp.int32(bps) == 0)
        def _():
            out_i_ref[...] = jnp.zeros_like(out_i_ref)
            if out_f_ref is not None:
                out_f_ref[...] = jnp.zeros_like(out_f_ref)

        gv = g_ref[...]
        # B is a power of two; // and % with int literals hit a Mosaic
        # convert-lowering recursion under jax_enable_x64 — shift/mask.
        # Masked rows (-1): arithmetic shift keeps hi = -1 -> no one-hot
        # match -> the whole lhs column is zero -> contributes nothing.
        hi = lax.shift_right_arithmetic(gv, jnp.int32(shift))
        lo = gv & jnp.int32(B - 1)
        iota_a = lax.broadcasted_iota(jnp.int32, (A_p, block), 0)
        iota_b = lax.broadcasted_iota(jnp.int32, (block, B), 1)
        il = (lo[:, None] == iota_b).astype(op_dt)       # (block, B)
        ohb = hi[None, :] == iota_a                      # (A_p, block)
        oh = ohb.astype(op_dt)
        pieces = [oh]
        for r in is_refs:
            v = r[...]
            if int8_path:
                # bias [0,255] -> [-128,127]; exact, undone outside.
                # int8 elementwise arithmetic crashes Mosaic — compute in
                # int32, cast the result (always in int8 range).
                vi = v.astype(jnp.int32) - 128
                pieces.append(
                    (ohb.astype(jnp.int32) * vi[None, :]).astype(jnp.int8))
            else:
                pieces.append(oh * v.astype(jnp.bfloat16)[None, :])
        for r in fs_refs:
            v = r[...]
            v1 = v.astype(jnp.bfloat16)
            rem = v - v1.astype(jnp.float32)
            v2 = rem.astype(jnp.bfloat16)
            v3 = (rem - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            for vk in (v1, v2, v3):
                pieces.append(oh * vk[None, :])
        lhs = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else oh
        out = jnp.dot(lhs, il, preferred_element_type=acc_dt)
        out_i_ref[0, :, :] += out[:W_i].astype(jnp.int32)
        if out_f_ref is not None:
            out_f_ref[0, :, :] += out[W_i:]

    out_shapes = [jax.ShapeDtypeStruct((n_super, W_i, B), jnp.int32)]
    out_specs = [pl.BlockSpec((1, W_i, B), im_super)]
    if W_f:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_super, W_f, B), jnp.float32))
        out_specs.append(pl.BlockSpec((1, W_f, B), im_super))

    res = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block,), _im_row)] * (1 + n_int + n_f32),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(g, *int_streams, *f_streams)
    acc_i = res[0].astype(jnp.int64).sum(axis=0)
    acc_f = (res[1].astype(jnp.float64).sum(axis=0) if W_f
             else jnp.zeros((0, B), jnp.float64))
    return acc_i, acc_f


def fused_hist(gid, mask, value_list, num_slots: int, exact_accs=(),
               bf16_ok=(), interpret: bool = False):
    """Drop-in for ops.groupby._onehot_scan with identical semantics:
    returns [counts int32] + one per-slot array per value stream.

    Stream classes (per _onehot_scan's flag encoding):
      exact_accs[i] is True and bf16_ok[i]  -> [0,255] limb stream (exact,
          returned as exactly-integral float64)
      exact_accs[i] == "count"              -> 0/1 stream (exact int64)
      exact_accs[i] is True, not bf16_ok[i] -> f32 stream, float64 acc
      else                                  -> plain f32
    """
    flags = list(exact_accs) + [False] * (len(value_list) - len(exact_accs))
    bfok = list(bf16_ok) + [False] * (len(value_list) - len(bf16_ok))
    g = jnp.asarray(gid, jnp.int32)
    if mask is not None:
        g = jnp.where(mask, g, jnp.int32(-1))
    # out-of-range gids must not alias into slots via the hi/lo split
    g = jnp.where((g >= 0) & (g < num_slots), g, jnp.int32(-1))

    int_idx = [i for i, f in enumerate(flags)
               if f == "count" or (f is True and bfok[i])]
    f_idx = [i for i in range(len(value_list)) if i not in int_idx]
    int8_path = not f_idx

    def f32s(x):
        v = jnp.asarray(value_list[x], jnp.float32)
        # masked rows may hold NaN sentinels; NaN*0 in the lhs build would
        # poison whole accumulator rows
        return jnp.where(g >= 0, v, 0.0)

    n_pieces = 1 + len(int_idx) + 3 * len(f_idx)
    A_p, B = _choose_factors(num_slots, n_pieces)
    acc_i, acc_f = _fused_hist(
        g,
        [f32s(i) for i in int_idx],
        [f32s(i) for i in f_idx],
        num_slots,
        len(int_idx),
        len(f_idx),
        int8_path,
        f64_rounding=any(flags[i] is True for i in f_idx),
        interpret=interpret,
    )

    def band_i(j):
        return acc_i[j * A_p:(j + 1) * A_p].reshape(A_p * B)[:num_slots]

    counts64 = band_i(0)
    res = [counts64.astype(jnp.int32)]
    i_j = 1
    f_j = 0
    for i in range(len(value_list)):
        if i in int_idx:
            b = band_i(i_j)
            i_j += 1
            if int8_path:
                b = b + 128 * counts64  # undo the int8 bias
            res.append(b if flags[i] == "count" else b.astype(jnp.float64))
        else:
            base = 3 * f_j * A_p
            s = (acc_f[base:base + A_p]
                 + acc_f[base + A_p:base + 2 * A_p]
                 + acc_f[base + 2 * A_p:base + 3 * A_p])
            s = s.reshape(A_p * B)[:num_slots]
            f_j += 1
            res.append(s if flags[i] is True else s.astype(jnp.float32))
    return res
