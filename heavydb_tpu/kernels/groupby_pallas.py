"""Pallas TPU kernels: mid-cardinality group-by aggregation.

Why: XLA scatter-add with colliding indices serializes on TPU — measured
33.8s for 100M rows → 2 slots, 1.28s for 20M rows → 1k slots — and a global
one-hot matmul would materialize N×slots in HBM.  These kernels are the
TPU-native middle path (role of the reference's GPU shared-memory
aggregation, QueryEngine/GpuSharedMemory*): grid over row blocks, the
block's one-hot matrix exists only in VMEM, partial aggregates accumulate
into VMEM-resident [slots] buffers (constant out index map → Mosaic keeps
the accumulator on-chip for the whole grid):

    acc[slots] += values[1, block] @ onehot[block, slots]     (MXU)

HBM traffic = N reads + slots writes; FLOPs = N×slots on the MXU.

Hardware layout rules (learned the hard way — round 1 shipped these as
dead code because every real compile failed):
- BlockSpec index maps must return explicit int32 under jax_enable_x64;
  a bare Python `0` traces as i64 and Mosaic rejects the lowered
  func.return (i32, i64).
- 1-D operands are XLA-tiled T(1024) for 4-byte dtypes: 1-D block shapes
  must be multiples of 1024 or Mosaic fails layout verification.  Bool
  and sub-4-byte operands tile differently, so masks are passed as f32.
- 64-bit types are unsupported inside kernels on v5e Mosaic: int sums
  use 8-bit limb streams with int32 accumulators, flushed to an output
  row per super-chunk so per-slot partials stay < 2^31 (final int64
  recombination happens outside the kernel).

Measured (v5e, 4M rows, 1k slots, carry-chained loop): the fused XLA
radix-factorized scan (`ops/groupby._onehot_scan`) and these kernels both
run at the VPU one-hot-build floor (~5ms counts-only, ~8-10ms
count+sum) — XLA already fuses the one-hot into the dot, so HBM traffic
was never the bottleneck.  Strategy routing therefore prefers the XLA
radix path where both apply; these kernels remain the direct-slot tier
(exact-dtype min/max, and shapes where the factorized form is awkward).

Exactness:
- counts: per-block dot results are small exact ints in f32; accumulated
  in int32 (n < 2^31).
- float sums: f32 accumulation (same as the engine's SUM(FLOAT) type).
- int sums: EXACT via 8-bit limbs of the bias-flipped value — each
  block's limb dot ≤ 1024·255 < 2^24 stays exact in f32, limb partials
  accumulate in int32 per ≤2^22-row super-chunk (≤ 255·2^22 < 2^31),
  recombined in int64 outside.
- min/max: [block, slots] masked tile reduce in the value's own dtype
  (VPU); 8-byte dtypes are ineligible (no 64-bit in Mosaic).

Used for SMALL_SLOTS < slots ≤ PALLAS_MAX_SLOTS on TPU where the
strategy table routes here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

PALLAS_MAX_SLOTS = 4096
# int32 limb-partial exactness: 255 · 2^22 < 2^31
_SUPER_ROWS = 1 << 22


def _im_row(i):
    return (jnp.int32(i),)


def _im_acc(i):
    return (jnp.int32(0),)


def _im_acc2(i):
    return (jnp.int32(0), jnp.int32(0))


def _round_up(x, m):
    return (x + m - 1) // m * m


# 1-D f32/i32 operands are XLA-tiled T(1024); block must be a multiple.
_BLOCK = 1024


def _slots_padded(num_slots: int) -> int:
    return _round_up(max(num_slots, 128), 128)


def _block_for(slots_p: int) -> int:
    # [block, slots_p] f32 one-hot tile ≤ ~4MB of VMEM (16MB/core total)
    b = (1 << 22) // (4 * slots_p)
    b = max(_BLOCK, (b // _BLOCK) * _BLOCK)
    return int(min(b, 4 * _BLOCK))


def _pad_rows(arrs, n, block):
    """Pad to a block multiple.  The first array is the slot-id vector —
    padded with -1 (no slot); the rest pad with zeros."""
    n_p = _round_up(max(n, block), block)
    if n_p == n:
        return arrs, n_p
    pad = n_p - n
    out = [jnp.concatenate(
        [arrs[0], jnp.full(pad, -1, arrs[0].dtype)])]
    out += [jnp.concatenate([a, jnp.zeros(pad, a.dtype)])
            for a in arrs[1:]]
    return out, n_p


def _prep(gid, mask):
    """Fold the validity mask into the slot id (masked rows → -1, matching
    no slot) so kernels carry ONE i32 operand instead of a separately
    tiled mask."""
    g = jnp.asarray(gid, jnp.int32)
    if mask is not None:
        g = jnp.where(mask, g, jnp.int32(-1))
    return g


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def count_per_slot(gid, mask, num_slots: int, interpret: bool = False):
    """counts[num_slots] int64."""
    g = _prep(gid, mask)
    n = g.shape[0]
    slots_p = _slots_padded(num_slots)
    block = _block_for(slots_p)
    (g,), n_p = _pad_rows((g,), n, block)

    def kernel(g_ref, cnt_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        gv = g_ref[...]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (gv[:, None] == slot_iota).astype(jnp.float32)
        blk = jnp.dot(jnp.ones((1, block), jnp.float32), onehot,
                      preferred_element_type=jnp.float32)[0]
        cnt_ref[...] += blk.astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), _im_row)],
        out_specs=pl.BlockSpec((slots_p,), _im_acc),
        out_shape=jax.ShapeDtypeStruct((slots_p,), jnp.int32),
        interpret=interpret,
    )(g)
    return out[:num_slots].astype(jnp.int64)


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def sum_f32_per_slot(gid, values, mask, num_slots: int,
                     interpret: bool = False):
    """f32 sums[num_slots] (float inputs)."""
    g = _prep(gid, mask)
    n = g.shape[0]
    slots_p = _slots_padded(num_slots)
    block = _block_for(slots_p)
    # sanitize: masked rows may hold NaN sentinels; NaN·0 poisons slots
    values = jnp.where(g >= 0, jnp.asarray(values, jnp.float32), 0.0)
    (g, values), n_p = _pad_rows((g, values), n, block)

    def kernel(g_ref, v_ref, sum_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)

        gv = g_ref[...]
        v = v_ref[...]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (gv[:, None] == slot_iota).astype(jnp.float32)
        sum_ref[...] += jnp.dot(v[None, :], onehot,
                                preferred_element_type=jnp.float32)[0]

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), _im_row)] * 2,
        out_specs=pl.BlockSpec((slots_p,), _im_acc),
        out_shape=jax.ShapeDtypeStruct((slots_p,), jnp.float32),
        interpret=interpret,
    )(g, values)
    return out[:num_slots]


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def sum_int_per_slot(gid, values, mask, num_slots: int,
                     interpret: bool = False):
    """EXACT int64 sums for int32-range values via biased 8-bit limbs.

    Values are biased by +2^31 into uint32 and split into four 8-bit
    limb streams.  Per-block limb dots (≤ block·255 < 2^24) are exact in
    f32; int32 accumulators flush one output row per ≤2^22-row
    super-chunk so per-slot partials stay < 2^31; the int64 total —
    lo limbs recombined minus the count bias — is assembled outside."""
    g = _prep(gid, mask)
    n = g.shape[0]
    slots_p = _slots_padded(num_slots)
    block = _block_for(slots_p)
    u = (jnp.asarray(values, jnp.int64) + (np.int64(1) << 31)).astype(
        jnp.uint32)
    u = jnp.where(g >= 0, u, jnp.uint32(0))
    limbs = [
        ((u >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
        for k in range(4)
    ]
    (g, *limbs), n_p = _pad_rows((g, *limbs), n, block)
    super_rows = _round_up(_SUPER_ROWS, block)
    n_super = -(-n_p // super_rows)
    blocks_per_super = super_rows // block

    def im_super(i):
        return (jnp.int32(i) // jnp.int32(blocks_per_super), jnp.int32(0))

    def kernel(g_ref, l0_ref, l1_ref, l2_ref, l3_ref,
               cnt_ref, s0_ref, s1_ref, s2_ref, s3_ref):
        @pl.when(pl.program_id(0) % jnp.int32(blocks_per_super) == 0)
        def _():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)
            s0_ref[...] = jnp.zeros_like(s0_ref)
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)
            s3_ref[...] = jnp.zeros_like(s3_ref)

        gv = g_ref[...]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (gv[:, None] == slot_iota).astype(jnp.float32)
        lhs = jnp.stack([
            jnp.ones(block, jnp.float32),
            l0_ref[...], l1_ref[...], l2_ref[...], l3_ref[...],
        ])  # [5, block]
        out = jnp.dot(lhs, onehot, preferred_element_type=jnp.float32)
        cnt_ref[...] += out[0:1].astype(jnp.int32)
        s0_ref[...] += out[1:2].astype(jnp.int32)
        s1_ref[...] += out[2:3].astype(jnp.int32)
        s2_ref[...] += out[3:4].astype(jnp.int32)
        s3_ref[...] += out[4:5].astype(jnp.int32)

    spec_out = pl.BlockSpec((1, slots_p), im_super)
    shape_out = jax.ShapeDtypeStruct((n_super, slots_p), jnp.int32)
    cnt, s0, s1, s2, s3 = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), _im_row)] * 5,
        out_specs=[spec_out] * 5,
        out_shape=[shape_out] * 5,
        interpret=interpret,
    )(g, *limbs)
    cnt64 = cnt.astype(jnp.int64).sum(axis=0)
    total = jnp.zeros(slots_p, jnp.int64)
    for k, s in enumerate((s0, s1, s2, s3)):
        total = total + (s.astype(jnp.int64).sum(axis=0) << (8 * k))
    total = total - cnt64 * (np.int64(1) << 31)
    return total[:num_slots]


@functools.partial(
    jax.jit, static_argnames=("num_slots", "is_min", "interpret")
)
def minmax_per_slot(gid, values, mask, num_slots: int, is_min: bool,
                    interpret: bool = False):
    """min/max per slot ([block, slots] masked VPU tile reduce).

    Values must be ≤ 4 bytes (no 64-bit types inside Mosaic kernels);
    sub-4-byte ints are widened to int32 by the caller contract."""
    g = _prep(gid, mask)
    n = g.shape[0]
    slots_p = _slots_padded(num_slots)
    block = _block_for(slots_p)
    dt = np.dtype(values.dtype)
    if dt.itemsize > 4:
        raise ValueError("minmax_per_slot: 64-bit values unsupported")
    if dt.itemsize < 4:
        values = values.astype(jnp.float32 if dt.kind == "f" else jnp.int32)
        dt = np.dtype(values.dtype)
    if dt.kind == "f":
        ident = np.inf if is_min else -np.inf
    else:
        info = np.iinfo(dt)
        ident = info.max if is_min else info.min
    values = jnp.where(g >= 0, values, jnp.asarray(ident, values.dtype))
    (g, values), n_p = _pad_rows((g, values), n, block)

    def kernel(g_ref, v_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, ident)

        gv = g_ref[...]
        v = v_ref[...]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        hit = gv[:, None] == slot_iota
        tile = jnp.where(hit, v[:, None], jnp.asarray(ident, v.dtype))
        red = tile.min(axis=0) if is_min else tile.max(axis=0)
        out_ref[...] = (
            jnp.minimum(out_ref[...], red) if is_min
            else jnp.maximum(out_ref[...], red)
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), _im_row)] * 2,
        out_specs=pl.BlockSpec((slots_p,), _im_acc),
        out_shape=jax.ShapeDtypeStruct((slots_p,), values.dtype),
        interpret=interpret,
    )(g, values)
    return out[:num_slots]
