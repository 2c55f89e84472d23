"""Pallas TPU kernels: mid-cardinality group-by aggregation.

Why: XLA scatter-add with colliding indices serializes on TPU — measured
33.8s for 100M rows → 2 slots, 1.28s for 20M rows → 1k slots — and a global
one-hot matmul would materialize N×slots in HBM.  These kernels are the
TPU-native middle path (role of the reference's GPU shared-memory
aggregation, QueryEngine/GpuSharedMemory*): grid over row blocks, the
block's one-hot matrix exists only in VMEM, partial aggregates accumulate
into VMEM-resident [slots] buffers:

    acc[slots] += values[1, block] @ onehot[block, slots]     (MXU)

HBM traffic = N reads + slots writes; FLOPs = N×slots on the MXU.

Exactness:
- counts: per-block dot results are small exact ints in f32; accumulated in
  int32.
- float sums: f32 accumulation (same as the engine's SUM(FLOAT) type).
- int sums: EXACT via 16-bit limbs of the 2^31-biased value — each block's
  limb dot ≤ 256·65535 < 2^24 stays exact in f32, limb totals accumulate in
  f64 (exact to 2^53), recombined as lo + 65536·hi − count·2^31.
- min/max: [block, slots] masked tile reduce in the value's own dtype (VPU).

Used for SMALL_SLOTS < slots ≤ PALLAS_MAX_SLOTS on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_MAX_SLOTS = 8192
_BIAS = np.int64(1) << 31


def _round_up(x, m):
    return (x + m - 1) // m * m


def _block_for(slots_p: int) -> int:
    # [block, slots_p] f32 tile ≤ ~2MB of VMEM; ≤256 keeps limb dots exact
    b = (1 << 21) // (4 * slots_p)
    b = max(128, min(256, (b // 128) * 128 if b >= 128 else 128))
    return int(b)


def _pad_rows(arrs, n, block):
    n_p = _round_up(n, block)
    if n_p == n:
        return arrs, n_p
    pad = n_p - n
    out = []
    for a in arrs:
        if a.dtype == jnp.bool_:
            out.append(jnp.concatenate([a, jnp.zeros(pad, jnp.bool_)]))
        else:
            out.append(jnp.concatenate([a, jnp.zeros(pad, a.dtype)]))
    return out, n_p


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def count_per_slot(gid, mask, num_slots: int, interpret: bool = False):
    """counts[num_slots] int64."""
    n = gid.shape[0]
    slots_p = _round_up(max(num_slots, 128), 128)
    block = _block_for(slots_p)
    (gid, mask), n_p = _pad_rows((gid, mask), n, block)

    def kernel(g_ref, m_ref, cnt_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        g = g_ref[...]
        mf = m_ref[...].astype(jnp.float32)  # i1 minor-dim insert unsupported
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (g[:, None] == slot_iota).astype(jnp.float32) * mf[:, None]
        blk = jnp.dot(jnp.ones((1, block), jnp.float32), onehot,
                      preferred_element_type=jnp.float32)[0]
        cnt_ref[...] += blk.astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((block,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((slots_p,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((slots_p,), jnp.int32),
        interpret=interpret,
    )(gid, mask)
    return out[:num_slots].astype(jnp.int64)


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def sum_f32_per_slot(gid, values, mask, num_slots: int, interpret: bool = False):
    """f32 sums[num_slots] (float inputs)."""
    n = gid.shape[0]
    slots_p = _round_up(max(num_slots, 128), 128)
    block = _block_for(slots_p)
    values = jnp.asarray(values, jnp.float32)
    (gid, values, mask), n_p = _pad_rows((gid, values, mask), n, block)

    def kernel(g_ref, v_ref, m_ref, sum_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)

        g = g_ref[...]
        v = v_ref[...]
        mf = m_ref[...].astype(jnp.float32)
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (g[:, None] == slot_iota).astype(jnp.float32) * mf[:, None]
        sum_ref[...] += jnp.dot(v[None, :], onehot,
                                preferred_element_type=jnp.float32)[0]

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * 3,
        out_specs=pl.BlockSpec((slots_p,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((slots_p,), jnp.float32),
        interpret=interpret,
    )(gid, values, mask)
    return out[:num_slots]


@functools.partial(jax.jit, static_argnames=("num_slots", "interpret"))
def sum_int_per_slot(gid, values, mask, num_slots: int, interpret: bool = False):
    """EXACT int64 sums for int32-range values via biased 16-bit limbs."""
    n = gid.shape[0]
    slots_p = _round_up(max(num_slots, 128), 128)
    block = _block_for(slots_p)
    u = (jnp.asarray(values, jnp.int64) + _BIAS).astype(jnp.uint32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (u >> jnp.uint32(16)).astype(jnp.float32)
    (gid, lo, hi, mask), n_p = _pad_rows((gid, lo, hi, mask), n, block)

    def kernel(g_ref, lo_ref, hi_ref, m_ref, cnt_ref, lo_sum_ref, hi_sum_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)
            lo_sum_ref[...] = jnp.zeros_like(lo_sum_ref)
            hi_sum_ref[...] = jnp.zeros_like(hi_sum_ref)

        g = g_ref[...]
        mf = m_ref[...].astype(jnp.float32)
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (g[:, None] == slot_iota).astype(jnp.float32) * mf[:, None]
        cnt = jnp.dot(jnp.ones((1, block), jnp.float32), onehot,
                      preferred_element_type=jnp.float32)[0]
        cnt_ref[...] += cnt.astype(jnp.int32)
        lo_sum_ref[...] += jnp.dot(lo_ref[...][None, :], onehot,
                                   preferred_element_type=jnp.float32)[0].astype(jnp.float64)
        hi_sum_ref[...] += jnp.dot(hi_ref[...][None, :], onehot,
                                   preferred_element_type=jnp.float32)[0].astype(jnp.float64)

    cnt, lo_s, hi_s = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * 4,
        out_specs=[
            pl.BlockSpec((slots_p,), lambda i: (0,)),
            pl.BlockSpec((slots_p,), lambda i: (0,)),
            pl.BlockSpec((slots_p,), lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((slots_p,), jnp.int32),
            jax.ShapeDtypeStruct((slots_p,), jnp.float64),
            jax.ShapeDtypeStruct((slots_p,), jnp.float64),
        ],
        interpret=interpret,
    )(gid, lo, hi, mask)
    total = (
        lo_s.astype(jnp.int64)
        + (hi_s.astype(jnp.int64) << 16)
        - cnt.astype(jnp.int64) * _BIAS
    )
    return total[:num_slots]


@functools.partial(
    jax.jit, static_argnames=("num_slots", "is_min", "interpret")
)
def minmax_per_slot(gid, values, mask, num_slots: int, is_min: bool,
                    interpret: bool = False):
    """min/max per slot in the value's own dtype ([block, slots] VPU tile)."""
    n = gid.shape[0]
    slots_p = _round_up(max(num_slots, 128), 128)
    block = _block_for(slots_p)
    dt = np.dtype(values.dtype)
    if dt.kind == "f":
        ident = np.inf if is_min else -np.inf
    else:
        info = np.iinfo(dt)
        ident = info.max if is_min else info.min
    (gid, values, mask), n_p = _pad_rows((gid, values, mask), n, block)

    def kernel(g_ref, v_ref, m_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, ident)

        g = g_ref[...]
        v = v_ref[...]
        m32 = m_ref[...].astype(jnp.int32)
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        hit = (g[:, None] == slot_iota) & (m32[:, None] > 0)
        tile = jnp.where(hit, v[:, None], jnp.asarray(ident, v.dtype))
        red = tile.min(axis=0) if is_min else tile.max(axis=0)
        out_ref[...] = (
            jnp.minimum(out_ref[...], red) if is_min
            else jnp.maximum(out_ref[...], red)
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_p // block,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,))] * 3,
        out_specs=pl.BlockSpec((slots_p,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((slots_p,), values.dtype),
        interpret=interpret,
    )(gid, values, mask)
    return out[:num_slots]
