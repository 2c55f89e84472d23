"""Pallas TPU kernel: mid-cardinality group-by aggregation.

The problem: XLA scatter-add with colliding indices serializes on TPU
(measured 33.8s for 100M rows → 2 slots), and a global one-hot matmul
materializes an N×slots tensor in HBM.  This kernel is the TPU-native
middle path (role of the reference's GPU shared-memory aggregation,
QueryEngine/GpuSharedMemory*): grid over row blocks; each step builds the
block's one-hot matrix ONLY in VMEM and accumulates partial sums into a
VMEM-resident [slots] accumulator with the MXU:

    acc[slots] += values[1, block] @ onehot[block, slots]

HBM traffic = N reads + slots writes (speed-of-light for the op); FLOPs =
N × slots on the MXU.  Counts accumulate in int32 (per-block dot results
are small exact ints, so the f32→i32 round-trip per block stays exact —
f32 accumulation alone would lose exactness past 2^24).

Practical for slots up to a few thousand; the block size shrinks as slots
grow so the VMEM one-hot tile stays bounded.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_MAX_SLOTS = 4096


def _round_up(x, m):
    return (x + m - 1) // m * m


def _block_for(slots_p: int, with_minmax: bool) -> int:
    # keep the [block, slots_p] f32 tiles within a few MB of VMEM
    budget = (1 << 21) if with_minmax else (1 << 22)  # 2MB / 4MB
    b = budget // (4 * slots_p)
    return int(max(128, min(1024, _round_up(b, 128) if b >= 128 else 128)))


@functools.partial(
    jax.jit, static_argnames=("num_slots", "want_min", "want_max", "interpret")
)
def groupby_count_sum(
    gid,
    values,
    mask,
    num_slots: int,
    want_min: bool = False,
    want_max: bool = False,
    interpret: bool = False,
):
    """gid int32 [N], values f32 [N], mask bool [N] →
    (counts i64[num_slots], sums f32[num_slots], mins?, maxs?)."""
    n = gid.shape[0]
    slots_p = _round_up(max(num_slots, 128), 128)
    block = _block_for(slots_p, want_min or want_max)
    n_p = _round_up(n, block)
    if n_p != n:
        pad = n_p - n
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, jnp.bool_)])
    grid = n_p // block

    def kernel(gid_ref, val_ref, mask_ref, cnt_ref, sum_ref, *extra):
        step = pl.program_id(0)
        g = gid_ref[...]
        v = val_ref[...]
        m = mask_ref[...]

        @pl.when(step == 0)
        def _init():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)
            sum_ref[...] = jnp.zeros_like(sum_ref)
            i = 0
            if want_min:
                extra[i][...] = jnp.full_like(extra[i], np.inf)
                i += 1
            if want_max:
                extra[i][...] = jnp.full_like(extra[i], -np.inf)

        # one-hot lives only in VMEM: [block, slots_p]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (block, slots_p), 1)
        onehot = (g[:, None] == slot_iota).astype(jnp.float32)
        onehot = onehot * m[:, None].astype(jnp.float32)
        blk_cnt = jnp.dot(
            jnp.ones((1, block), jnp.float32), onehot,
            preferred_element_type=jnp.float32,
        )[0]
        cnt_ref[...] += blk_cnt.astype(jnp.int32)  # exact per block
        sum_ref[...] += jnp.dot(
            v[None, :], onehot, preferred_element_type=jnp.float32
        )[0]
        i = 0
        if want_min:
            mv = jnp.where(onehot > 0, v[:, None], np.inf).min(axis=0)
            extra[i][...] = jnp.minimum(extra[i][...], mv)
            i += 1
        if want_max:
            mv = jnp.where(onehot > 0, v[:, None], -np.inf).max(axis=0)
            extra[i][...] = jnp.maximum(extra[i][...], mv)

    out_shapes = [
        jax.ShapeDtypeStruct((slots_p,), jnp.int32),
        jax.ShapeDtypeStruct((slots_p,), jnp.float32),
    ]
    if want_min:
        out_shapes.append(jax.ShapeDtypeStruct((slots_p,), jnp.float32))
    if want_max:
        out_shapes.append(jax.ShapeDtypeStruct((slots_p,), jnp.float32))
    out_specs = [pl.BlockSpec((slots_p,), lambda i: (0,)) for _ in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((block,), lambda i: (i,)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(gid, values, mask)

    counts = outs[0][:num_slots].astype(jnp.int64)
    sums = outs[1][:num_slots]
    i = 2
    mins = maxs = None
    if want_min:
        mins = outs[i][:num_slots]
        i += 1
    if want_max:
        maxs = outs[i][:num_slots]
    return counts, sums, mins, maxs
