"""Pallas TPU kernel: lane-parallel group-by for small slot counts.

The TPU-native analogue of the reference's GPU shared-memory aggregation
(QueryEngine/GpuSharedMemory*, is_gpu_shared_mem_supported): for S <= ~256
slots, keep a per-LANE accumulator matrix acc[S, 128] in VMEM and stream
row tiles (R, 128) through the VPU — for each slot s, a masked reduce over
sublanes adds the tile's per-lane contributions:

    acc[s, :] (+)= reduce_sublanes(where(g_tile == s, v_tile, ident))

Per-row cost is S elementwise ops per stream — no one-hot materialization,
no MXU, no HBM traffic beyond the input rows.  Measured on v5e (20M rows,
count+sum): 0.87ms @64 slots (23G rows/s), 5.3ms @256 slots — versus
44ms for the XLA one-hot scan and ~5ms for the bf16 matmul kernel, which
this tier beats below ~256 slots.  Uniquely, MIN/MAX ride the same pass
(no matmul formulation exists for them).

The 128 lane-partials per slot are folded outside the kernel.

Exactness:
- counts: int32 lane accumulators (exact to 2^31 rows/lane).
- int-limb streams ('sumi', values in [0,255]): int32 lane accumulators,
  exact while 255 * rows/lane < 2^31 (holds beyond 1B rows).
- f32 streams: f32 lane accumulation == a 128-way-chunked f32 sum.
- min/max: exact selects in the value's own dtype (<= 4 bytes).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

# per-tile sublane rows; tile = (R, 128) per operand
_R = 512
_UNROLL = 8
# above this, the bf16 matmul kernel (kernels/radix_hist) wins
MAX_SLOTS = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _im_row(i):
    return (jnp.int32(i), jnp.int32(0))


def _im_acc(i):
    return (jnp.int32(0), jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("num_slots", "ops", "idents", "interpret"))
def _lane_agg(g, streams, num_slots: int, ops: Tuple[str, ...],
              idents: Tuple[float, ...], interpret: bool = False):
    """g: int32[n] slot ids (-1 = masked).  streams[i]: values, f32 for
    sum*/count classes, own (<=4B) dtype for min/max; rows where the
    stream doesn't contribute already hold 0 (sums) / ident (min/max).
    ops[i] in ('sumf', 'sumi', 'min', 'max').
    Returns [counts int32[S_p,128]] + one (S_p,128) lane-partial per
    stream (caller folds lanes)."""
    n = g.shape[0]
    S_p = _round_up(max(num_slots, _UNROLL), _UNROLL)
    tile_rows = _R * 128
    n_p = _round_up(max(n, tile_rows), tile_rows)
    pad = n_p - n
    if pad:
        g = jnp.concatenate([g, jnp.full(pad, -1, jnp.int32)])
        streams = [
            jnp.concatenate([s, jnp.full(pad, iv, s.dtype)])
            for s, op, iv in zip(streams, ops, idents)
        ]
    g2 = g.reshape(-1, 128)
    s2 = [s.reshape(-1, 128) for s in streams]

    def kernel(*refs):
        g_ref = refs[0]
        v_refs = refs[1:1 + len(streams)]
        out_refs = refs[1 + len(streams):]

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_refs[0][...] = jnp.zeros_like(out_refs[0])
            for r, op, iv in zip(out_refs[1:], ops, idents):
                if op in ("sumf", "sumi"):
                    r[...] = jnp.zeros_like(r)
                else:
                    r[...] = jnp.full_like(r, iv)

        gv = g_ref[...]
        vals = [r[...] for r in v_refs]

        def body(j, _):
            base = j * jnp.int32(_UNROLL)
            cnt_rows = []
            srows = [[] for _ in streams]
            for u in range(_UNROLL):
                m = gv == (base + jnp.int32(u))
                # explicit dtype: under jax_enable_x64 jnp.sum promotes
                # int32 accumulators to int64, unsupported by Mosaic
                cnt_rows.append(
                    jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True,
                            dtype=jnp.int32))
                for si, (v, op, iv) in enumerate(zip(vals, ops, idents)):
                    if op == "sumf":
                        srows[si].append(jnp.sum(
                            jnp.where(m, v, 0.0), axis=0, keepdims=True,
                            dtype=jnp.float32))
                    elif op == "sumi":
                        # int reductions promote to int64 inside jnp.sum
                        # under x64 (Mosaic-fatal); per-tile sums of
                        # [0,255] values over _R=512 sublanes stay exact
                        # in f32 (< 2^24) — sum f32, accumulate int32
                        srows[si].append(jnp.sum(
                            jnp.where(m, v, 0.0), axis=0, keepdims=True,
                            dtype=jnp.float32).astype(jnp.int32))
                    elif op == "min":
                        srows[si].append(jnp.min(
                            jnp.where(m, v, jnp.asarray(iv, v.dtype)),
                            axis=0, keepdims=True))
                    else:
                        srows[si].append(jnp.max(
                            jnp.where(m, v, jnp.asarray(iv, v.dtype)),
                            axis=0, keepdims=True))
            sl = pl.ds(base, _UNROLL)
            out_refs[0][sl, :] += jnp.concatenate(cnt_rows, axis=0)
            for si, (op, iv) in enumerate(zip(ops, idents)):
                new = jnp.concatenate(srows[si], axis=0)
                r = out_refs[1 + si]
                if op in ("sumf", "sumi"):
                    r[sl, :] += new
                elif op == "min":
                    r[sl, :] = jnp.minimum(r[sl, :], new)
                else:
                    r[sl, :] = jnp.maximum(r[sl, :], new)
            return jnp.int32(0)

        # int32 bounds: under jax_enable_x64 a default fori index traces
        # as int64 and poisons every downstream compare/slice in Mosaic
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(S_p // _UNROLL), body,
                          jnp.int32(0))

    out_shapes = [jax.ShapeDtypeStruct((S_p, 128), jnp.int32)]
    for op, s in zip(ops, streams):
        if op == "sumf":
            out_shapes.append(jax.ShapeDtypeStruct((S_p, 128), jnp.float32))
        elif op == "sumi":
            out_shapes.append(jax.ShapeDtypeStruct((S_p, 128), jnp.int32))
        else:
            out_shapes.append(jax.ShapeDtypeStruct((S_p, 128), s.dtype))

    return pl.pallas_call(
        kernel,
        grid=(n_p // tile_rows,),
        in_specs=[pl.BlockSpec((_R, 128), _im_row)] * (1 + len(streams)),
        out_specs=[pl.BlockSpec((S_p, 128), _im_acc)] * (1 + len(streams)),
        out_shape=out_shapes,
        interpret=interpret,
    )(g2, *s2)


def lane_agg(gid, mask, streams, num_slots: int,
             interpret: bool = False):
    """streams: sequence of (values, op, ident) with op in
    ('sumf','sumi','min','max'); sum values must already be zeroed and
    min/max values ident-filled on non-contributing rows.  Returns
    [counts int64[S]] + one folded array per stream (sumf -> float64 lane
    fold, sumi -> int64, min/max -> value dtype)."""
    g = jnp.asarray(gid, jnp.int32)
    if mask is not None:
        g = jnp.where(mask, g, jnp.int32(-1))
    g = jnp.where((g >= 0) & (g < num_slots), g, jnp.int32(-1))
    ops = tuple(op for _, op, _ in streams)
    # idents must stay python scalars of the right kind (an int ident like
    # INT32_MAX would round if coerced through float)
    idents = tuple(
        (0 if op in ("sumf", "sumi") else iv) for _, op, iv in streams)
    vals = []
    for v, op, iv in streams:
        v = jnp.asarray(v)
        if op in ("sumf", "sumi"):
            v = v.astype(jnp.float32)  # sumi: exact small ints, cast back
        vals.append(v)
    res = _lane_agg(g, vals, num_slots, ops, idents, interpret=interpret)
    counts = res[0].astype(jnp.int64).sum(axis=1)[:num_slots]
    out = [counts]
    for r, (v, op, iv) in zip(res[1:], streams):
        if op == "sumf":
            out.append(r.astype(jnp.float64).sum(axis=1)[:num_slots])
        elif op == "sumi":
            out.append(r.astype(jnp.int64).sum(axis=1)[:num_slots])
        elif op == "min":
            out.append(r.min(axis=1)[:num_slots])
        else:
            out.append(r.max(axis=1)[:num_slots])
    return out
