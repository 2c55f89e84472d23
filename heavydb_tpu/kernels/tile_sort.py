"""Pallas TPU kernel: in-VMEM bitonic tile sort.

Why: XLA's lax.sort on TPU is a global bitonic network whose every
compare-exchange stage round-trips HBM — measured 57ms flat for 20M int32
rows (300 stages x 160MB).  Sorting 64k-row TILES entirely in VMEM runs
the same network at VPU speed: stages cost vector instructions, not HBM
passes.  Measured on v5e: 3-6ms per full pass over 20M rows — the
primitive under the device radix-partition / radix-sort pipeline that
replaces the reference's thrust sort_by_key + radix partitioning
(QueryEngine/ResultSetSortImpl.cu, GroupByRuntime.cpp hash grouping).

Layout: a tile of T = R*128 elements lives as (R, 128) vregs, element i
at (i >> 7, i & 127).  Bitonic XOR-partner exchange at stride s:
  s < 128  -> partner lane = lane XOR s: ONE tpu.dynamic_gather along
              lanes with the static index pattern iota^s
  s >= 128 -> partner row = row XOR (s>>7): two sublane rolls + select
              (static shifts)
Direction bits come from broadcasted_iota bit tests.  Payload operands
ride the sort through selects on the key comparison mask.

The sort is unstable; callers needing stability pack a position into the
key's low bits.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lane_xor_gather(x, s: int):
    """partner[i] = x[row, lane ^ s] via one dynamic_gather along lanes."""
    R = x.shape[0]
    lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = lanes ^ jnp.int32(s)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(x, idx[:, :, None], dnums, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _row_xor(x, rs: int):
    """partner[i] = x[row ^ rs, lane] via two sublane rolls + select."""
    R = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    # int32 shifts: a python-int shift traces as i64 under jax_enable_x64
    # and tpu.dynamic_rotate rejects it
    up = pltpu.roll(x, shift=jnp.int32(rs), axis=0)      # x[row - rs]
    dn = pltpu.roll(x, shift=jnp.int32(R - rs), axis=0)  # x[row + rs]
    take_dn = (rows & jnp.int32(rs)) == 0
    return jnp.where(take_dn, dn, up)


def _tile_bitonic(key, payloads, R: int, presorted_rows: bool = False):
    """Sort one (R,128) tile ascending by int32 key; payloads follow.

    presorted_rows: every 128-lane ROW of the input is already sorted
    ascending (radix partition outputs are concatenations of 128-aligned
    sorted runs — every copied row is a contiguous row of an already-
    sorted source tile).  The network then warm-starts at level 8: one
    lane-reversal substage turns the all-ascending rows into the
    alternating asc/desc 128-blocks level 8 expects, skipping levels
    1-7 (28 of 120 compare-exchange substages, measured ~22% of the
    sort)."""
    n = R * 128
    log_n = n.bit_length() - 1
    rows = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = rows * jnp.int32(128) + lanes

    ops = [key] + list(payloads)
    k_start = 1
    if presorted_rows and log_n > 7:
        # rows where bit 7 of idx is set (odd rows) must run descending
        odd = (rows & jnp.int32(1)) == 1
        ops = [
            jnp.where(odd, _lane_xor_gather(o, 127), o) for o in ops
        ]
        k_start = 8
    for k in range(k_start, log_n + 1):
        # descending blocks: bit k of index set
        desc = (lax.shift_right_logical(idx, jnp.int32(k)) &
                jnp.int32(1)) == 1
        for j in range(k - 1, -1, -1):
            s = 1 << j
            if s < 128:
                partners = [_lane_xor_gather(o, s) for o in ops]
            else:
                partners = [_row_xor(o, s >> 7) for o in ops]
            upper = (idx & jnp.int32(s)) != 0
            kv, pv = ops[0], partners[0]
            # swap iff (kv, pv) out of order for this position's role;
            # bitwise bool ops only — a select with BOOL value operands
            # crashes the Mosaic compiler
            swap = ((upper & (pv > kv)) | (~upper & (kv > pv))) ^ desc
            # NaN-free int compares; equal keys never swap (fine)
            new_ops = [jnp.where(swap, p, o) for o, p in zip(ops, partners)]
            ops = new_ops
    return ops


def _im_tile(i):
    return (jnp.int32(i), jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("rows_per_tile", "n_payloads", "interpret"))
def sort_tiles(key, payloads, rows_per_tile: int = 65536,
               n_payloads: int = 0, interpret: bool = False):
    """Sort each rows_per_tile-row tile of key (int32) ascending,
    payloads riding along.  Input length must be a tile multiple (pad
    with INT32_MAX upstream).  Returns [key_sorted, *payloads_sorted]."""
    n = key.shape[0]
    assert n % rows_per_tile == 0
    R = rows_per_tile // 128
    ntiles = n // rows_per_tile

    def kernel(*refs):
        in_refs = refs[:1 + n_payloads]
        out_refs = refs[1 + n_payloads:]
        ops = _tile_bitonic(in_refs[0][...],
                            [r[...] for r in in_refs[1:]], R)
        for o_ref, o in zip(out_refs, ops):
            o_ref[...] = o

    shapes = [jax.ShapeDtypeStruct((n // 128, 128), jnp.int32)]
    shapes += [jax.ShapeDtypeStruct((n // 128, 128), p.dtype)
               for p in payloads]
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((R, 128), _im_tile)] * (1 + n_payloads),
        out_specs=[pl.BlockSpec((R, 128), _im_tile)] * (1 + n_payloads),
        out_shape=shapes,
        interpret=interpret,
    )(key.reshape(-1, 128), *[p.reshape(-1, 128) for p in payloads])
    return [r.reshape(n) for r in res]
