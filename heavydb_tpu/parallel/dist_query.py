"""Distributed query steps over a device mesh.

Multi-chip execution model (SURVEY §2.6: fragments → shards, multi-device
reduce → psum, hash-partition shuffle → all_to_all):

- **Partitioned scan + partial aggregate + merge**: each shard filters its
  rows and computes partial aggregate buffers over the full group-id space;
  decomposable partials (sum/count/min/max — reference two-slot kAVG and
  skip-val agg semantics) merge with one psum/pmin/pmax over ICI.  This is
  the analogue of the reference's reduceMultiDeviceResults (Execute.cpp:1696).
- **Hash repartition (shuffle)**: rows are routed to the shard owning
  hash(key) via all_to_all; the analogue of the enterprise leaf/aggregator
  broadcast_serialized_rows data plane (heavy.thrift:771), but riding XLA
  collectives instead of Thrift.

These functions are shard_map'd bodies — executed per-device with explicit
collectives, the "manual SPMD" style, so compile once and scale by mesh.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from heavydb_tpu.parallel.mesh import SHARD_AXIS


def distributed_groupby_sum_count(
    mesh: Mesh,
    num_slots: int,
):
    """Builds a jitted distributed step:
    (keys[N], values[N], nrows_per_shard[S]) sharded by rows →
    (counts[num_slots], sums[num_slots]) replicated.

    Filter+partial-agg runs shard-local; one psum over ICI merges.
    """

    def shard_body(keys, values, nrows):
        # keys/values: this shard's rows [n_local]; nrows: [1] actual count
        n_local = keys.shape[0]
        in_domain = lax.broadcasted_iota(jnp.int32, (n_local,), 0) < nrows[0]
        gid = jnp.clip(keys.astype(jnp.int32), 0, num_slots - 1)
        seg = jnp.where(in_domain, gid, num_slots)
        counts = jnp.zeros(num_slots + 1, jnp.int64).at[seg].add(1)[:num_slots]
        vals = jnp.where(in_domain, values, 0).astype(jnp.float32)
        sums = jnp.zeros(num_slots + 1, jnp.float32).at[seg].add(vals)[:num_slots]
        # merge partials across shards over ICI
        counts = lax.psum(counts, SHARD_AXIS)
        sums = lax.psum(sums, SHARD_AXIS)
        return counts, sums

    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)


def distributed_groupby_reduce_scatter(mesh: Mesh, num_slots: int):
    """Owner-sharded distributed group-by: shard-local dense partials,
    then ONE reduce_scatter so each shard owns slots [s*B, (s+1)*B).

    This is the scalable form of distributed_groupby_sum_count (psum
    replicates the whole slot space on every chip; reduce_scatter moves
    1/S as many bytes and leaves results distributed for downstream
    sharded consumption).  Map-side combining makes it skew-immune: a
    key appearing on every row still contributes one partial per shard
    (reference: leaf partial aggregation + aggregator merge, without the
    row shuffle)."""
    n_shards = mesh.shape[SHARD_AXIS]
    block = -(-num_slots // n_shards)
    padded_slots = block * n_shards

    def shard_body(keys, values, nrows):
        n_local = keys.shape[0]
        in_domain = lax.broadcasted_iota(jnp.int32, (n_local,), 0) < nrows[0]
        gid = jnp.clip(keys.astype(jnp.int32), 0, num_slots - 1)
        seg = jnp.where(in_domain, gid, padded_slots)
        counts = jnp.zeros(padded_slots + 1, jnp.int32).at[seg].add(
            1
        )[:padded_slots]
        vals = jnp.where(in_domain, values, 0).astype(jnp.float32)
        sums = jnp.zeros(padded_slots + 1, jnp.float32).at[seg].add(
            vals
        )[:padded_slots]
        # sum across shards, scattering slot-blocks to their owners (ICI)
        counts = lax.psum_scatter(
            counts.reshape(n_shards, block), SHARD_AXIS,
            scatter_dimension=0, tiled=False,
        )
        sums = lax.psum_scatter(
            sums.reshape(n_shards, block), SHARD_AXIS,
            scatter_dimension=0, tiled=False,
        )
        return counts.reshape(block), sums.reshape(block)

    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
    )
    return jax.jit(mapped)


def distributed_topk(mesh: Mesh, k: int, descending: bool = True):
    """Distributed ORDER BY … LIMIT k: shard-local top-k, all_gather the
    S·k candidates over ICI, final top-k replicated on every shard
    (reference: leaf sort skipped, aggregator sorts —
    RelAlgExecutor.cpp:1264-1292; here the 'aggregator' is every chip).

    fn(values[N], payload[N], nrows[S]) → (top_vals[k], top_payload[k])."""
    n_shards = mesh.shape[SHARD_AXIS]

    def shard_body(values, payload, nrows):
        n_local = values.shape[0]
        in_domain = lax.broadcasted_iota(jnp.int32, (n_local,), 0) < nrows[0]
        neutral = jnp.asarray(
            -jnp.inf if descending else jnp.inf, values.dtype
        )
        masked = jnp.where(in_domain, values, neutral)
        sv = masked if descending else -masked
        loc_v, loc_i = lax.top_k(sv, min(k, n_local))
        loc_p = payload[loc_i]
        # gather all shards' candidates (replicated on every shard)
        cand_v = lax.all_gather(loc_v, SHARD_AXIS, tiled=True)
        cand_p = lax.all_gather(loc_p, SHARD_AXIS, tiled=True)
        fin_v, fin_i = lax.top_k(cand_v, k)
        out_v = fin_v if descending else -fin_v
        return out_v, cand_p[fin_i]

    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_rep=False,  # all_gather+top_k is replicated; not inferred
    )
    return jax.jit(mapped)


def distributed_join_groupby(mesh: Mesh, row_block: int, num_groups: int):
    """Repartitioned distributed hash join + group-by in ONE shard_map
    program: both sides are routed to the shard owning hash(key) via
    all_to_all, the co-located partitions join locally (sort + probe),
    and per-group COUNT/SUM partials merge with psum.  The multi-chip
    analogue of the reference's sharded co-located joins +
    reduceMultiDeviceResults.

    fn(pk, pg, pv, pn, bk, bn) → (counts[G], sums[G]) replicated, where
    probe rows carry (key, group, value) and the build side is a key set
    (semi-join style PK side).  Skew beyond row_block reports overflow."""
    n_shards = mesh.shape[SHARD_AXIS]

    def route(keys, in_domain):
        k64 = keys.astype(jnp.uint64)
        h = (k64 * jnp.uint64(0x9E3779B97F4A7C15)) >> jnp.uint64(33)
        dest = (h % jnp.uint64(n_shards)).astype(jnp.int32)
        return jnp.where(in_domain, dest, n_shards)

    def exchange(dest, cols, n_local):
        """Route rows to dest shards with fixed row_block bins; returns
        (received cols, received counts[S], overflow)."""
        order = jnp.argsort(dest)
        sdest = dest[order]
        counts = jnp.zeros(n_shards + 1, jnp.int32).at[sdest].add(
            1
        )[:n_shards]
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        pos = lax.broadcasted_iota(jnp.int32, (n_local,), 0) - offsets[
            jnp.clip(sdest, 0, n_shards - 1)
        ]
        ok = (sdest < n_shards) & (pos < row_block)
        flat = jnp.where(
            ok, sdest * row_block + pos, n_shards * row_block
        )
        outs = []
        for c in cols:
            sc = c[order]
            send = jnp.zeros(
                n_shards * row_block + 1, c.dtype
            ).at[flat].set(sc, mode="drop")[:-1].reshape(n_shards, row_block)
            outs.append(
                lax.all_to_all(send, SHARD_AXIS, 0, 0, tiled=False)
                .reshape(n_shards * row_block)
            )
        cnt = lax.all_to_all(
            jnp.minimum(counts, row_block).reshape(n_shards, 1),
            SHARD_AXIS, 0, 0, tiled=False,
        ).reshape(n_shards)
        overflow = lax.psum(
            jnp.maximum(jnp.max(counts) - row_block, 0), SHARD_AXIS
        )
        return outs, cnt, overflow

    def shard_body(pk, pg, pv, pn, bk, bn):
        np_local = pk.shape[0]
        nb_local = bk.shape[0]
        p_dom = lax.broadcasted_iota(jnp.int32, (np_local,), 0) < pn[0]
        b_dom = lax.broadcasted_iota(jnp.int32, (nb_local,), 0) < bn[0]
        # repartition both sides by key hash → co-located partitions
        (rpk, rpg, rpv), pcnt, pov = exchange(
            route(pk, p_dom), [pk, pg, pv], np_local
        )
        (rbk,), bcnt, bov = exchange(route(bk, b_dom), [bk], nb_local)
        # received-row validity masks
        r_iota = lax.broadcasted_iota(
            jnp.int32, (n_shards * row_block,), 0
        )
        p_valid = (r_iota % row_block) < pcnt[r_iota // row_block]
        b_valid = (r_iota % row_block) < bcnt[r_iota // row_block]
        # local join: does the probe key exist in the build partition?
        sb = jnp.sort(jnp.where(b_valid, rbk, jnp.int64(2**62)))
        pos = jnp.searchsorted(sb, rpk)
        safe = jnp.clip(pos, 0, sb.shape[0] - 1)
        hit = p_valid & (sb[safe] == rpk)
        # local partial group aggregate → psum merge
        gid = jnp.clip(rpg.astype(jnp.int32), 0, num_groups - 1)
        seg = jnp.where(hit, gid, num_groups)
        counts = jnp.zeros(num_groups + 1, jnp.int32).at[seg].add(
            1
        )[:num_groups]
        sums = jnp.zeros(num_groups + 1, jnp.float32).at[seg].add(
            jnp.where(hit, rpv, 0.0).astype(jnp.float32)
        )[:num_groups]
        counts = lax.psum(counts, SHARD_AXIS)
        sums = lax.psum(sums, SHARD_AXIS)
        overflow = (pov + bov).reshape(1)
        return counts, sums, overflow

    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS),) * 6,
        out_specs=(P(), P(), P(SHARD_AXIS)),
    )
    return jax.jit(mapped)


def hash_repartition(mesh: Mesh, row_block: int):
    """Builds a jitted shuffle step: route rows to shard hash(key) % S.

    Per shard: bucket rows by destination (sort by dest), pad each
    destination bin to `row_block` rows, all_to_all the bins — the
    ragged-exchange workaround with static shapes (skew beyond row_block
    is handled by the caller's retry ladder).

    Returns fn(keys, values, nrows) → (keys', values', counts') where
    shard s receives all rows with hash(key) % S == s.
    """
    n_shards = mesh.shape[SHARD_AXIS]

    def shard_body(keys, values, nrows):
        n_local = keys.shape[0]
        in_domain = lax.broadcasted_iota(jnp.int32, (n_local,), 0) < nrows[0]
        k64 = keys.astype(jnp.uint64)
        h = (k64 * jnp.uint64(0x9E3779B97F4A7C15)) >> jnp.uint64(33)
        dest = (h % jnp.uint64(n_shards)).astype(jnp.int32)
        dest = jnp.where(in_domain, dest, n_shards)  # pad rows → dumped
        # sort rows by destination
        order = jnp.argsort(dest)
        sdest = dest[order]
        skeys = keys[order]
        svals = values[order]
        # per-destination counts and offsets
        counts = jnp.zeros(n_shards + 1, jnp.int32).at[sdest].add(1)[:n_shards]
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        # scatter rows into fixed [n_shards, row_block] send bins
        pos_in_run = lax.broadcasted_iota(jnp.int32, (n_local,), 0) - offsets[
            jnp.clip(sdest, 0, n_shards - 1)
        ]
        ok = (sdest < n_shards) & (pos_in_run < row_block)
        flat = jnp.where(
            ok, sdest * row_block + pos_in_run, n_shards * row_block
        )
        send_keys = jnp.zeros(n_shards * row_block + 1, keys.dtype).at[flat].set(
            skeys, mode="drop"
        )[:-1].reshape(n_shards, row_block)
        send_vals = jnp.zeros(n_shards * row_block + 1, values.dtype).at[flat].set(
            svals, mode="drop"
        )[:-1].reshape(n_shards, row_block)
        send_cnt = jnp.minimum(counts, row_block).reshape(n_shards, 1)
        # exchange bins over ICI
        rk = lax.all_to_all(send_keys, SHARD_AXIS, 0, 0, tiled=False)
        rv = lax.all_to_all(send_vals, SHARD_AXIS, 0, 0, tiled=False)
        rc = lax.all_to_all(send_cnt, SHARD_AXIS, 0, 0, tiled=False)
        # exact needed capacity (for the caller's retry ladder)
        overflow = lax.psum(jnp.max(counts), SHARD_AXIS)
        return (
            rk.reshape(n_shards * row_block),
            rv.reshape(n_shards * row_block),
            rc.reshape(n_shards),
            overflow.reshape(1),
        )

    mapped = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
    )
    return jax.jit(mapped)
