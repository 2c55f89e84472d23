"""Compound work-unit kernel builder.

Builds ONE Python closure per Compound node that jax.jit traces into a single
fused XLA program: join builds/probes → filter mask → group-by/aggregate (or
projection) → compaction.  This is the replacement for the reference's
LLVM-JIT'd query_func/row_func pipeline (QueryEngine/QueryTemplateGenerator.
cpp query_group_by_template + NativeCodegen.cpp compileWorkUnit): where
HeavyDB emits a grid-stride row loop with hash-table probes and atomic
aggregates, we express the same dataflow as whole-column vector ops and
scatters/sorts that XLA tiles onto the TPU's VPU and schedules against HBM.

The kernel returns a dict (pytree) with output columns, the exact row/group
counts, the per-join-level exact needed capacities (for the executor's retry
ladder), and error flags (div-by-zero → reference ERR_DIV_BY_ZERO).

Everything static (shapes, caps, strategy, plan structure) is baked at trace
time; everything data-dependent (row counts, column values, dictionary
predicate tables) flows in as traced arguments, so one compiled program
serves all data of the same shape bucket.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu import types as T
from heavydb_tpu.errors import NotSupported
from heavydb_tpu.exec.expr_compiler import ExprCompiler, and_valid
from heavydb_tpu.ops import scan as SC
from heavydb_tpu.ops import agg as AGG
from heavydb_tpu.ops import groupby as G
from heavydb_tpu.ops import join as J
from heavydb_tpu.plan import exprs as E


def _splitmix64_combine(h, k):
    k = jnp.asarray(k, jnp.uint64)
    h = jnp.asarray(h, jnp.uint64)
    x = k + jnp.uint64(0x9E3779B97F4A7C15) + (h << jnp.uint64(6)) + (h >> jnp.uint64(2))
    z = x
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return h ^ (z ^ (z >> jnp.uint64(31)))


def _sentinelize(val, valid, ti: T.TypeInfo):
    """Apply in-band null sentinel for storage/output."""
    dt = ti.np_dtype()
    val = jnp.asarray(val, dt)
    if valid is None:
        return val
    if dt.kind == "f":
        return jnp.where(valid, val, jnp.asarray(np.nan, dt))
    return jnp.where(valid, val, jnp.asarray(ti.null_sentinel(), dt))


def _join_hash_slots(build_padded: int) -> int:
    # ≥2x the build row count (unique keys ≤ rows), pow2 for masking
    return 1 << max(int(build_padded * 2 - 1).bit_length(), 12)


def _cellify(x, y, cell):
    """Coordinates → clipped integer grid cell (exec/geo_join.py: clipping
    merges far-out cells — more candidates, never fewer)."""
    ci = jnp.clip(
        jnp.floor(jnp.asarray(x, jnp.float64) / cell), -(2.0 ** 30), 2.0 ** 30
    ).astype(jnp.int64)
    cj = jnp.clip(
        jnp.floor(jnp.asarray(y, jnp.float64) / cell), -(2.0 ** 30), 2.0 ** 30
    ).astype(jnp.int64)
    return ci, cj


def _pack_cells(ci, cj):
    return (ci << jnp.int64(32)) | (cj & jnp.int64(0xFFFFFFFF))


# colliding claim scatters cost ~4.6µs/slot beyond VMEM on this runtime —
# big builds keep the sorted/searchsorted formulation
_JOIN_HASH_MAX_SLOTS = 1 << 21


def ctrl_keys(d) -> list:
    """Control scalars the executor reads after every kernel run, in
    deterministic order.  They are ALSO packed into one int32 vector
    ('ctrl_vec'): jax.device_get fetches pytree leaves SEQUENTIALLY and
    each leaf costs a full relay round trip — four separate scalars
    measured 0.60s of a 0.62s warm join query (round 5)."""
    return sorted(
        k for k in d
        if k in ("n_out", "num_groups", "hash_unresolved",
                 "radix_overflow")
        or k.startswith("join_needed_") or k.startswith("join_hash_miss_")
        or k.startswith("join_dup_") or k.startswith("err_")
    )


def _build_compound_kernel(node, batches, plan, config):
    """Returns (kernel_fn, layout).  kernel_fn(*args) -> dict."""
    from heavydb_tpu.exec.executor import _derive_valid, _KernelLayout

    offsets = plan.offsets
    n_inputs = len(node.inputs)

    # ---- argument layout (static) ----
    batch_cols = []
    for bi, b in enumerate(batches):
        present = [ci for ci, c in enumerate(b.cols) if c is not None]
        batch_cols.append((bi, present))
    nrows_batches = list(range(n_inputs))
    aux_order = sorted(plan.aux_specs.keys(), key=repr)
    layout = _KernelLayout(batch_cols, nrows_batches, aux_order)

    paddeds = [b.padded for b in batches]
    col_types = [list(b.types) for b in batches]

    udfs = getattr(plan, 'udfs', None) or {}
    is_agg = node.is_aggregate
    group_strategy = plan.group_strategy
    group_cap = plan.group_cap
    joins = plan.joins
    caps = list(plan.caps)
    # filter push-down split (executor._plan_compound): probe-side
    # conjuncts tighten the mask before expansion, build-side conjuncts
    # keep filtered rows out of the join tables
    pre_mask_filters = list(getattr(plan, "pre_mask", []) or [])
    build_filters = dict(getattr(plan, "build_filters", {}) or {})
    filter_rest = getattr(plan, "filter_rest", None)

    def kernel(*args):
        # ---- unpack ----
        pos = 0
        cols: Dict[int, Dict[int, jax.Array]] = {}
        for bi, present in batch_cols:
            cols[bi] = {}
            for ci in present:
                cols[bi][ci] = args[pos]
                pos += 1
        nrows = {}
        for bi in nrows_batches:
            nrows[bi] = args[pos]
            pos += 1
        aux = {}
        for k in aux_order:
            aux[k] = args[pos]
            pos += 1

        error_flags: Dict[str, jax.Array] = {}
        join_needed: List[jax.Array] = []
        join_dups: Dict[int, jax.Array] = {}
        join_hash_miss: Dict[int, jax.Array] = {}

        # ---- domain state ----
        # idx[i]: row index into input i per domain slot (None = identity for
        # input 0 before any join); matched[i]: False → LEFT-join null row
        idx: Dict[int, Optional[jax.Array]] = {0: None}
        matched: Dict[int, Optional[jax.Array]] = {0: None}
        domain_size = paddeds[0]
        mask = jax.lax.broadcasted_iota(jnp.int32, (domain_size,), 0) < nrows[0]
        trivial = True  # mask == iota<nrows[0], no compaction needed

        def input_of_field(f: int) -> Tuple[int, int]:
            for i in reversed(range(n_inputs)):
                if f >= offsets[i]:
                    return i, f - offsets[i]
            raise AssertionError

        tv_cache: Dict[int, tuple] = {}

        def field_tv(f: int):
            """TV of combined-schema field f over the CURRENT domain."""
            hit = tv_cache.get(f)
            if hit is not None:
                return hit
            i, local = input_of_field(f)
            base = cols[i][local]
            ti = col_types[i][local]
            if idx.get(i) is None and i == 0:
                val = base
            else:
                # small build-side tables (dimension joins): one-hot
                # matmul lookup instead of a per-row gather (ops/join
                # lut_gather note — gathers cost ~14ns/row regardless
                # of table size)
                val = None
                ix = idx[i]
                if getattr(base, "ndim", 1) == 1 and \
                        np.dtype(base.dtype).itemsize <= 4:
                    ixc = jnp.clip(jnp.asarray(ix, jnp.int32), 0,
                                   base.shape[0] - 1)
                    lut = J.lut_gather([base], ixc)
                    if lut is not None:
                        val = lut[0]
                if val is None:
                    val = base[ix]
            valid = _derive_valid(val, ti) if ti.nullable else None
            if matched.get(i) is not None:
                valid = matched[i] if valid is None else (valid & matched[i])
            tv = (val, valid)
            tv_cache[f] = tv
            return tv

        def domain_compiler(exprs):
            needed = set()
            for e in exprs:
                if e is None:
                    continue
                for r in E.collect_input_refs(e):
                    needed.add(r.field_idx)
            cdict = {f: field_tv(f) for f in needed}
            return ExprCompiler(cdict, aux, error_flags, udfs)

        def build_side_tv(expr, bi):
            """Evaluate a build-key expr directly over input bi's rows."""
            refs = E.collect_input_refs(expr)
            cdict = {}
            for r in refs:
                local = r.field_idx - offsets[bi]
                base = cols[bi][local]
                ti = col_types[bi][local]
                valid = _derive_valid(base, ti) if ti.nullable else None
                cdict[r.field_idx] = (base, valid)
            c = ExprCompiler(cdict, aux, error_flags, udfs)
            return c.compile(expr)

        def pack_keys(tvs, jp, is_build):
            """Combine one or more key TVs into a single int64 key + valid."""
            valid = None
            for _, v in tvs:
                valid = and_valid(valid, v)
            if jp.pack == "single":
                k = jnp.asarray(tvs[0][0], jnp.int64)
                return k, valid
            if jp.pack == "range":
                k = None
                for (val, _), (lo, ext) in zip(tvs, jp.pack_spans):
                    part = jnp.clip(jnp.asarray(val, jnp.int64) - lo, 0, ext - 1)
                    k = part if k is None else k * ext + part
                return k, valid
            # hash pack (equality recheck appended to residual by the planner)
            h = jnp.full(tvs[0][0].shape, 0x243F6A8885A308D3, jnp.uint64)
            for val, _ in tvs:
                h = _splitmix64_combine(h, jnp.asarray(val, jnp.int64))
            return jnp.asarray(h >> jnp.uint64(1), jnp.int64), valid

        def apply_build_filters(bi, bvalid):
            """AND pushed single-input filter conjuncts into the build
            side's validity — filtered rows never enter the join table."""
            for c in build_filters.get(bi, ()):
                val, valid = build_side_tv(c, bi)
                keep = jnp.asarray(val, jnp.bool_)
                if valid is not None:
                    keep = keep & valid
                bvalid = keep if bvalid is None else (bvalid & keep)
            return bvalid

        # pushed probe-side conjuncts: tighten the mask BEFORE any join
        # expansion (the reference applies these only after a dynamic
        # selectivity probe + re-plan round trip)
        if pre_mask_filters:
            pmc = domain_compiler(pre_mask_filters)
            for c in pre_mask_filters:
                mask = mask & pmc.compile_predicate(c)
            trivial = False

        # ---- join levels ----
        for li, jp in enumerate(joins):
            bi = li + 1
            cap = caps[li]
            pb = paddeds[bi]
            left_outer = jp.kind in ("LEFT", "FULL")
            # LEFT with residual conditions: a pair failing the residual is
            # NOT a match (ON-clause semantics) — expand pairs-only, apply
            # the residual, then append a null-extended slot for every
            # probe-domain row that lost all its matches
            left_resid = jp.kind == "LEFT" and bool(jp.residual)
            if jp.kind in ("SEMI", "ANTI"):
                # existence joins: refine the mask, NO domain expansion
                # (reference: EXISTS/IN executed as hash-join quals)
                pc = domain_compiler(jp.probe_keys)
                probe_tvs = [pc.compile(e) for e in jp.probe_keys]
                pkey, pvalid = pack_keys(probe_tvs, jp, is_build=False)
                pvalid_m = mask if pvalid is None else (mask & pvalid)
                build_tvs = [build_side_tv(e, bi) for e in jp.build_keys]
                if jp.translate is not None:
                    tbl = aux[jp.translate]
                    bval, bvalid = build_tvs[0]
                    safe = jnp.clip(bval, 0, tbl.shape[0] - 1)
                    tval = jnp.where(
                        (bval >= 0) & (bval < tbl.shape[0]), tbl[safe], -1
                    )
                    build_tvs = [(tval, bvalid)]
                bkey, bvalid = pack_keys(build_tvs, jp, is_build=True)
                bvalid = apply_build_filters(bi, bvalid)
                if jp.key_min is not None:
                    pbuild = J.build_perfect(
                        bkey, bvalid, nrows[bi], jp.key_min, jp.key_range
                    )
                    lo, cnt = J.probe_perfect(
                        pbuild, pkey, pvalid_m, jp.key_range
                    )
                    rows_by_slot = pbuild.payload
                elif getattr(jp, "hash_fallback", False) or \
                        _join_hash_slots(pb) > _JOIN_HASH_MAX_SLOTS:
                    build = J.build_sorted(bkey, bvalid, nrows[bi])
                    lo, cnt = J.probe_counts(build, pkey, pvalid_m)
                    rows_by_slot = build.rows_sorted
                else:
                    build = J.build_sorted(bkey, bvalid, nrows[bi])
                    table = J.build_hash_table(
                        build, _join_hash_slots(build.keys_sorted.shape[0])
                    )
                    join_hash_miss[li] = table.unresolved
                    lo, cnt = J.probe_counts_hash(table, pkey, pvalid_m)
                    rows_by_slot = build.rows_sorted
                if jp.residual:
                    # residual conditions (e.g. TPC-H Q4/Q21's correlated
                    # l_shipdate > o_orderdate, or hash-pack rechecks) need
                    # the candidate PAIRS: expand, test, then contract back
                    # to per-probe-row existence — the domain is unchanged
                    pidx, bidx, out_mask, _mn, needed = J.expand_matches(
                        lo, cnt, rows_by_slot, mask, cap, False
                    )
                    join_needed.append(needed)
                    saved_idx = dict(idx)
                    saved_matched = dict(matched)
                    for i in list(idx.keys()):
                        idx[i] = pidx if idx[i] is None else idx[i][pidx]
                        if matched.get(i) is not None:
                            matched[i] = matched[i][pidx]
                    idx[bi] = bidx
                    matched[bi] = None
                    tv_cache.clear()
                    ok = out_mask
                    rc = domain_compiler(jp.residual)
                    for r in jp.residual:
                        ok = ok & rc.compile_predicate(r)
                    idx.clear()
                    idx.update(saved_idx)
                    matched.clear()
                    matched.update(saved_matched)
                    tv_cache.clear()
                    # pairs are probe-major at exclusive-cumsum offsets of
                    # the effective counts (expand_matches layout): prefix
                    # sums give each probe row's surviving-match count
                    eff = jnp.where(mask, cnt, 0).astype(jnp.int32)
                    ends32 = SC.cumsum(eff)
                    starts32 = ends32 - eff
                    pref = jnp.concatenate([
                        jnp.zeros(1, jnp.int32),
                        SC.cumsum(ok.astype(jnp.int32)),
                    ])
                    sv = pref[jnp.minimum(ends32, cap)] - \
                        pref[jnp.minimum(starts32, cap)]
                    exists = sv > 0
                else:
                    exists = cnt > 0
                    join_needed.append(jnp.asarray(0, jnp.int64))
                if jp.kind == "SEMI":
                    mask = mask & exists
                else:
                    # ANTI keeps rows with NO match; rows whose key is NULL
                    # never match, so they are kept (NOT EXISTS semantics)
                    mask = mask & ~exists
                trivial = False
                continue
            if jp.kind == "CROSS":
                lo = jnp.zeros(domain_size, jnp.int32)
                cnt = jnp.where(mask, nrows[bi], 0).astype(jnp.int32)
                rows_sorted = jax.lax.broadcasted_iota(jnp.int32, (pb,), 0)
                pidx, bidx, out_mask, m_new, needed = J.expand_matches(
                    lo, cnt, rows_sorted, mask, cap, False
                )
            elif getattr(jp, "geo", None) is not None:
                # grid-bucket spatial candidate join (exec/geo_join.py):
                # probe = its own cell, build rows register under
                # len(offsets) neighbor cells; the exact geo predicate is
                # re-checked in jp.residual over the expanded domain
                gs = jp.geo
                if gs.cell is not None:
                    cell = jnp.asarray(gs.cell, jnp.float64)
                else:
                    cell = aux[gs.bbox_key][2][0]
                if gs.kind == "poly_probe":
                    # probe side is the polygon: key = bbox min cell
                    rcp = domain_compiler(jp.probe_keys)
                    rid, ridv = rcp.compile(jp.probe_keys[0])
                    xmin_a, ymin_a, _ = aux[gs.bbox_key]
                    ridc = jnp.clip(
                        jnp.asarray(rid, jnp.int32), 0, xmin_a.shape[0] - 1
                    )
                    px, py = xmin_a[ridc], ymin_a[ridc]
                    pvalid = ~jnp.isnan(px)
                    if ridv is not None:
                        pvalid = pvalid & ridv
                else:
                    pcg = domain_compiler(jp.probe_keys)
                    px, pxv = pcg.compile(jp.probe_keys[0])
                    py, pyv = pcg.compile(jp.probe_keys[1])
                    pvalid = and_valid(pxv, pyv)
                pci, pcj = _cellify(px, py, cell)
                pkey = _pack_cells(pci, pcj)
                pvalid_m = mask if pvalid is None else (mask & pvalid)
                if gs.kind == "poly_build":
                    brow, browv = build_side_tv(jp.build_keys[0], bi)
                    xmin_a, ymin_a, _ = aux[gs.bbox_key]
                    bric = jnp.clip(
                        jnp.asarray(brow, jnp.int32), 0, xmin_a.shape[0] - 1
                    )
                    bx, by = xmin_a[bric], ymin_a[bric]
                    bvalid0 = ~jnp.isnan(bx)
                    if browv is not None:
                        bvalid0 = bvalid0 & browv
                else:
                    bx, bxv = build_side_tv(jp.build_keys[0], bi)
                    by, byv = build_side_tv(jp.build_keys[1], bi)
                    bvalid0 = and_valid(bxv, byv)
                bvalid0 = apply_build_filters(bi, bvalid0)
                bci, bcj = _cellify(bx, by, cell)
                reps = len(gs.offsets)
                bkeys = jnp.concatenate([
                    _pack_cells(bci + di, bcj + dj) for di, dj in gs.offsets
                ])
                indom = jax.lax.broadcasted_iota(jnp.int32, (pb,), 0) \
                    < nrows[bi]
                bok = indom if bvalid0 is None else (indom & bvalid0)
                build = J.build_sorted(
                    bkeys, jnp.tile(bok, reps),
                    jnp.asarray(reps * pb, jnp.int32),
                )
                # expanded payload index → original build row
                build = build._replace(rows_sorted=build.rows_sorted % pb)
                if getattr(jp, "hash_fallback", False) or \
                        _join_hash_slots(reps * pb) > _JOIN_HASH_MAX_SLOTS:
                    lo, cnt = J.probe_counts(build, pkey, pvalid_m)
                else:
                    table = J.build_hash_table(
                        build, _join_hash_slots(reps * pb)
                    )
                    join_hash_miss[li] = table.unresolved
                    lo, cnt = J.probe_counts_hash(table, pkey, pvalid_m)
                rows_by_slot = build.rows_sorted
                pidx, bidx, out_mask, m_new, needed = J.expand_matches(
                    lo, cnt, rows_by_slot, mask, cap, left_outer
                )
            else:
                # probe keys over the current domain
                pc = domain_compiler(jp.probe_keys)
                probe_tvs = [pc.compile(e) for e in jp.probe_keys]
                pkey, pvalid = pack_keys(probe_tvs, jp, is_build=False)
                pvalid_m = mask if pvalid is None else (mask & pvalid)
                # build keys over the build input
                build_tvs = [build_side_tv(e, bi) for e in jp.build_keys]
                if jp.translate is not None:
                    tbl = aux[jp.translate]
                    bval, bvalid = build_tvs[0]
                    safe = jnp.clip(bval, 0, tbl.shape[0] - 1)
                    tval = jnp.where(
                        (bval >= 0) & (bval < tbl.shape[0]), tbl[safe], -1
                    )
                    build_tvs = [(tval, bvalid)]
                bkey, bvalid = pack_keys(build_tvs, jp, is_build=True)
                bvalid = apply_build_filters(bi, bvalid)
                if jp.key_min is not None:
                    # dense-range positional build: probe = 2 gathers
                    # (reference PerfectJoinHashTable — no sort, no search)
                    pbuild = J.build_perfect(
                        bkey, bvalid, nrows[bi], jp.key_min, jp.key_range
                    )
                    if jp.unique_build:
                        # PK-FK fast path: slot → build_row composed on
                        # the build side; ONE per-row lookup pass total
                        bidx_u, cnt, matched_u = J.probe_perfect_unique(
                            pbuild, pkey, pvalid_m, jp.key_range, mask
                        )
                        join_dups[li] = cnt.max() > 1
                        join_needed.append(jnp.asarray(0, jnp.int64))
                        idx[bi] = bidx_u
                        if left_outer:
                            matched[bi] = matched_u
                        else:
                            mask = mask & matched_u
                            matched[bi] = None
                        trivial = False
                        tv_cache.clear()
                        if jp.residual:
                            rc = domain_compiler(jp.residual)
                            for r in jp.residual:
                                mask = mask & rc.compile_predicate(r)
                        continue
                    lo, cnt = J.probe_perfect(
                        pbuild, pkey, pvalid_m, jp.key_range
                    )
                    rows_by_slot = pbuild.payload
                elif getattr(jp, "hash_fallback", False) or \
                        _join_hash_slots(pb) > _JOIN_HASH_MAX_SLOTS:
                    build = J.build_sorted(bkey, bvalid, nrows[bi])
                    lo, cnt = J.probe_counts(build, pkey, pvalid_m)
                    rows_by_slot = build.rows_sorted
                else:
                    # sparse keys: open-addressing hash table over the
                    # sorted build (reference BaselineJoinHashTable);
                    # probing is O(rounds) gathers, not a binary search
                    build = J.build_sorted(bkey, bvalid, nrows[bi])
                    table = J.build_hash_table(
                        build, _join_hash_slots(build.keys_sorted.shape[0])
                    )
                    join_hash_miss[li] = table.unresolved
                    lo, cnt = J.probe_counts_hash(table, pkey, pvalid_m)
                    rows_by_slot = build.rows_sorted
                if jp.unique_build:
                    # PK-side join: ≤1 match per probe row → identity domain
                    # (runtime dup check falls back to expansion)
                    bidx_u, matched_u = J.probe_unique(
                        lo, cnt, rows_by_slot, mask
                    )
                    join_dups[li] = cnt.max() > 1
                    join_needed.append(jnp.asarray(0, jnp.int64))
                    idx[bi] = bidx_u
                    if left_outer:
                        matched[bi] = matched_u
                    else:
                        mask = mask & matched_u
                        matched[bi] = None
                    trivial = False
                    tv_cache.clear()
                    if jp.residual:
                        rc = domain_compiler(jp.residual)
                        for r in jp.residual:
                            mask = mask & rc.compile_predicate(r)
                    continue
                pidx, bidx, out_mask, m_new, needed = J.expand_matches(
                    lo, cnt, rows_by_slot, mask, cap,
                    left_outer and not left_resid
                )
            join_needed.append(needed)
            prev_idx = dict(idx)
            prev_matched = dict(matched)
            prev_mask = mask
            prev_domain = domain_size
            # remap existing domain state through pidx
            for i in list(idx.keys()):
                if idx[i] is None:
                    idx[i] = pidx
                else:
                    idx[i] = idx[i][pidx]
                if matched.get(i) is not None:
                    matched[i] = matched[i][pidx]
            idx[bi] = bidx
            matched[bi] = m_new if (left_outer and not left_resid) else None
            mask = out_mask
            domain_size = cap
            if jp.kind == "FULL":
                # append one slot per build row; valid = real, unmatched
                # build rows (probe-side fields NULL there) — reference has
                # no FULL OUTER; SQL semantics: inner ∪ left-null ∪ right-null
                bm = J.build_matched_flags(
                    lo, cnt, rows_by_slot, pvalid_m, pb
                )
                extra_iota = jax.lax.broadcasted_iota(jnp.int32, (pb,), 0)
                extra_valid = (extra_iota < nrows[bi]) & ~bm
                for i in list(idx.keys()):
                    if i == bi:
                        continue
                    idx[i] = jnp.concatenate(
                        [idx[i], jnp.zeros(pb, idx[i].dtype)]
                    )
                    pm = matched.get(i)
                    if pm is None:
                        pm = jnp.ones(cap, jnp.bool_)
                    matched[i] = jnp.concatenate(
                        [pm, jnp.zeros(pb, jnp.bool_)]
                    )
                idx[bi] = jnp.concatenate([idx[bi], extra_iota])
                matched[bi] = jnp.concatenate(
                    [matched[bi], jnp.ones(pb, jnp.bool_)]
                )
                mask = jnp.concatenate([mask, extra_valid])
                domain_size = cap + pb
            trivial = False
            tv_cache.clear()
            # residual conjuncts (INNER semantics)
            if jp.residual:
                rc = domain_compiler(jp.residual)
                for r in jp.residual:
                    mask = mask & rc.compile_predicate(r)
            if left_resid:
                # per-prev-domain-row surviving-match existence via prefix
                # sums over the expansion layout (probe-major, exclusive-
                # cumsum offsets of the effective counts)
                eff = jnp.where(prev_mask, cnt, 0).astype(jnp.int32)
                ends32 = SC.cumsum(eff)
                starts32 = ends32 - eff
                pref = jnp.concatenate([
                    jnp.zeros(1, jnp.int32),
                    SC.cumsum(mask.astype(jnp.int32)),
                ])
                sv = pref[jnp.minimum(ends32, cap)] - \
                    pref[jnp.minimum(starts32, cap)]
                extra_valid = prev_mask & (sv == 0)
                for i in list(idx.keys()):
                    if i == bi:
                        continue
                    pi = prev_idx.get(i)
                    if pi is None:
                        pi = jax.lax.broadcasted_iota(
                            jnp.int32, (prev_domain,), 0
                        )
                    idx[i] = jnp.concatenate([idx[i], pi])
                    pm = matched.get(i)
                    ppm = prev_matched.get(i)
                    if pm is not None or ppm is not None:
                        if pm is None:
                            pm = jnp.ones(cap, jnp.bool_)
                        if ppm is None:
                            ppm = jnp.ones(prev_domain, jnp.bool_)
                        matched[i] = jnp.concatenate([pm, ppm])
                idx[bi] = jnp.concatenate([
                    idx[bi], jnp.zeros(prev_domain, idx[bi].dtype)
                ])
                mb = matched.get(bi)
                if mb is None:
                    mb = jnp.ones(cap, jnp.bool_)
                matched[bi] = jnp.concatenate([
                    mb, jnp.zeros(prev_domain, jnp.bool_)
                ])
                mask = jnp.concatenate([mask, extra_valid])
                domain_size = cap + prev_domain
                tv_cache.clear()

        # ---- filter ----
        if filter_rest is not None:
            # split performed: only the residual conjuncts remain here
            if filter_rest:
                fc = domain_compiler(filter_rest)
                for c in filter_rest:
                    mask = mask & fc.compile_predicate(c)
                trivial = False
        elif node.filter_cond is not None:
            fc = domain_compiler([node.filter_cond])
            mask = mask & fc.compile_predicate(node.filter_cond)
            trivial = False

        def merge_masked_flags(tmp, m):
            # error flags raised by expressions only count for rows/groups
            # that actually survive to be evaluated (reference: row-wise
            # codegen guards expression eval behind the filter)
            for name, vec in tmp.items():
                v = vec & m
                if name in error_flags:
                    error_flags[name] = error_flags[name] | v
                else:
                    error_flags[name] = v

        out: Dict[str, object] = {}
        for li, needed in enumerate(join_needed):
            out[f"join_needed_{li}"] = needed
        for li, dup in join_dups.items():
            out[f"join_dup_{li}"] = dup
        for li, miss in join_hash_miss.items():
            out[f"join_hash_miss_{li}"] = miss

        if not is_agg:
            # ---- projection ----
            tc = domain_compiler(node.target_exprs)
            tflags = {}
            tc.error_flags = tflags
            outs = []
            for e, ti in zip(node.target_exprs, node.types):
                val, valid = tc.compile(e)
                val = jnp.broadcast_to(jnp.asarray(val, ti.np_dtype()), (domain_size,))
                if valid is not None and getattr(valid, "shape", ()) != (domain_size,):
                    valid = jnp.broadcast_to(valid, (domain_size,))
                outs.append(_sentinelize(val, valid, ti))
            merge_masked_flags(tflags, mask)
            if trivial:
                out["cols"] = tuple(outs)
                out["n_out"] = nrows[0].astype(jnp.int32)
            else:
                perm, kept = _compact_perm(mask)
                out["cols"] = tuple(o[perm] for o in outs)
                out["n_out"] = mask.sum().astype(jnp.int32)
        else:
            # ---- aggregation ----
            n_keys = len(node.group_exprs)
            kc = domain_compiler(node.group_exprs + list(node.aggs))
            aflags = {}
            kc.error_flags = aflags
            kc.distinct_force_sort = bool(
                getattr(plan, "distinct_force_sort", False)
            ) or not getattr(config, "enable_hash_groupby", False)
            if group_strategy[0] in ("perfect", "hash"):
                key_tvs = [kc.compile(g) for g in node.group_exprs]
                if group_strategy[0] == "perfect":
                    gid, num_slots = G.perfect_group_ids(
                        key_tvs, group_strategy[1], mask
                    )
                    hash_slot_keys = None
                else:
                    # sparse keys: multi-round hash slot claiming
                    # (reference GroupByBaselineHash open addressing)
                    packed = G.pack_group_keys(key_tvs, group_strategy[1])
                    gid, num_slots, unresolved, hash_slot_keys = (
                        G.hash_group_ids(packed, mask, group_cap)
                    )
                    out["hash_unresolved"] = unresolved
                slots = num_slots
                num_groups = jnp.asarray(num_slots, jnp.int32)
                # materialize keys per slot: all rows of a slot share the key
                # value, so MIN over the slot recovers it (needed because
                # bucketed keys aren't reconstructible from the slot index —
                # reference get_group_value_fast_with_original_key); rows with
                # a NULL key occupy their own slot, so per-slot key validity
                # is (count of valid-key rows) > 0
                if hash_slot_keys is not None:
                    # keys come straight from the claim tables — no
                    # segment-minmax scatters (int64 scatters are emulated
                    # and slow on TPU)
                    key_out_tvs = G.unpack_group_keys(
                        hash_slot_keys, group_strategy[1],
                        [g.type for g in node.group_exprs],
                    )
                else:
                    # positional key reconstruction: the perfect slot id is
                    # an arithmetic code of the key tuple, so slot → key is
                    # pure arithmetic (no data pass).  Only BUCKETED keys
                    # (DATE_TRUNC ranges — reference
                    # get_group_value_fast_with_original_key) need a
                    # min-scan to recover the original value; the NULL slot
                    # is a fixed coordinate either way.
                    key_out_tvs = []
                    rem = jax.lax.broadcasted_iota(jnp.int32, (slots,), 0)
                    coords = []
                    for (mn, extent, has_nulls, bucket) in reversed(
                            group_strategy[1]):
                        span = extent + (1 if has_nulls else 0)
                        coords.append(rem % span)
                        rem = rem // span
                    coords.reverse()
                    for (val, valid), gexpr, rng, coord in zip(
                            key_tvs, node.group_exprs, group_strategy[1],
                            coords):
                        mn, extent, has_nulls, bucket = rng
                        dt = gexpr.type.np_dtype()
                        if bucket > 1:
                            kbuf = G.segment_minmax(
                                gid, jnp.asarray(val, dt), mask, slots,
                                is_min=True
                            )
                        else:
                            kbuf = (coord.astype(jnp.int64) + mn).astype(dt)
                        vbuf = (coord < extent) if has_nulls else None
                        key_out_tvs.append((kbuf, vbuf))
            elif group_strategy[0] == "keyless":
                slots = 1
                gid = jnp.zeros(domain_size, jnp.int32)
                gid = jnp.where(mask, 0, 1)
                num_groups = jnp.asarray(1, jnp.int32)
                key_out_tvs = []
            elif group_strategy[0] == "radix":
                # radix-partition Pallas sparse group-by: dense slot id
                # (as for perfect hash) → in-VMEM partition + segmented
                # reduce kernel returning COMPACTED per-group records
                # (reference GroupByBaselineHash, GroupByRuntime.cpp:25)
                from heavydb_tpu.exec import radix_tier as RT
                from heavydb_tpu.kernels import radix_groupby as RGK

                slots = group_cap
                key_tvs = [kc.compile(g) for g in node.group_exprs]
                gid, num_slots = G.perfect_group_ids(
                    key_tvs, group_strategy[1], mask
                )
                lowered = [AGG.LoweredAgg(a) for a in node.aggs]
                specs = RT.plan_aggs(node.aggs)
                if specs is None:
                    raise RT.RadixUnsupported(
                        "aggregate set fell out of the stream budget")
                ops_t, arrs, jobs = RT.build_streams(
                    lowered, specs, kc, mask, domain_size
                )
                # non-TPU backends dispatch the numpy reference through
                # pure_callback (interpret-mode Pallas emulation compiles
                # for minutes inside an engine jit; the real kernel is
                # interpret-verified in tests/test_radix_groupby.py)
                rfn = RGK.sparse_groupby if G._on_tpu() \
                    else RGK.sparse_groupby_host
                gid_out, len_out, r_totals, num_groups, r_ovf = rfn(
                    gid, arrs, num_slots, ops_t, cap=slots,
                )
                out["radix_overflow"] = r_ovf
                radix_partials = RT.finalize_partials(
                    jobs, len_out, r_totals
                )
                # keys from the compacted slot ids: pure arithmetic
                # (bucketed ranges are excluded from this tier)
                key_out_tvs = []
                rem = gid_out
                coords = []
                for (mn, extent, has_nulls, bucket) in reversed(
                        group_strategy[1]):
                    span = extent + (1 if has_nulls else 0)
                    coords.append(rem % span)
                    rem = rem // span
                coords.reverse()
                for gexpr, rng, coord in zip(
                        node.group_exprs, group_strategy[1], coords):
                    mn, extent, has_nulls, bucket = rng
                    dt = gexpr.type.np_dtype()
                    kbuf = (coord.astype(jnp.int64) + mn).astype(dt)
                    vbuf = (coord < extent) if has_nulls else None
                    key_out_tvs.append((kbuf, vbuf))
            else:  # sort — aggregate over the SORTED row domain
                # Scatter-free: agg args ride the grouping sort as
                # payloads, per-group totals are prefix-sum diffs /
                # reverse segmented scans at group-start rows, and ONE
                # stable compaction sort materializes every per-group
                # array.  Multi-operand sorts are flat ~56-69ms at 20M
                # rows on v5e while each random gather/scatter costs
                # 150-230ms — the old tier paid one scatter-back plus
                # per-slot scatters and slot-domain compaction.
                slots = group_cap
                key_tvs = [kc.compile(g) for g in node.group_exprs]
                # pre-compile agg argument exprs → sort payloads
                seeds = {}
                for a in node.aggs:
                    for e in (a.arg, a.arg2):
                        if e is not None and E.collect_input_refs(e) \
                                and e.key() not in seeds:
                            seeds[e.key()] = kc.compile(e)
                payload_arrays = []
                payload_layout = []  # (expr_key, has_valid)
                for ekey, (val, valid) in seeds.items():
                    payload_arrays.append(val)
                    if valid is not None:
                        payload_arrays.append(valid)
                    payload_layout.append((ekey, valid is not None))
                (sgid, s_rows, s_domain, changed, num_groups,
                 sorted_keys, sorted_pl) = G.sort_group_rows(
                    key_tvs, mask, slots, payloads=payload_arrays,
                    # s_rows is only ever gathered by the _SortedCompiler
                    # for agg-arg exprs, all of which ride as payloads
                    need_rows=bool(payload_arrays),
                )
                agg_segs = G.SortedSegments(
                    changed, s_domain, num_groups, slots
                )
                agg_kc = _SortedCompiler(kc, s_rows)
                pi = 0
                for ekey, has_valid in payload_layout:
                    sval = sorted_pl[pi]
                    pi += 1
                    svalid = None
                    if has_valid:
                        svalid = sorted_pl[pi]
                        pi += 1
                    agg_kc._memo[ekey] = (sval, svalid)
                agg_gid, agg_mask = sgid, s_domain
                # keys at group-start rows, deferred through compaction
                key_out_tvs = []
                for (sv, svalid), gexpr in zip(sorted_keys,
                                               node.group_exprs):
                    kd = agg_segs.defer(sv)
                    vd = agg_segs.defer(svalid) \
                        if gexpr.type.nullable else None
                    key_out_tvs.append((kd, vd))
            out["num_groups"] = num_groups
            if group_strategy[0] not in ("sort", "radix"):
                agg_kc, agg_gid, agg_mask, agg_segs = kc, gid, mask, None

            # partial aggregation + finalize (per-slot presence counts
            # ride the same shared scan — a separate segment_count would
            # re-stream the whole table)
            if group_strategy[0] == "radix":
                # the kernel already produced compacted partials
                all_partials, present_counts = radix_partials, None
                agg_segs = None
            else:
                lowered = [AGG.LoweredAgg(a) for a in node.aggs]
                all_partials, present_counts = AGG.accumulate_all(
                    lowered, agg_kc, agg_gid, agg_mask, slots,
                    want_present=group_strategy[0] in ("perfect", "hash"),
                    segs=agg_segs,
                )
            if agg_segs is not None:
                # one compaction sort materializes every deferred
                # per-group array (keys + partials)
                agg_segs.flush()
                all_partials = [
                    {pk: agg_segs.resolve(pv) for pk, pv in p.items()}
                    for p in all_partials
                ]
                key_out_tvs = [
                    (agg_segs.resolve(a),
                     agg_segs.resolve(b) if b is not None else None)
                    for a, b in key_out_tvs
                ]
            merge_masked_flags(aflags, mask)
            agg_tvs = [
                la.finalize(p, aux) for la, p in zip(lowered, all_partials)
            ]

            # group presence
            if group_strategy[0] in ("perfect", "hash"):
                present = present_counts > 0
            elif group_strategy[0] == "keyless":
                present = jnp.ones(1, jnp.bool_)
            else:  # sort / radix: compacted, dense by construction
                present = (
                    jax.lax.broadcasted_iota(jnp.int32, (slots,), 0)
                    < jnp.minimum(num_groups, slots)
                )

            # group-domain compiler: fields = keys ++ agg results
            gcols = {}
            for i, tv in enumerate(key_out_tvs):
                gcols[i] = tv
            for j, tv in enumerate(agg_tvs):
                gcols[n_keys + j] = tv
            gflags = {}
            gcomp = ExprCompiler(gcols, aux, gflags, udfs)

            if node.having is not None:
                present = present & gcomp.compile_predicate(node.having)

            outs = []
            for e, ti in zip(node.target_exprs, node.types):
                val, valid = gcomp.compile(e)
                val = jnp.broadcast_to(jnp.asarray(val, ti.np_dtype()), (slots,))
                if valid is not None and getattr(valid, "shape", ()) != (slots,):
                    valid = jnp.broadcast_to(valid, (slots,))
                outs.append(_sentinelize(val, valid, ti))

            merge_masked_flags(gflags, present)
            if group_strategy[0] == "keyless":
                out["cols"] = tuple(outs)
                out["n_out"] = jnp.asarray(1, jnp.int32)
            elif group_strategy[0] in ("sort", "radix") \
                    and node.having is None:
                # sorted-segment / radix outputs are dense by
                # construction (groups 0..num_groups-1) — skip the
                # compaction scatter
                out["cols"] = tuple(outs)
                out["n_out"] = jnp.minimum(num_groups, slots)
            else:
                perm, _ = _compact_perm(present)
                out["cols"] = tuple(o[perm] for o in outs)
                out["n_out"] = present.sum().astype(jnp.int32)

        for name, flag in error_flags.items():
            out[f"err_{name}"] = jnp.any(flag)
        ck = ctrl_keys(out)
        if ck:
            out["ctrl_vec"] = jnp.stack(
                [jnp.asarray(out[k]).astype(jnp.int32) for k in ck]
            )
        return out

    return kernel, layout


class _SortedCompiler:
    """Row-domain ExprCompiler viewed through a sort permutation:
    expressions compile in ORIGINAL row order (error flags stay
    row-domain), results gather into the sorted row domain for
    sorted-segment aggregation (ops.groupby.SortedSegments)."""

    def __init__(self, base, s_rows):
        self._base = base
        self._rows = s_rows
        self._memo = {}
        self.aux = base.aux

    def __getattr__(self, name):
        return getattr(self._base, name)

    def _gather(self, a):
        if a is None:
            return None
        if getattr(a, "ndim", 0) == 0 or not hasattr(a, "shape"):
            return a
        if a.shape[0] != self._rows.shape[0]:
            return a
        return a[self._rows]

    def compile(self, e):
        key = e.key()
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        val, valid = self._base.compile(e)
        out = (self._gather(val), self._gather(valid))
        self._memo[key] = out
        return out

    def compile_predicate(self, e):
        val, valid = self.compile(e)
        val = val.astype(jnp.bool_) if hasattr(val, "astype") \
            else jnp.asarray(val, jnp.bool_)
        if valid is None:
            return val
        return val & valid


def _compact_perm(mask):
    """Stable permutation putting mask=True rows first — O(n) prefix-sum +
    scatter (no sort): out_position[i] = cumsum(mask)[i]-1 for kept rows."""
    n = mask.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    pos = SC.cumsum(mask.astype(jnp.int32)) - 1
    target = jnp.where(mask, pos, n)  # dropped rows scatter off the end
    perm = jnp.zeros(n + 1, jnp.int32).at[target].set(rows, mode="drop")[:n]
    return perm, None
