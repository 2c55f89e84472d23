"""Window-node kernel: one jit'd program computing all window columns.

Reference: WindowFunctionContext (QueryEngine/WindowContext.cpp) — partition
hash + per-partition sort + segment-tree walks, CPU-only in the reference.
Here: one global lax.sort per distinct (partition_by, order_by) spec, then
segmented scans in sorted order (ops/window.py), scattered back to original
row order.  Device-native and O(n log n).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from heavydb_tpu import types as T
from heavydb_tpu.errors import NotSupported
from heavydb_tpu.exec.expr_compiler import ExprCompiler
from heavydb_tpu.ops import window as W
from heavydb_tpu.ops.groupby import _canonical_key
from heavydb_tpu.ops.sort import _sortable_operands
from heavydb_tpu.plan import exprs as E


def run_window(node, inp, aux, cache=None, rank_info=None, config=None):
    """ONE jit'd program PER (partition, order) spec — each program carries
    a single multi-operand lax.sort, so XLA never sees all specs' sorts
    fused into one giant kernel (round-1: a multi-spec 20M-row window
    program OOM'd the remote compile helper).  Specs execute sequentially.

    Returns (cols, wcols): the (possibly REORDERED) input columns and the
    window outputs, row-aligned with each other.  Egress modes (round 5 —
    measured at padded=2^25 on v5e: one random-permutation scatter costs
    237ms and a random gather 483ms, vs 81ms for a full 1-key lax.sort
    and ~10-15ms per extra sort payload operand):

    * "sorted" (single spec, few columns): the batch is EMITTED IN SORTED
      ORDER — input columns ride the spec sort as payload operands and
      window outputs need no reordering at all.  SQL row order is
      unspecified without an outer ORDER BY, so permuting the batch is
      legal; an outer Sort node re-sorts regardless.
    * "permsort" (multiple specs or wide batches): outputs return to the
      original row order via ONE lax.sort keyed by the permutation
      (s_rows) carrying every output as payload — replacing the former
      per-column scatters/inverse-perm gathers (reference analogue:
      ResultSetSortImpl.cu applies one permutation per sort, not one
      scatter per column).
    """
    padded = inp.padded
    present = [i for i, c in enumerate(inp.cols) if c is not None]
    wfuncs = node.wfuncs

    # group funcs by (partition, order) spec so each spec sorts once
    spec_groups: Dict[tuple, List[int]] = {}
    for i, w in enumerate(wfuncs):
        spec = (
            tuple(p.key() for p in w.partition_by),
            tuple((e.key(), a, nf) for e, a, nf in w.order_by),
        )
        spec_groups.setdefault(spec, []).append(i)

    mode = "sorted" if (len(spec_groups) == 1 and len(present) <= 12) \
        else "permsort"

    aux_keys = sorted(aux.keys(), key=repr)
    outs: List[jax.Array] = [None] * len(wfuncs)
    cols_out = list(inp.cols)
    for spec, widxs in spec_groups.items():
        ck = ("window", node.plan_key(), spec, tuple(widxs), padded, mode,
              tuple(present),
              tuple(str(inp.cols[i].dtype) for i in present),
              tuple(aux_keys))
        jitted = cache.get(ck) if cache is not None else None
        if jitted is None:
            # TWO programs per spec — sort stage and functions stage.
            # One fused program at 100M rows SIGSEGVs the remote compile
            # helper (the standalone pieces compile fine); the split also
            # caches the sort stage across retries.  Intermediates stay
            # on device between the two dispatches.
            # Window stages ride the plan-artifact cache like Compounds
            # (round-4 tried and reverted this; the failure mode — an
            # artifact whose exp.call compile key missed the persistent
            # executable cache — is fixed since _export_async compiles
            # the artifact-wrapped program before publishing).
            from heavydb_tpu.exec.executor import _ArtifactKernel

            jitted = (
                _ArtifactKernel.wrap(("winsort",) + ck, jax.jit(
                    _make_sort_kernel(
                        node, inp, padded, present, wfuncs, widxs, aux_keys,
                        rank_info or {}, mode,
                    )), config),
                _ArtifactKernel.wrap(("winfns",) + ck, jax.jit(
                    _make_fns_kernel(
                        node, inp, padded, present, wfuncs, widxs, aux_keys,
                        rank_info or {}, mode,
                    )), config),
            )
            if cache is not None:
                cache[ck] = jitted
        sort_jit, fns_jit = jitted
        nrows_dev = jnp.asarray(inp.nrows, jnp.int32)
        aux_vals = tuple(aux[k] for k in aux_keys)
        cols_in = [inp.cols[i] for i in present]
        from heavydb_tpu.exec.executor import _retry_remote_compile

        stage = _retry_remote_compile(sort_jit, nrows_dev, aux_vals,
                                      *cols_in)
        res = _retry_remote_compile(fns_jit, nrows_dev, aux_vals, stage,
                                    *cols_in)
        if mode == "sorted":
            sorted_cols, wres = res
            for ci, sc in zip(present, sorted_cols):
                cols_out[ci] = sc
        else:
            wres = res
        for wi, o in zip(widxs, wres):
            outs[wi] = o
    return cols_out, outs


def _pack_plan(node, w0, padded: int, rank_info=None):
    """Host-side plan to pack ALL (partition, order) sort keys into one
    bounded non-negative integer, using chunk-stat expression ranges
    (exec/ranges.py, the reference ExpressionRange analogue).  Shrinks the
    window sort from 2 operands per key to a 1-3 operand `lax.sort` —
    round-2 found the multi-operand variadic sort is both the compile-time
    cliff (100M-row window programs took >20min in remote compile) and the
    runtime cost.  Returns None when any key lacks a static range (floats,
    unbounded exprs) — the generic operand path still handles those."""
    from heavydb_tpu.exec import ranges as RG

    fields = []
    for p in w0.partition_by:
        r = RG.expr_range(p, node.inputs)
        if r is None or r.extent <= 0:
            return None
        fields.append({"expr": p, "order": False, "asc": True,
                       "nulls_first": True, "r": r})
    for e, asc, nf in w0.order_by:
        ri = (rank_info or {}).get(e.key())
        if ri is not None:
            # rank-translated dict-string key: values land in [0, dsize)
            ak, dsize = ri
            r = RG.IntRange(0, max(dsize - 1, 0), e.type.nullable)
            fields.append({"expr": e, "order": True, "asc": asc,
                           "nulls_first": nf, "r": r, "rank": ak})
            continue
        r = RG.expr_range(e, node.inputs)
        if r is None or r.extent <= 0:
            return None
        fields.append({"expr": e, "order": True, "asc": asc,
                       "nulls_first": nf, "r": r})
    order_bits = 0
    key_bits = 1  # in-domain flag rides the top bit
    for f in fields:
        r = f["r"]
        extent = int(r.extent)
        field_extent = extent + (1 if r.has_nulls else 0)
        bits = max(field_extent - 1, 0).bit_length()
        f["extent"] = extent
        f["bits"] = bits
        key_bits += bits
        if f["order"]:
            order_bits += bits
    if key_bits > 62:
        return None
    rows_bits = max((padded - 1).bit_length(), 1)
    fuse_rows = key_bits + rows_bits <= 62
    return {"fields": fields, "key_bits": key_bits, "order_bits": order_bits,
            "rows_bits": rows_bits, "fuse_rows": fuse_rows}


def _rank_translate(val, aux_dict, ak):
    """id → lexicographic rank via the shipped table (clipped gather; null
    sentinel ids land on an arbitrary rank, masked by valid downstream)."""
    tbl = aux_dict[ak]
    ids = jnp.clip(jnp.asarray(val, jnp.int32), 0, tbl.shape[0] - 1)
    return tbl[ids]


def _packed_sort(pack, comp, in_domain, padded, aux_dict, payload=()):
    """Build the packed key, sort it, and return (s_rows, pstart, ostart,
    sorted_payload) in sorted order.  Key layout (high→low bits):
    [~in_domain | partition fields | order fields | rows?].  pstart =
    change in the partition prefix; ostart = change in the whole
    (partition+order) key — every consumer in ops/window.py uses
    `pstart | ostart`, so folding partition changes into ostart is
    equivalent.

    `payload`: extra arrays carried through the sort as non-key operands.
    Measured at 100M rows (v5e): a payload operand costs ~200ms inside
    lax.sort vs ~1.2s for a random gather `val[s_rows]` afterwards — so
    window-function argument columns ride the sort instead of being
    gathered through the permutation."""
    acc = (~in_domain).astype(jnp.int64)
    for f in pack["fields"]:
        r = f["r"]
        extent = f["extent"]
        val, valid = comp.compile(f["expr"])
        if "rank" in f:
            val = _rank_translate(val, aux_dict, f["rank"])
        v = jnp.broadcast_to(jnp.asarray(val), (padded,)).astype(jnp.int64)
        bucket = max(r.bucket, 1)
        if f["order"] and not f["asc"]:
            base = (jnp.int64(r.hi) - v) // bucket
        else:
            base = (v - jnp.int64(r.lo)) // bucket
        # pad rows carry garbage values; clip so they can't overflow into
        # higher fields (they sort last via the domain flag regardless)
        base = jnp.clip(base, 0, extent - 1)
        if r.has_nulls:
            ok = valid if valid is not None else jnp.ones(padded, jnp.bool_)
            if f["order"] and not f["nulls_first"]:
                field = jnp.where(ok, base, jnp.int64(extent))
            else:
                field = jnp.where(ok, base + 1, jnp.int64(0))
        else:
            field = base
        acc = (acc << f["bits"]) | field
    rows = lax.broadcasted_iota(jnp.int32, (padded,), 0)
    rb = pack["rows_bits"]
    pay = list(payload)
    if pack["fuse_rows"]:
        acc = (acc << rb) | rows.astype(jnp.int64)
        if pack["key_bits"] + rb <= 31:
            res = lax.sort([acc.astype(jnp.int32)] + pay, num_keys=1)
            acc_s = res[0].astype(jnp.int64)
            spay = res[1:]
        else:
            hi = (acc >> 31).astype(jnp.int32)
            lo = (acc & ((1 << 31) - 1)).astype(jnp.int32)
            res = lax.sort([hi, lo] + pay, num_keys=2)
            acc_s = (res[0].astype(jnp.int64) << 31) | res[1].astype(jnp.int64)
            spay = res[2:]
        s_rows = (acc_s & ((1 << rb) - 1)).astype(jnp.int32)
        kwr = acc_s >> rb
    else:
        if pack["key_bits"] <= 31:
            res = lax.sort([acc.astype(jnp.int32), rows] + pay, num_keys=2)
            s_rows = res[1]
            kwr = res[0].astype(jnp.int64)
            spay = res[2:]
        else:
            hi = (acc >> 31).astype(jnp.int32)
            lo = (acc & ((1 << 31) - 1)).astype(jnp.int32)
            res = lax.sort([hi, lo, rows] + pay, num_keys=3)
            s_rows = res[2]
            kwr = (res[0].astype(jnp.int64) << 31) | res[1].astype(jnp.int64)
            spay = res[3:]
    one = jnp.ones(1, jnp.bool_)
    ostart = jnp.concatenate([one, kwr[1:] != kwr[:-1]])
    pk = kwr >> pack["order_bits"]
    pstart = jnp.concatenate([one, pk[1:] != pk[:-1]])
    return s_rows, pstart, ostart, spay


def _payload_plan(wfuncs, widxs):
    """Distinct non-constant first-arg expressions ride the sort as extra
    operands instead of being gathered through s_rows afterwards
    (measured 100M rows: ~200ms/operand in-sort vs ~1.2s per random
    gather, ~0.8s per scatter-back)."""
    payload_exprs: List[E.Expr] = []
    payload_map: Dict[tuple, int] = {}
    for wi in widxs:
        w = wfuncs[wi]
        if w.args and not isinstance(w.args[0], E.Constant) \
                and w.kind != E.WindowKind.NTILE:
            k = w.args[0].key()
            if k not in payload_map:
                payload_map[k] = len(payload_exprs)
                payload_exprs.append(w.args[0])
    return payload_exprs


def _col_compiler(inp, present, cols, aux_dict):
    from heavydb_tpu.exec.executor import _derive_valid

    col_tvs = {}
    for j, ci in enumerate(present):
        ti = inp.types[ci]
        val = cols[j]
        valid = _derive_valid(val, ti) if ti.nullable else None
        col_tvs[ci] = (val, valid)
    return ExprCompiler(col_tvs, aux_dict, {})


def _payload_ops(comp, payload_exprs, padded):
    """Payload TVs in ORIGINAL order → operand list for the sort."""
    pay_ops = []
    pay_slots = []  # (val_slot, valid_slot or None) per payload expr
    for e in payload_exprs:
        val, valid = comp.compile(e)
        val = jnp.broadcast_to(jnp.asarray(val), (padded,))
        vslot = len(pay_ops)
        pay_ops.append(val)
        if valid is not None and getattr(valid, "ndim", 0):
            pay_ops.append(valid.astype(jnp.int8))
            pay_slots.append((vslot, vslot + 1))
        else:
            pay_slots.append((vslot, None))
    return pay_ops, pay_slots


def _make_sort_kernel(node, inp, padded, present, wfuncs, widxs, aux_keys,
                      rank_info, mode="permsort"):
    """Stage 1 of a window spec: sort + boundary flags + sorted payloads.
    Split from the functions stage so neither program is large enough to
    crash the remote compile helper at 100M rows.

    mode "sorted": the payload is the PRESENT INPUT COLUMNS themselves —
    the batch will be emitted in sorted order, and window-arg exprs are
    recompiled over the sorted columns in stage 2 (elementwise, fused).
    mode "permsort": the payload is the distinct window-arg exprs (the
    input columns stay in original order)."""
    pack = _pack_plan(node, wfuncs[widxs[0]], padded, rank_info)
    payload_exprs = _payload_plan(wfuncs, widxs) if mode != "sorted" else []

    def kernel(nrows, aux_vals, *cols):
        aux_dict = dict(zip(aux_keys, aux_vals))
        in_domain = lax.broadcasted_iota(jnp.int32, (padded,), 0) < nrows
        comp = _col_compiler(inp, present, cols, aux_dict)
        if mode == "sorted":
            pay_ops = [jnp.broadcast_to(jnp.asarray(c), (padded,))
                       for c in cols]
        else:
            pay_ops, _pay_slots = _payload_ops(comp, payload_exprs, padded)

        w0 = wfuncs[widxs[0]]
        if pack is not None:
            s_rows, pstart, ostart, spay = _packed_sort(
                pack, comp, in_domain, padded, aux_dict, pay_ops)
        else:
            operands = [(~in_domain).astype(jnp.int8)]
            for p in w0.partition_by:
                val, valid = comp.compile(p)
                nullf, v = _canonical_key(jnp.asarray(val), valid)
                operands += [nullf, v]
            n_part_ops = len(operands)
            for e, asc, nf in w0.order_by:
                val, valid = comp.compile(e)
                ri = rank_info.get(e.key())
                if ri is not None:
                    val = _rank_translate(val, aux_dict, ri[0])
                nullr, v = _sortable_operands(val, valid, asc, nf)
                operands += [nullr, v]
            rows = lax.broadcasted_iota(jnp.int32, (padded,), 0)
            res = lax.sort(operands + [rows] + pay_ops,
                           num_keys=len(operands), is_stable=True)
            spay = res[len(operands) + 1:]
            s_rows = res[len(operands)]
            # partition starts: first row, any partition operand changed, or
            # the in-domain flag changed (out-of-domain pad rows must form
            # their own partition so they can't pollute running aggregates)
            pstart = jnp.zeros(padded, jnp.bool_).at[0].set(True)
            for opnd in res[0:n_part_ops]:
                pstart = pstart | jnp.concatenate(
                    [jnp.ones(1, jnp.bool_), opnd[1:] != opnd[:-1]]
                )
            # peer-group starts: any ORDER operand changed.  Slice ends
            # at len(operands): res also carries the rows iota and the
            # payload operands, and including the per-row iota here made
            # every row its own RANGE peer (over-split running aggs on
            # any non-packable sort with payloads)
            ostart = jnp.zeros(padded, jnp.bool_)
            for opnd in res[n_part_ops:len(operands)]:
                ostart = ostart | jnp.concatenate(
                    [jnp.ones(1, jnp.bool_), opnd[1:] != opnd[:-1]]
                )
        if mode == "sorted":
            # the permutation itself is never consumed — skip its
            # materialization (one full-array pass)
            s_rows = jnp.zeros((), jnp.int32)
        return (s_rows, pstart, ostart, tuple(spay))

    return kernel


def _finalize_sorted(w, val_s, valid_s, padded):
    """Apply null sentinel / dtype to one window output IN SORTED ORDER.
    Returns a list of narrow carrier arrays + a combiner tag:
      ("ds", h, l[, ok]) — double-single f64 sum halves, combine after
      ("i32->64",)        — never-null rank/count, widen after
      ("val",)            — final value, as-is
    Keeping carriers ≤ 4 bytes keeps the permutation sort (permsort
    mode) free of emulated-64-bit operands."""
    out_dt = w.type.np_dtype()
    if isinstance(val_s, W.DsPair):
        h = jnp.broadcast_to(val_s.h, (padded,))
        low = jnp.broadcast_to(val_s.l, (padded,))
        if valid_s is not None:
            return ("ds", out_dt), [h, low, valid_s.astype(jnp.int8)]
        return ("ds", out_dt), [h, low]
    val_s = jnp.asarray(val_s)
    if (valid_s is None and out_dt == np.int64
            and val_s.dtype == jnp.int32):
        return ("i32->64", out_dt), [jnp.broadcast_to(val_s, (padded,))]
    val_s = jnp.broadcast_to(val_s.astype(out_dt), (padded,))
    if valid_s is not None:
        if out_dt.kind == "f":
            val_s = jnp.where(valid_s, val_s, jnp.asarray(np.nan, out_dt))
        else:
            val_s = jnp.where(
                valid_s, val_s,
                jnp.asarray(w.type.null_sentinel(), out_dt),
            )
    return ("val", out_dt), [val_s]


def _combine_carriers(tag, arrs):
    kind, out_dt = tag
    if kind == "ds":
        out = arrs[0].astype(out_dt) + arrs[1].astype(out_dt)
        if len(arrs) == 3:
            out = jnp.where(arrs[2] == 1, out, jnp.asarray(np.nan, out_dt))
        return out
    if kind == "i32->64":
        return arrs[0].astype(out_dt)
    return arrs[0]


def _make_fns_kernel(node, inp, padded, present, wfuncs, widxs, aux_keys,
                     rank_info, mode="permsort"):
    """Stage 2 of a window spec: per-function computation over the sorted
    domain.  mode "sorted" returns (sorted input cols, window outputs)
    with NO reordering; mode "permsort" returns outputs in the original
    row order via ONE permutation lax.sort keyed by s_rows (a random
    scatter costs 237ms per column and a random gather 483ms at 2^25 on
    v5e; the whole permutation sort is 81ms + ~10-15ms per payload)."""
    payload_exprs = _payload_plan(wfuncs, widxs) if mode != "sorted" else []

    def kernel(nrows, aux_vals, stage, *cols):
        aux_dict = dict(zip(aux_keys, aux_vals))
        s_rows, pstart, ostart, spay = stage
        if mode == "sorted":
            # compile every expr over the SORTED columns — the sorted
            # domain IS the output domain, so no reorder anywhere
            comp = _col_compiler(inp, present, spay, aux_dict)
            pay_sorted = None
            dom_rows = None
        else:
            comp = _col_compiler(inp, present, cols, aux_dict)
            # recompute the payload SLOT layout (static) to bind sorted
            _pay_ops, pay_slots = _payload_ops(comp, payload_exprs, padded)
            pay_sorted = _bind_payload(payload_exprs, pay_slots, spay)
            dom_rows = s_rows

        tags = []
        carriers: List[jax.Array] = []
        spans = []
        for wi in widxs:
            w = wfuncs[wi]
            val_s, valid_s = _compute_one(w, comp, dom_rows, pstart, ostart,
                                          pay_sorted)
            tag, arrs = _finalize_sorted(w, val_s, valid_s, padded)
            tags.append(tag)
            spans.append((len(carriers), len(arrs)))
            carriers.extend(arrs)

        if mode == "sorted":
            outs = [
                _combine_carriers(tag, carriers[o:o + ln])
                for tag, (o, ln) in zip(tags, spans)
            ]
            return tuple(spay), tuple(outs)

        # permsort: ONE sort keyed by the (unique) permutation restores
        # original row order for every carrier at once
        res = lax.sort([s_rows] + carriers, num_keys=1)
        rcar = res[1:]
        outs = [
            _combine_carriers(tag, rcar[o:o + ln])
            for tag, (o, ln) in zip(tags, spans)
        ]
        return tuple(outs)

    return kernel


def _bind_payload(payload_exprs, pay_slots, spay):
    """Map expr key → (sorted val, sorted valid|None) from the sort's
    payload outputs.  A None valid slot means the original validity was
    None or a scalar — the consumer recomputes it (XLA CSEs the work)."""
    out = {}
    for e, (vs, js) in zip(payload_exprs, pay_slots):
        sval = spay[vs]
        svalid = spay[js].astype(jnp.bool_) if js is not None else None
        out[e.key()] = (sval, svalid, js is not None)
    return out


def _compute_one(w: E.WindowFunc, comp: ExprCompiler, s_rows, pstart, ostart,
                 pay_sorted=None):
    """Compute one window function in SORTED order."""
    K = E.WindowKind

    n_dom = pstart.shape[0]

    def arg_tv(i):
        ps = (pay_sorted or {}).get(w.args[i].key()) if w.args else None
        if ps is not None:
            sval, svalid, had_valid = ps
            if not had_valid:
                _, valid = comp.compile(w.args[i])
                if valid is not None and getattr(valid, "ndim", 0):
                    valid = valid[s_rows]
                svalid = valid
            return sval, svalid
        val, valid = comp.compile(w.args[i])
        val = jnp.asarray(val)
        if s_rows is None:
            # sorted mode: comp is built over the SORTED columns — the
            # compiled expr already lives in the window domain
            val = jnp.broadcast_to(val, (n_dom,))
            return val, valid
        # reorder to sorted order
        val = jnp.broadcast_to(val, (s_rows.shape[0],))[s_rows] if val.ndim \
            else jnp.broadcast_to(val, (s_rows.shape[0],))
        if valid is not None and getattr(valid, "ndim", 0):
            valid = valid[s_rows]
        return val, valid

    def const_arg(i, default):
        if len(w.args) > i and isinstance(w.args[i], E.Constant):
            v = w.args[i].value
            ti = w.args[i].type
            if ti.is_decimal:
                v = v / 10**ti.scale
            return int(v) if v is not None else default
        return default

    if w.kind == K.ROW_NUMBER:
        return W.row_number(pstart), None
    if w.kind == K.RANK:
        return W.rank(pstart, ostart), None
    if w.kind == K.DENSE_RANK:
        return W.dense_rank(pstart, ostart), None
    if w.kind == K.PERCENT_RANK:
        return W.percent_rank(pstart, ostart), None
    if w.kind == K.CUME_DIST:
        return W.cume_dist(pstart, ostart), None
    if w.kind == K.NTILE:
        n = const_arg(0, 1)
        return W.ntile(pstart, n), None
    if w.kind in (K.LAG, K.LEAD):
        val, valid = arg_tv(0)
        off = const_arg(1, 1)
        default_tv = None
        if len(w.args) > 2:
            dv, dvalid = comp.compile(w.args[2])
            if w.args[2].type.is_decimal:
                # decimals are scaled ints on device; the output column is
                # a plain float/int — rescale the default to match
                dv = jnp.asarray(dv, jnp.float64) / 10**w.args[2].type.scale
            default_tv = (dv, dvalid)
        if w.ignore_nulls:
            # k-th non-null strictly before (LAG) / after (LEAD) the row
            compact, base, c, ok = W.nonnull_lookup(val, valid, pstart)
            n = val.shape[0]
            if w.kind == K.LAG:
                ordinal = c - ok.astype(jnp.int32) - (off - 1)
            else:
                _, pe = W.segment_bounds(pstart)
                total = c[pe]
                ordinal = c + off
                ordinal = jnp.where(ordinal <= total, ordinal, 0)
            hit = ordinal >= 1
            idx = jnp.clip(base + ordinal - 1, 0, n - 1)
            out = compact[idx]
            outv = hit
            if default_tv is not None:
                dv, dvalid = default_tv
                out = jnp.where(hit, out, jnp.asarray(dv, out.dtype))
                dvv = jnp.asarray(True) if dvalid is None else dvalid
                outv = jnp.where(hit, outv, dvv)
            return out, outv
        if w.kind == K.LEAD:
            off = -off
        return W.shift_in_partition(val, valid, pstart, off, default_tv)
    if w.kind in (K.FIRST_VALUE, K.LAST_VALUE, K.NTH_VALUE):
        val, valid = arg_tv(0)
        n = val.shape[0]
        if w.ignore_nulls:
            compact, base, c, ok = W.nonnull_lookup(val, valid, pstart)
            if w.frame is not None:
                lo, hi = W.frame_bounds(pstart, ostart, w.frame)
            else:
                ps0, _ = W.segment_bounds(pstart)
                _, hi = W.segment_bounds(pstart | ostart)
                lo = ps0
            loc = jnp.clip(lo, 0, n - 1)
            hic = jnp.clip(hi, 0, n - 1)
            cb_lo = c[loc] - ok[loc].astype(jnp.int32)
            c_hi = c[hic]
            if w.kind == K.FIRST_VALUE:
                ordinal = cb_lo + 1
            elif w.kind == K.LAST_VALUE:
                ordinal = c_hi
            else:
                ordinal = cb_lo + const_arg(1, 1)
            hit = (ordinal >= cb_lo + 1) & (ordinal <= c_hi) & (lo <= hi)                 & (ordinal >= 1)
            idx = jnp.clip(base + ordinal - 1, 0, n - 1)
            return compact[idx], hit
        if w.frame is not None:
            lo, hi = W.frame_bounds(pstart, ostart, w.frame)
            if w.kind == K.FIRST_VALUE:
                pos = lo
            elif w.kind == K.LAST_VALUE:
                pos = hi
            else:
                pos = lo + (const_arg(1, 1) - 1)
            in_frame = (pos >= lo) & (pos <= hi)
            pos_c = jnp.clip(pos, 0, n - 1)
            out = val[pos_c]
            outv = (valid[pos_c] if valid is not None
                    else jnp.ones(n, jnp.bool_)) & in_frame
            return out, outv
        if w.kind == K.FIRST_VALUE:
            return W.first_value(val, valid, pstart)
        if w.kind == K.LAST_VALUE:
            return W.last_value_frame(val, valid, pstart, ostart)
        nth = const_arg(1, 1)
        idx = jnp.arange(n, dtype=jnp.int32)
        _, start_idx = W.forward_fill_value(idx, pstart)
        pos = start_idx + jnp.int32(nth - 1)
        cnt = W.partition_counts(pstart)
        ok = (nth >= 1) & ((nth - 1) < cnt)
        pos_c = jnp.clip(pos, 0, n - 1)
        out = val[pos_c]
        outv = (valid[pos_c] if valid is not None else jnp.ones_like(ok)) & ok
        return out, outv
    if w.kind in (K.SUM, K.AVG, K.MIN, K.MAX, K.COUNT):
        if w.args:
            val, valid = arg_tv(0)
            ati = w.args[0].type
        else:
            val = jnp.ones(pstart.shape[0], jnp.int64)
            valid = None
            ati = None
        kind = w.kind.value
        acc = w.type.np_dtype()
        if w.kind == K.AVG:
            acc = np.dtype(np.float64)
            if ati is not None and ati.is_decimal:
                val = jnp.asarray(val, jnp.float64) / 10**ati.scale
        if w.frame is not None:
            unit, b1, b2 = w.frame
            lo, hi = W.frame_bounds(pstart, ostart, w.frame)
            lo_unb, hi_unb = b1[0] == "UP", b2[0] == "UF"
            group_starts = None
            rows_w = None
            rows_offsets = None
            if not lo_unb and not hi_unb:
                if unit == "RANGE":
                    group_starts = pstart | ostart
                else:
                    lo_off = -b1[1] if b1[0] == "P" else (
                        b1[1] if b1[0] == "F" else 0)
                    hi_off = -b2[1] if b2[0] == "P" else (
                        b2[1] if b2[0] == "F" else 0)
                    rows_w = max(hi_off - lo_off + 1, 1)
                    rows_offsets = (int(lo_off), int(hi_off))
            return W.framed_agg(val, valid, pstart, lo, hi, kind, acc,
                                lo_unb, hi_unb, rows_w, group_starts,
                                rows_offsets=rows_offsets)
        if w.order_by:
            return W.running_agg(val, valid, pstart, ostart, kind, acc)
        return W.whole_partition_agg(val, valid, pstart, kind, acc)
    raise NotSupported(f"window function {w.kind}")
