"""Aggregate lowering: E.Agg → partial buffers + finalize + cross-shard merge.

The analogue of the reference's runtime aggregate functions
(QueryEngine/RuntimeFunctions.cpp agg_sum/agg_max/... with skip-val
semantics) plus the reduction layer (ResultSetReduction.cpp): each aggregate
lowers to one or more *partial* segment buffers (e.g. AVG = sum + count, the
reference's two-slot kAVG), a finalize step, and a merge rule so partials
combine across fragments/devices with jax collectives (psum etc.).

Null semantics match SQL/HeavyDB: aggregates skip NULL inputs; SUM/MIN/MAX/
AVG of zero valid rows is NULL; COUNT is never NULL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu import types as T
from heavydb_tpu.errors import NotSupported
from heavydb_tpu.plan import exprs as E
from heavydb_tpu.ops import groupby as G

TV = Tuple[object, Optional[object]]


@dataclass
class PartialSpec:
    name: str
    merge: str  # 'sum' | 'min' | 'max'


_BATCHABLE = None  # set below


def _keyless_fused(lowered, compiler, mask):
    """Keyless (single-slot) aggregation as ONE variadic lax.reduce.

    Sibling scalar reductions (count pass, sum pass, ...) each re-stream
    the scanned columns when XLA emits them as separate fusion loops —
    measured 1.4ms/iter for count+sum over 100M rows where the stream
    ceiling implies ~1.0ms.  A single multi-operand reduce is guaranteed
    one pass.  Returns partials (each value shaped [1]) or None when an
    aggregate kind can't ride (caller falls back)."""
    A = E.AggKind
    operands: list = []
    inits: list = []
    sinks: list = []  # (partials dict, key, post)
    partials: List[Optional[dict]] = [None] * len(lowered)
    for idx, la in enumerate(lowered):
        k = la.kind
        agg = la.agg
        if k not in (A.COUNT, A.COUNT_IF, A.SUM, A.SUM_IF, A.AVG,
                     A.STDDEV, A.VARIANCE) or agg.distinct or (
            agg.arg is not None and agg.arg.type.is_decimal
        ):
            return None
        arg_tv = compiler.compile(agg.arg) if agg.arg is not None else None
        cm = mask
        if arg_tv is not None and arg_tv[1] is not None:
            cm = arg_tv[1] if cm is None else (cm & arg_tv[1])
        if k in (A.COUNT_IF, A.SUM_IF):
            pred = compiler.compile_predicate(agg.arg2)
            cm = pred if cm is None else (cm & pred)
        if cm is None:
            if arg_tv is None:
                return None  # bare count(*) with no mask: nothing to fuse
            cm = jnp.ones(jnp.asarray(arg_tv[0]).shape, jnp.bool_)
        p: dict = {}
        partials[idx] = p
        operands.append(cm.astype(jnp.int32))
        inits.append(jnp.asarray(0, jnp.int32))
        sinks.append((p, "count", lambda x: x.astype(jnp.int64)[None]))
        if k in (A.COUNT, A.COUNT_IF):
            continue
        val = jnp.asarray(arg_tv[0])
        acc = np.dtype(np.float64) if k in (A.STDDEV, A.VARIANCE) \
            else np.dtype(la._acc_dtype())
        v = jnp.where(cm, val.astype(acc), jnp.asarray(0, acc))
        operands.append(v)
        inits.append(jnp.asarray(0, acc))
        sinks.append((p, "sum", lambda x: x[None]))
        if k in (A.STDDEV, A.VARIANCE):
            operands.append(v * v)
            inits.append(jnp.asarray(0, acc))
            sinks.append((p, "sumsq", lambda x: x[None]))
    if not operands:
        return None

    def comb(accs, xs):
        return tuple(a + x for a, x in zip(accs, xs))

    res = jax.lax.reduce(tuple(operands), tuple(inits), comb, (0,))
    for (p, key, post), r in zip(sinks, res):
        p[key] = post(r)
    return partials


def accumulate_all(lowered, compiler, gid, mask, num_slots: int,
                   want_present: bool = False, segs=None):
    """Partials for ALL aggregates of one group-by.  On the TPU mid-slot
    path, every count/sum-style partial becomes one value stream of a SINGLE
    shared-one-hot scan (separate scans would each re-stream the N×slots
    one-hot traffic).  Per-aggregate filters fold into the streams
    (count_i = Σ mask_i, sum_i = Σ value·mask_i), so one scan serves them
    all.  Other kinds fall back to per-aggregate accumulation.

    Returns (partials, present_counts): with want_present, the per-slot
    row count under the PLAIN mask also rides the shared scan (the kernel
    needs it for group presence — a separate segment_count would re-stream
    the whole table)."""
    from heavydb_tpu.ops.groupby import (
        RADIX_F32_MAX_SLOTS,
        RADIX_INT_MAX_SLOTS,
        SMALL_SLOTS,
        _on_tpu,
        _pallas_available,
        _shared_scan,
        shared_scan_bound,
    )

    A = E.AggKind
    # exact-int limb streams cap the XLA shared scan earlier than f32/count
    # streams (more int8 lhs lanes per slot — see groupby.py bounds); the
    # Pallas hist/lane kernels carry every stream class to their own bound
    bound = RADIX_F32_MAX_SLOTS
    for la in lowered:
        ag = la.agg
        if la.kind in (A.SUM, A.SUM_IF, A.AVG) and ag.arg is not None \
                and not ag.arg.type.is_decimal \
                and np.dtype(ag.arg.type.np_dtype()).kind in "iub":
            bound = RADIX_INT_MAX_SLOTS
    lo_slots = SMALL_SLOTS
    if _pallas_available():
        bound = max(bound, shared_scan_bound())
        # the lane kernel fuses every count/sum stream of a small group-by
        # into ONE pass — better than per-slot masked reductions
        lo_slots = 1
    if num_slots == 1 and not want_present:
        # keyless only: a 1-slot PERFECT group-by still needs presence
        # counts, which the fused reduce doesn't produce
        fused = _keyless_fused(lowered, compiler, mask)
        if fused is not None:
            return fused, None
    if segs is None:
        segs = G
    if not (_on_tpu() and lo_slots < num_slots <= bound):
        parts = [la.accumulate(compiler, gid, mask, num_slots, segs=segs)
                 for la in lowered]
        pres = None
        if want_present:
            # an unfiltered COUNT(*) partial counts exactly the masked
            # rows per slot — reuse it instead of a second full scatter
            for la, p in zip(lowered, parts):
                if la.kind == A.COUNT and la.agg.arg is None \
                        and isinstance(p, dict) and "count" in p:
                    pres = p["count"]
                    break
            if pres is None:
                pres = segs.segment_count(gid, mask, num_slots)
        return parts, pres

    n = gid.shape[0]
    base_mask = mask if mask is not None else jnp.ones(n, jnp.bool_)
    g32 = gid.astype(jnp.int32)
    streams = []  # (values f32, exact_f64_acc, bf16_ok)
    sinks = []    # (partials dict, key, post fn)
    limb_jobs = []  # (partials dict, acc dtype)
    partials: List[Optional[dict]] = [None] * len(lowered)

    for idx, la in enumerate(lowered):
        k = la.kind
        agg = la.agg
        if k not in (A.COUNT, A.COUNT_IF, A.SUM, A.SUM_IF, A.AVG,
                     A.STDDEV, A.VARIANCE) or agg.distinct or (
            agg.arg is not None and agg.arg.type.is_decimal
        ):
            # decimals keep their scaled-int scatter path (exact);
            # DISTINCT sums route through the sorted distinct machinery
            partials[idx] = la.accumulate(compiler, gid, mask, num_slots,
                                          segs=segs)
            continue
        arg_tv = compiler.compile(agg.arg) if agg.arg is not None else None
        cm = base_mask
        if arg_tv is not None and arg_tv[1] is not None:
            cm = cm & arg_tv[1]
        if k in (A.COUNT_IF, A.SUM_IF):
            cm = cm & compiler.compile_predicate(agg.arg2)
        p: dict = {}
        partials[idx] = p
        cmf = cm.astype(jnp.float32)
        # 0/1 streams ride the f32 dot exactly ("count" class) — no int8
        # pass needed for count-style partials
        streams.append((cmf, "count", False))
        sinks.append((p, "count", lambda x: x.astype(jnp.int64)))
        if k in (A.COUNT, A.COUNT_IF):
            continue
        val = jnp.asarray(arg_tv[0])
        vdt = np.dtype(val.dtype)
        acc = np.dtype(np.float64) if k in (A.STDDEV, A.VARIANCE) \
            else np.dtype(la._acc_dtype())
        if vdt.kind in "iub" and (acc.kind == "i" or k == A.AVG):
            # exact int sums: biased 8-bit limbs, masked, f64 accumulators
            # (4 limbs for ≤32-bit args, 8 for BIGINT — see _biased_limbs).
            # AVG over int args also sums exactly in int64 (two-slot kAVG
            # semantics); finalize divides in f64.
            nl = G._limb_count(vdt)
            for kk, lm in enumerate(G._biased_limbs(val, nl)):
                streams.append((lm * cmf, True, True))
                sinks.append((p, f"$limb{kk}", None))
            limb_jobs.append(
                (p, np.dtype(np.int64) if acc.kind == "f" else acc, nl)
            )
        else:
            fv = jnp.asarray(val, jnp.float64)
            if agg.arg.type.is_decimal:
                fv = fv / (10**agg.arg.type.scale)
            if acc == np.dtype(np.float64):
                # hi/lo f32 split keeps ~f32-relative error with exact f64
                # accumulation (full-f64 dots can't ride the MXU)
                hi = fv.astype(jnp.float32)
                lo = (fv - hi.astype(jnp.float64)).astype(jnp.float32)
                cmd = cm
                streams.append((jnp.where(cmd, hi, 0.0), True, False))
                sinks.append((p, "$hi", None))
                streams.append((jnp.where(cmd, lo, 0.0), True, False))
                sinks.append((p, "$lo", None))
                p["$split"] = acc
            else:
                fvv = jnp.where(cm, fv.astype(jnp.float32), 0.0)
                streams.append((fvv, False, False))
                sinks.append((p, "sum", lambda x, a=acc: x.astype(a)))
        if k in (A.STDDEV, A.VARIANCE):
            f32v = jnp.where(cm, jnp.asarray(val, jnp.float32), 0.0)
            streams.append((f32v * f32v, True, False))
            sinks.append((p, "sumsq", lambda x: x.astype(jnp.float64)))

    present = None
    if streams or want_present:
        res = _shared_scan(
            g32, base_mask, [s for s, _, _ in streams], num_slots,
            exact_accs=tuple(f for _, f, _ in streams),
            bf16_ok=tuple(b for _, _, b in streams),
        )
        if want_present:
            # counts under the plain mask — _onehot_scan's count output
            # uses exactly base_mask as the rhs validity
            present = res[0].astype(jnp.int64)
        for (p, key, post), r in zip(sinks, res[1:]):
            p[key] = post(r) if post is not None else r
        for p, acc, nl in limb_jobs:
            limbs = [p.pop(f"$limb{kk}") for kk in range(nl)]
            p["sum"] = G._limb_reconstruct(limbs, p["count"], nl, acc)
        for p in partials:
            if p is not None and "$split" in p:
                acc = p.pop("$split")
                p["sum"] = (p.pop("$hi") + p.pop("$lo")).astype(acc)
    return partials, present


class LoweredAgg:
    """One aggregate target, lowered."""

    def __init__(self, agg: E.Agg):
        self.agg = agg
        self.kind = agg.kind

    # -- specs --
    def partial_specs(self) -> List[PartialSpec]:
        k = self.kind
        A = E.AggKind
        if k in (A.COUNT, A.COUNT_IF, A.COUNT_DISTINCT):
            return [PartialSpec("count", "sum")]
        if k in (A.SUM, A.SUM_IF):
            return [PartialSpec("sum", "sum"), PartialSpec("count", "sum")]
        if k == A.AVG:
            return [PartialSpec("sum", "sum"), PartialSpec("count", "sum")]
        if k == A.MIN:
            return [PartialSpec("min", "min"), PartialSpec("count", "sum")]
        if k in (A.MAX, A.SAMPLE, A.SINGLE_VALUE, A.MODE):
            return [PartialSpec("max", "max"), PartialSpec("count", "sum")]
        if k in (A.STDDEV, A.VARIANCE):
            return [
                PartialSpec("sum", "sum"),
                PartialSpec("sumsq", "sum"),
                PartialSpec("count", "sum"),
            ]
        if k == A.APPROX_COUNT_DISTINCT:
            return [PartialSpec("hll", "max")]
        if k == A.APPROX_QUANTILE:
            return [PartialSpec("value", "max"), PartialSpec("count", "sum")]
        raise NotSupported(f"aggregate {k}")

    # -- accumulate over the row domain --
    def accumulate(self, compiler, gid, mask, num_slots: int,
                   segs=None) -> Dict[str, object]:
        """compiler: ExprCompiler over the input row domain.  `segs`
        swaps the segment-reduction implementations — None = the
        scatter/one-hot formulations in ops.groupby; a
        groupby.SortedSegments instance aggregates a SORTED row domain
        with prefix-sum diffs and segmented scans instead."""
        if segs is None:
            segs = G
        k = self.kind
        A = E.AggKind
        arg_tv = compiler.compile(self.agg.arg) if self.agg.arg is not None else None

        def contrib_mask(extra_valid=None):
            m = mask
            if extra_valid is not None:
                m = extra_valid if m is None else (m & extra_valid)
            return m

        if k == A.COUNT:
            cm = contrib_mask(arg_tv[1] if arg_tv is not None else None)
            if cm is None:
                n = gid.shape[0]
                cm = jnp.ones(n, jnp.bool_)
            return {"count": segs.segment_count(gid, cm, num_slots)}
        if k == A.COUNT_IF:
            cond = compiler.compile_predicate(self.agg.arg2)
            cm = contrib_mask(cond)
            return {"count": segs.segment_count(gid, cm, num_slots)}
        if k in (A.SUM, A.SUM_IF, A.AVG):
            val, valid = arg_tv
            cm = contrib_mask(valid)
            if k == A.SUM_IF:
                cond = compiler.compile_predicate(self.agg.arg2)
                cm = cond if cm is None else (cm & cond)
            acc_dt = self._acc_dtype()
            if self.agg.distinct:
                # SUM/AVG(DISTINCT x): reduce over distinct (group,
                # value) pairs (sorted formulation, exact)
                s, cnt = segs.distinct_sum_per_group(
                    gid, (val, None), cm, num_slots, acc_dt
                )
                return {"sum": s, "count": cnt}
            if cm is None:
                cm = jnp.ones(gid.shape[0], jnp.bool_)
            return {
                "sum": segs.segment_sum(gid, val, cm, num_slots, acc_dt),
                "count": segs.segment_count(gid, cm, num_slots),
            }
        if k in (A.MIN, A.MAX, A.SAMPLE, A.SINGLE_VALUE):
            val, valid = arg_tv
            cm = contrib_mask(valid)
            is_min = k == A.MIN
            name = "min" if is_min else "max"
            if cm is None:
                cm = jnp.ones(gid.shape[0], jnp.bool_)
            dref = self._dict_ref()
            if dref is not None and k in (A.MIN, A.MAX):
                # dict strings order by LEXICOGRAPHIC RANK, not id
                rank = compiler.aux[("dictrank", dref)]
                safe = jnp.clip(val, 0, rank.shape[0] - 1)
                val = jnp.where(val >= 0, rank[safe], 0).astype(jnp.int32)
            return {
                name: segs.segment_minmax(gid, jnp.asarray(val), cm, num_slots, is_min),
                "count": segs.segment_count(gid, cm, num_slots),
            }
        if k in (A.STDDEV, A.VARIANCE):
            val, valid = arg_tv
            cm = contrib_mask(valid)
            if cm is None:
                cm = jnp.ones(gid.shape[0], jnp.bool_)
            fval = jnp.asarray(val, jnp.float64)
            if self.agg.arg.type.is_decimal:
                fval = fval / (10**self.agg.arg.type.scale)
            return {
                "sum": segs.segment_sum(gid, fval, cm, num_slots, np.dtype(np.float64)),
                "sumsq": segs.segment_sum(gid, fval * fval, cm, num_slots, np.dtype(np.float64)),
                "count": segs.segment_count(gid, cm, num_slots),
            }
        if k == A.COUNT_DISTINCT:
            cnt, overflow = segs.distinct_count_per_group(
                gid, arg_tv, mask, num_slots,
                allow_hash=not getattr(compiler, "distinct_force_sort",
                                       False),
            )
            # claim-table overflow (astronomically rare at ≤50% fill ×
            # 6 rounds) → executor retries with the sorted formulation
            compiler._flag_error(
                "count_distinct_overflow", overflow > 0, None
            )
            return {"count": cnt}
        if k == A.APPROX_COUNT_DISTINCT:
            return {"hll": segs.hll_registers(gid, arg_tv, mask, num_slots)}
        if k == A.APPROX_QUANTILE:
            q = float(self.agg.arg2.value)
            val, cnt_valid = segs.quantile_per_group(gid, arg_tv, mask, num_slots, q)
            return {
                "value": val,
                "count": cnt_valid.astype(jnp.int64),
            }
        if k == A.MODE:
            val, has = segs.mode_per_group(gid, arg_tv, mask, num_slots)
            return {"max": val, "count": has.astype(jnp.int64)}
        raise NotSupported(f"aggregate {k}")

    def _acc_dtype(self):
        t = self.agg.type
        return t.np_dtype()

    def _dict_ref(self):
        if self.agg.arg is not None and self.agg.arg.type.is_dict_string:
            return getattr(self.agg.arg, "dict_ref", None)
        return None

    # -- finalize: partials → (values, valid) --
    def finalize(self, partials: Dict[str, object], aux=None) -> TV:
        k = self.kind
        A = E.AggKind
        dref = self._dict_ref()
        if dref is not None and k in (A.MIN, A.MAX) and aux is not None:
            # rank → id
            order = aux[("dictorder", dref)]
            name = "min" if k == A.MIN else "max"
            rank = partials[name]
            safe = jnp.clip(rank, 0, order.shape[0] - 1)
            ids = jnp.where(
                (rank >= 0) & (rank < order.shape[0]), order[safe], 0
            ).astype(jnp.int32)
            return ids, partials["count"] > 0
        if k in (A.COUNT, A.COUNT_IF, A.COUNT_DISTINCT):
            return partials["count"], None
        if k in (A.SUM, A.SUM_IF):
            return partials["sum"], partials["count"] > 0
        if k == A.AVG:
            cnt = jnp.maximum(partials["count"], 1)
            s = partials["sum"]
            if self.agg.arg.type.is_decimal:
                s = jnp.asarray(s, jnp.float64) / (10**self.agg.arg.type.scale)
            return jnp.asarray(s, jnp.float64) / cnt, partials["count"] > 0
        if k == A.MIN:
            return partials["min"], partials["count"] > 0
        if k in (A.MAX, A.SAMPLE, A.SINGLE_VALUE, A.MODE):
            return partials["max"], partials["count"] > 0
        if k in (A.STDDEV, A.VARIANCE):
            n = jnp.maximum(partials["count"], 2).astype(jnp.float64)
            mean = partials["sum"] / jnp.maximum(partials["count"], 1)
            var = (partials["sumsq"] - partials["sum"] * mean) / (n - 1)
            var = jnp.maximum(var, 0.0)
            out = jnp.sqrt(var) if k == A.STDDEV else var
            return out, partials["count"] > 1
        if k == A.APPROX_COUNT_DISTINCT:
            return G.hll_estimate(partials["hll"]), None
        if k == A.APPROX_QUANTILE:
            return partials["value"], partials["count"] > 0
        raise NotSupported(f"aggregate {k}")

    def merge_partials(self, a: Dict[str, object], b: Dict[str, object]):
        """Combine partials from two shards (reference
        ResultSetReduction.cpp reduceOneSlot semantics)."""
        out = {}
        for spec in self.partial_specs():
            x, y = a[spec.name], b[spec.name]
            if spec.merge == "sum":
                out[spec.name] = x + y
            elif spec.merge == "min":
                out[spec.name] = jnp.minimum(x, y)
            else:
                out[spec.name] = jnp.maximum(x, y)
        return out
