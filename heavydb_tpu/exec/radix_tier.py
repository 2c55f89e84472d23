"""Engine routing for the radix-partition Pallas sparse group-by
(kernels/radix_groupby) — the TPU-native counterpart of the reference's
baseline-hash group-by (QueryEngine/GroupByRuntime.cpp:25
get_group_value, MurmurHash open addressing + per-slot aggregate
atomics).

The kernel aggregates rows by a dense int32 slot id and returns the
COMPACTED per-group records in hash order.  This module is the glue:

- `eligible()` — static feasibility at plan time: every aggregate of
  the node must map onto the kernel's stream vocabulary within its
  MAX_STREAMS bitonic-payload budget (the VMEM bound of the in-tile
  sort, kernels/tile_sort.py).
- `build_streams()` — at trace time, compile each aggregate's argument
  into kernel streams ('sumf' / 'sumds' pair / 16-bit int limbs /
  'min' / 'max' / validity counts) with SQL skip-NULL semantics.
- `finalize_partials()` — map kernel outputs back to the standard
  partials dicts consumed by ops.agg.LoweredAgg.finalize (two-slot
  AVG, count>0 validity, exact int reconstruction).

Exactness contract (matches ops/agg.py's shared-scan path):
- counts ride int32 segment ladders (exact, n < 2^31);
- int/decimal sums use 16-bit limbs of the sign-flipped value — exact
  while every group has <= radix_groupby.MAX_SEG_INT rows, flagged
  otherwise (executor falls back to the sort tier);
- f64 accumulators use double-single f32 pairs (~2^-48 relative);
- f32 accumulators use plain f32 segment sums.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu.kernels import radix_groupby as RG
from heavydb_tpu.plan import exprs as E


class RadixUnsupported(Exception):
    """Raised at trace time when the compiled aggregate shape diverges
    from the static plan (e.g. unexpected argument nullability); the
    executor reroutes the query to the sort tier."""


def _agg_spec(agg: E.Agg) -> Optional[dict]:
    """Stream recipe for one aggregate, or None if it can't ride the
    radix kernel.  Stream accounting must match build_streams exactly."""
    A = E.AggKind
    k = agg.kind
    if agg.distinct:
        return None
    if k in (A.COUNT, A.COUNT_IF):
        needs_cm = k == A.COUNT_IF or (
            agg.arg is not None and agg.arg.type.nullable
        )
        return {"cls": "count", "needs_cm": needs_cm,
                "n_streams": 1 if needs_cm else 0}
    if agg.arg is None:
        return None
    vdt = np.dtype(agg.arg.type.np_dtype())
    nullable = bool(agg.arg.type.nullable)
    if k in (A.SUM, A.SUM_IF, A.AVG):
        needs_cm = nullable or k == A.SUM_IF
        acc = np.dtype(agg.type.np_dtype())
        if vdt.kind in "iub" and (acc.kind == "i" or k == A.AVG):
            nl = 2 if vdt.itemsize <= 4 else 4
            return {"cls": "sumint", "needs_cm": needs_cm, "nl": nl,
                    "n_streams": nl + (1 if needs_cm else 0)}
        if acc == np.dtype(np.float64):
            return {"cls": "sumds", "needs_cm": needs_cm,
                    "n_streams": 2 + (1 if needs_cm else 0)}
        if acc.kind == "f":
            return {"cls": "sumf", "needs_cm": needs_cm,
                    "n_streams": 1 + (1 if needs_cm else 0)}
        return None
    if k in (A.STDDEV, A.VARIANCE):
        needs_cm = nullable
        return {"cls": "std", "needs_cm": needs_cm,
                "n_streams": 4 + (1 if needs_cm else 0)}
    if k in (A.MIN, A.MAX, A.SAMPLE, A.SINGLE_VALUE):
        if k in (A.MIN, A.MAX) and agg.arg.type.is_dict_string:
            return None  # ordering needs the rank/aux tables
        if vdt.itemsize > 4 or vdt.kind not in "iubf":
            return None
        needs_cm = nullable
        return {"cls": "minmax", "is_min": k == A.MIN,
                "needs_cm": needs_cm,
                "n_streams": 1 + (1 if needs_cm else 0)}
    return None


def plan_aggs(aggs) -> Optional[List[dict]]:
    specs = []
    total = 0
    for a in aggs:
        s = _agg_spec(a)
        if s is None:
            return None
        total += s["n_streams"]
        specs.append(s)
    if total > RG.MAX_STREAMS:
        return None
    return specs


def eligible(node, ranges, slots: int, cfg, pallas_ok) -> bool:
    """Static plan-time check: can this Compound's group-by run on the
    radix tier?"""
    if not getattr(cfg, "enable_radix_groupby", True):
        return False
    if not (pallas_ok or getattr(cfg, "force_radix_groupby", False)):
        return False
    if slots >= (1 << 31):
        return False
    # bucketed keys (DATE_TRUNC ranges) aren't reconstructible from the
    # slot index without a min-stream; keep them on the sort tier
    if any(r.bucket > 1 for r in ranges):
        return False
    return plan_aggs(node.aggs) is not None


def build_streams(lowered, specs, compiler, base_mask, domain_size: int):
    """Compile aggregate arguments into kernel streams.

    Returns (ops tuple, stream arrays, jobs) where jobs drive
    finalize_partials.  Raises RadixUnsupported if the compiled shape
    needs a validity stream the static plan didn't budget."""
    A = E.AggKind
    ops: List[str] = []
    arrs: List[object] = []
    jobs: List[dict] = []
    ones = None

    def base():
        nonlocal ones
        if base_mask is not None:
            return base_mask
        if ones is None:
            ones = jnp.ones(domain_size, jnp.bool_)
        return ones

    for la, spec in zip(lowered, specs):
        agg = la.agg
        k = la.kind
        arg_tv = compiler.compile(agg.arg) if agg.arg is not None else None
        cm = base()
        distinct_valid = False
        if arg_tv is not None and arg_tv[1] is not None:
            cm = cm & arg_tv[1]
            distinct_valid = True
        if k in (A.COUNT_IF, A.SUM_IF):
            cm = cm & compiler.compile_predicate(agg.arg2)
            distinct_valid = True
        if distinct_valid and not spec["needs_cm"]:
            # the static plan assumed cm == row mask; diverging here
            # would break the stream budget — reroute to the sort tier
            raise RadixUnsupported(
                f"unplanned validity for {k}: type said non-nullable")
        job = {"cls": spec["cls"], "la": la}
        if spec["needs_cm"]:
            job["cm_idx"] = len(arrs)
            ops.append("sumi32")
            arrs.append(cm.astype(jnp.int32))
        cls = spec["cls"]
        if cls == "count":
            jobs.append(job)
            continue
        val = jnp.asarray(arg_tv[0])
        if cls == "sumf":
            v = jnp.where(cm, val.astype(jnp.float32), 0.0)
            job["s_idx"] = len(arrs)
            ops.append("sumf")
            arrs.append(v)
            job["acc"] = np.dtype(la._acc_dtype())
        elif cls == "sumds":
            # (decimal sums always take the exact sumint path — their
            # accumulator is the scaled int64)
            fv = jnp.asarray(val, jnp.float64)
            hi = fv.astype(jnp.float32)
            lo = (fv - hi.astype(jnp.float64)).astype(jnp.float32)
            job["s_idx"] = len(arrs)
            ops.extend(["sumds_hi", "sumds_lo"])
            arrs.append(jnp.where(cm, hi, 0.0))
            arrs.append(jnp.where(cm, lo, 0.0))
            job["acc"] = np.dtype(la._acc_dtype())
        elif cls == "sumint":
            nl = spec["nl"]
            job["nl"] = nl
            job["s_idx"] = len(arrs)
            job["acc"] = np.dtype(la._acc_dtype())
            if job["acc"].kind == "f":  # AVG over ints: exact int64 sum
                job["acc"] = np.dtype(np.int64)
            # 16-bit limbs of the sign-flipped value; masked rows
            # contribute all-zero limbs and are excluded from the bias
            # count, so sums reconstruct exactly from (limbs, valid)
            if nl == 2:
                u = (val.astype(jnp.int64)
                     + (np.int64(1) << 31)).astype(jnp.uint32)
                limbs = [
                    (u & jnp.uint32(0xFFFF)).astype(jnp.int32),
                    (u >> jnp.uint32(16)).astype(jnp.int32),
                ]
            else:
                from heavydb_tpu.ops.f64bits import i64_to_u64

                u = i64_to_u64(val) ^ (jnp.uint64(1) << jnp.uint64(63))
                limbs = [
                    ((u >> jnp.uint64(16 * i)) & jnp.uint64(0xFFFF))
                    .astype(jnp.int32)
                    for i in range(4)
                ]
            for lm in limbs:
                ops.append("sumi32_limb")
                arrs.append(jnp.where(cm, lm, 0))
        elif cls == "std":
            fv = jnp.asarray(val, jnp.float64)
            if agg.arg.type.is_decimal:
                fv = fv / (10 ** agg.arg.type.scale)
            job["s_idx"] = len(arrs)
            for stream in (fv, fv * fv):
                hi = stream.astype(jnp.float32)
                lo = (stream - hi.astype(jnp.float64)).astype(jnp.float32)
                ops.extend(["sumds_hi", "sumds_lo"])
                arrs.append(jnp.where(cm, hi, 0.0))
                arrs.append(jnp.where(cm, lo, 0.0))
        else:  # minmax
            is_min = spec["is_min"]
            job["is_min"] = is_min
            dt = np.dtype(val.dtype)
            if dt.kind == "f":
                ident = jnp.asarray(
                    np.inf if is_min else -np.inf, jnp.float32)
                v = jnp.where(cm, val.astype(jnp.float32), ident)
            else:
                info = np.iinfo(dt.name)
                ident = jnp.asarray(
                    info.max if is_min else info.min, jnp.int32)
                # widen sub-4-byte ints: (8,128) DMA chunks are tiled for
                # 4-byte elements
                v = jnp.where(cm, val.astype(jnp.int32), ident)
            job["out_dt"] = dt
            job["s_idx"] = len(arrs)
            ops.append("min" if is_min else "max")
            arrs.append(v)
        jobs.append(job)
    return tuple(ops), arrs, jobs


def finalize_partials(jobs, len_out, totals) -> List[dict]:
    """Kernel outputs → standard partials dicts (ops.agg contract)."""
    partials: List[dict] = []
    len64 = len_out.astype(jnp.int64)
    for job in jobs:
        cls = job["cls"]
        cnt = totals[job["cm_idx"]].astype(jnp.int64) \
            if "cm_idx" in job else len64
        p = {"count": cnt}
        if cls == "count":
            pass
        elif cls == "sumf":
            p["sum"] = totals[job["s_idx"]].astype(job["acc"])
        elif cls == "sumds":
            s = job["s_idx"]
            total = (totals[s].astype(jnp.float64)
                     + totals[s + 1].astype(jnp.float64))
            p["sum"] = total.astype(job["acc"])
        elif cls == "sumint":
            s, nl = job["s_idx"], job["nl"]
            if nl == 2:
                tot = (totals[s].astype(jnp.int64)
                       + (totals[s + 1].astype(jnp.int64) << 16)
                       - cnt * (np.int64(1) << 31))
            else:
                t = jnp.zeros(len_out.shape, jnp.uint64)
                for i in range(4):
                    t = t + (totals[s + i].astype(jnp.uint64)
                             << jnp.uint64(16 * i))
                t = t - cnt.astype(jnp.uint64) * (
                    jnp.uint64(1) << jnp.uint64(63))
                from heavydb_tpu.ops.f64bits import u64_to_i64

                tot = u64_to_i64(t)
            p["sum"] = tot.astype(job["acc"])
        elif cls == "std":
            s = job["s_idx"]
            p["sum"] = (totals[s].astype(jnp.float64)
                        + totals[s + 1].astype(jnp.float64))
            p["sumsq"] = (totals[s + 2].astype(jnp.float64)
                          + totals[s + 3].astype(jnp.float64))
        else:  # minmax ("max" also serves SAMPLE/SINGLE_VALUE finalize)
            v = totals[job["s_idx"]].astype(job["out_dt"])
            p["min" if job["is_min"] else "max"] = v
        partials.append(p)
    return partials
