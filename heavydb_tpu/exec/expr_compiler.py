"""Expression compiler: typed expression tree → jnp ops.

The analogue of the reference's CodeGenerator family (QueryEngine/
ArithmeticIR.cpp, CompareIR.cpp, LogicalIR.cpp, CastIR.cpp, CaseIR.cpp,
DateTimeIR.cpp, StringOpsIR.cpp ...), except we emit JAX ops that XLA fuses
into the enclosing query kernel instead of LLVM IR.

Value representation: TV = (val, valid) where
  - val: jnp array (vector over the row domain) or scalar
  - valid: jnp bool array, or None meaning "all valid"
Null storage is in-band sentinels; `valid` is derived once per column and
fused by XLA.  Three-valued logic for AND/OR matches SQL (and the
reference's LogicalIR).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu import types as T
from heavydb_tpu.errors import NotSupported
from heavydb_tpu.plan import exprs as E

TV = Tuple[object, Optional[object]]  # (val, valid)


def np_dtype_for(ti: T.TypeInfo) -> np.dtype:
    return ti.np_dtype()


def and_valid(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b


class ExprCompiler:
    """Compiles expressions against a row-domain context.

    cols: field_idx -> (val, valid) — pre-derived column TVs
    aux:  aux-key -> traced array (dictionary predicate tables etc.)
    """

    def __init__(self, cols: Dict[int, TV], aux: Dict[tuple, object],
                 error_flags=None, udfs=None):
        self.cols = cols
        self.aux = aux
        # error flags: name -> traced bool scalar (div-by-zero etc.)
        self.error_flags = error_flags if error_flags is not None else {}
        # scalar UDF registry: NAME -> (fn, arg_types, ret_type)
        self.udfs = udfs or {}

    # ---- public ----
    def compile(self, e: E.Expr) -> TV:
        m = getattr(self, "_c_" + type(e).__name__, None)
        if m is None:
            raise NotSupported(f"cannot compile {type(e).__name__}")
        return m(e)

    def _c_SampleRatio(self, e: E.SampleRatio):
        # deterministic hash of the row's global physical position (the
        # scan's virtual rowid field) → uniform [0,1) < ratio (reference
        # RuntimeFunctions sample_ratio).  Using the rowid COLUMN (not a
        # domain iota) keeps the sample stable across fragment skipping,
        # wave streaming, and join expansion.
        pos, _ = self.compile(e.pos)
        h = jnp.asarray(pos, jnp.int64).astype(jnp.uint32)
        h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x45D9F3B)
        h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x45D9F3B)
        h = h ^ (h >> jnp.uint32(16))
        u = h.astype(jnp.float64) / jnp.float64(2**32)
        return u < e.ratio, None

    def compile_predicate(self, e: E.Expr):
        """Boolean expr → single bool mask (null → False), for filters."""
        val, valid = self.compile(e)
        val = val.astype(jnp.bool_) if hasattr(val, "astype") else jnp.asarray(val, jnp.bool_)
        if valid is None:
            return val
        return val & valid

    # ---- leaves ----
    def _c_InputRef(self, e: E.InputRef) -> TV:
        return self.cols[e.field_idx]

    def _c_Constant(self, e: E.Constant) -> TV:
        if e.value is None:
            # typed null: sentinel value, valid=False scalar
            dt = e.type.np_dtype() if not e.type.is_null_type else np.dtype(np.int32)
            return jnp.asarray(0, dt), jnp.asarray(False)
        dt = e.type.np_dtype()
        return jnp.asarray(e.value, dt), None

    def _c_ArrayFn(self, e: E.ArrayFn) -> TV:
        """Array ops: the column's device value is its global ROWID; aux
        carries (lengths, offsets, flat) or the precomputed ANY/ALL result
        (executor._array_aux).  Reference QueryEngine/ArrayIR.cpp."""
        if e.op == "UNNEST":
            raise NotSupported("UNNEST is only allowed in the SELECT list")
        rid, ridv = self.compile(e.rowid)
        aux = self.aux[e.key()]
        nmax = aux[0].shape[0]
        rid = jnp.asarray(rid, jnp.int32)
        ridc = jnp.clip(rid, 0, nmax - 1)
        okrid = rid >= 0
        if ridv is not None:
            okrid = okrid & ridv
        if e.op == "CARDINALITY":
            ln = aux[0][ridc]
            return ln, okrid & (ln >= 0)
        if e.op == "CONTAINS_SEG":
            # in-kernel even-odd ray cast against a POLYGON column's
            # segment CSR (executor._geo_aux CONTAINS_SEG) — evaluable
            # over ANY domain, so cross-table geo joins can use it as
            # the exact residual.  Crossing rule matches the host-side
            # point_in (executor._geo_aux) bit for bit.
            seg_off, seg_cnt, sx1, sy1, sx2, sy2, trip_arr = aux
            nmaxp = seg_cnt.shape[0]
            ridp = jnp.clip(rid, 0, nmaxp - 1)
            px, pxv = self.compile(e.args[0])
            py, pyv = self.compile(e.args[1])
            px = jnp.asarray(px, jnp.float64)
            py = jnp.asarray(py, jnp.float64)
            cnt = seg_cnt[ridp]
            off = seg_off[ridp]
            maxseg = trip_arr.shape[0]
            nseg = sx1.shape[0]

            def body(s, cross):
                j = jnp.clip(off + s, 0, nseg - 1)
                x1, y1 = sx1[j], sy1[j]
                x2, y2 = sx2[j], sy2[j]
                m = s < cnt
                cr = ((y1 > py) != (y2 > py)) & (
                    px < (x2 - x1) * (py - y1)
                    / jnp.where(y2 == y1, 1e-300, y2 - y1) + x1
                )
                return cross + (m & cr).astype(jnp.int32)

            cross0 = jnp.zeros_like(ridp, jnp.int32) \
                + jnp.zeros_like(px, jnp.int32) + jnp.zeros_like(py, jnp.int32)
            crossings = jax.lax.fori_loop(0, maxseg, body, cross0)
            inside = (crossings % 2) == 1
            ok = okrid & (cnt >= 0)
            ok = and_valid(ok, pxv)
            ok = and_valid(ok, pyv)
            return inside, ok
        if e.op in ("ANY", "ALL", "CONTAINS", "CONTAINS_LITPOLY",
                    "INTERSECTS_LIT", "ARR_EQ"):
            r = aux[0][ridc]
            return r == 1, okrid & (r != -1)
        if e.op in ("AREA", "PERIMETER", "XMIN", "XMAX", "YMIN", "YMAX",
                    "CENTROID_X", "CENTROID_Y"):
            v = aux[0][ridc]
            return v, okrid & ~jnp.isnan(v)
        if e.op in ("NPOINTS", "NRINGS"):
            v = aux[0][ridc]
            return v, okrid & (v >= 0)
        # SUBSCRIPT
        lengths, offsets, flat = aux
        k, kvalid = self.compile(e.args[0])
        k = jnp.asarray(k, jnp.int32)
        ln = lengths[ridc]
        off = offsets[ridc]
        pos = jnp.clip(off + k - 1, 0, flat.shape[0] - 1)
        v = flat[pos]
        ok = okrid & (k >= 1) & (k <= jnp.maximum(ln, 0))
        if kvalid is not None:
            ok = ok & kvalid
        if e.elem.nullable:
            if flat.dtype.kind == "f":
                ok = ok & ~jnp.isnan(v)
            else:
                ok = ok & (v != e.elem.null_sentinel())
        return v, ok

    # ---- operators ----
    def _c_BinOp(self, e: E.BinOp) -> TV:
        if e.op in E.LOGIC_OPS:
            return self._logic(e)
        lv, lvalid = self.compile(e.left)
        rv, rvalid = self.compile(e.right)
        valid = and_valid(lvalid, rvalid)
        op = e.op
        if op in E.COMPARISON_OPS:
            fn = {
                E.BinOpKind.EQ: jnp.equal,
                E.BinOpKind.NE: jnp.not_equal,
                E.BinOpKind.LT: jnp.less,
                E.BinOpKind.LE: jnp.less_equal,
                E.BinOpKind.GT: jnp.greater,
                E.BinOpKind.GE: jnp.greater_equal,
            }[op]
            return fn(lv, rv), valid
        # arithmetic
        out_dt = e.type.np_dtype()
        if op == E.BinOpKind.ADD:
            val = lv.astype(out_dt) + rv.astype(out_dt) if hasattr(lv, "astype") else lv + rv
            return jnp.asarray(val, out_dt), valid
        if op == E.BinOpKind.SUB:
            return (jnp.asarray(lv, out_dt) - jnp.asarray(rv, out_dt)), valid
        if op == E.BinOpKind.MUL:
            return (jnp.asarray(lv, out_dt) * jnp.asarray(rv, out_dt)), valid
        if op == E.BinOpKind.DIV:
            lvc = jnp.asarray(lv, out_dt)
            rvc = jnp.asarray(rv, out_dt)
            if e.type.is_integer or e.type.is_decimal:
                zero = rvc == 0
                self._flag_error("div_by_zero", zero, valid)
                safe = jnp.where(zero, jnp.asarray(1, out_dt), rvc)
                if e.type.is_decimal:
                    # decimal/decimal with same scale handled at binder (→double)
                    q = lvc // safe
                else:
                    # SQL integer division truncates toward zero
                    q = jnp.sign(lvc) * jnp.sign(safe) * (jnp.abs(lvc) // jnp.abs(safe))
                return q.astype(out_dt), valid
            zero = rvc == 0
            self._flag_error("div_by_zero", zero, valid)
            safe = jnp.where(zero, jnp.asarray(1, out_dt), rvc)
            return lvc / safe, valid
        if op == E.BinOpKind.MOD:
            lvc = jnp.asarray(lv, out_dt)
            rvc = jnp.asarray(rv, out_dt)
            zero = rvc == 0
            self._flag_error("div_by_zero", zero, valid)
            safe = jnp.where(zero, jnp.asarray(1, out_dt), rvc)
            # SQL MOD: sign follows dividend (C fmod), numpy's % follows divisor
            r = jnp.abs(lvc) % jnp.abs(safe)
            r = jnp.where(lvc < 0, -r, r) if out_dt.kind != "f" else jnp.sign(lvc) * (jnp.abs(lvc) % jnp.abs(safe))
            return r.astype(out_dt), valid
        raise NotSupported(f"binop {op}")

    def _flag_error(self, name: str, cond_vec, valid):
        # store the per-row VECTOR (kernels any() it at the end): CASE
        # branches can then mask out rows their condition doesn't select
        # (UPDATE t SET a = 1/b WHERE b <> 0 must not trip on b = 0)
        active = cond_vec if valid is None else (cond_vec & valid)
        if name in self.error_flags:
            self.error_flags[name] = self.error_flags[name] | active
        else:
            self.error_flags[name] = active

    def _compile_guarded(self, e, mask):
        """Compile a CASE branch; error flags it raises only count where
        `mask` (the branch's effective condition) holds."""
        outer = self.error_flags
        self.error_flags = {}
        try:
            val, valid = self.compile(e)
            for name, vec in self.error_flags.items():
                masked = vec & mask
                if name in outer:
                    outer[name] = outer[name] | masked
                else:
                    outer[name] = masked
        finally:
            self.error_flags = outer
        return val, valid

    def _logic(self, e: E.BinOp) -> TV:
        lv, lvalid = self.compile(e.left)
        rv, rvalid = self.compile(e.right)
        lv = jnp.asarray(lv, jnp.bool_)
        rv = jnp.asarray(rv, jnp.bool_)
        lval = lvalid if lvalid is not None else True
        rval = rvalid if rvalid is not None else True
        if e.op == E.BinOpKind.AND:
            val = lv & rv
            if lvalid is None and rvalid is None:
                return val, None
            # null AND false = false; null AND true = null
            valid = (lval & rval) | (lval & ~lv) | (rval & ~rv)
            return val & lval & rval, jnp.asarray(valid)
        else:
            val = lv | rv
            if lvalid is None and rvalid is None:
                return val, None
            valid = (lval & rval) | (lval & lv) | (rval & rv)
            # value when one side null: true if the valid side is true
            safe_l = lv & (lval if lvalid is not None else True)
            safe_r = rv & (rval if rvalid is not None else True)
            return safe_l | safe_r, jnp.asarray(valid)

    def _c_UnOp(self, e: E.UnOp) -> TV:
        val, valid = self.compile(e.operand)
        if e.op == E.UnOpKind.NOT:
            return ~jnp.asarray(val, jnp.bool_), valid
        if e.op == E.UnOpKind.NEG:
            return -jnp.asarray(val, e.type.np_dtype()), valid
        if e.op == E.UnOpKind.ISNULL:
            if valid is None:
                return jnp.zeros_like(jnp.asarray(val, jnp.bool_)) if hasattr(val, "shape") and val.shape else jnp.asarray(False), None
            return ~valid, None
        if e.op == E.UnOpKind.ISNOTNULL:
            if valid is None:
                shaped = hasattr(val, "shape") and val.shape
                return (jnp.ones(val.shape, jnp.bool_) if shaped else jnp.asarray(True)), None
            return valid, None
        raise NotSupported(f"unop {e.op}")

    def _c_Cast(self, e: E.Cast) -> TV:
        val, valid = self.compile(e.operand)
        src = e.operand.type
        dst = e.type
        return cast_value(val, src, dst), valid

    def _c_Case(self, e: E.Case) -> TV:
        out_dt = e.type.np_dtype()
        # effective per-branch conditions (first matching WHEN wins)
        conds = [ExprCompiler.compile_predicate(self, ce)
                 for ce, _ in e.whens]
        taken = None
        effs = []
        for c in conds:
            eff = c if taken is None else (c & ~taken)
            taken = c if taken is None else (taken | c)
            effs.append(eff)
        if e.else_ is not None:
            val, valid = self._compile_guarded(e.else_, ~taken)
            val = jnp.asarray(val, out_dt)
        else:
            val, valid = jnp.asarray(e.type.null_sentinel() if out_dt.kind != "f" else jnp.nan, out_dt), jnp.asarray(False)
        for (cond_e, res_e), c in zip(reversed(e.whens), reversed(effs)):
            rv, rvalid = self._compile_guarded(res_e, c)
            rv = jnp.asarray(rv, out_dt)
            val = jnp.where(c, rv, val)
            if rvalid is None and valid is None:
                valid = None
            else:
                rvv = rvalid if rvalid is not None else True
                vvv = valid if valid is not None else True
                valid = jnp.where(c, rvv, vvv)
        return val, valid

    def _c_InValues(self, e: E.InValues) -> TV:
        val, valid = self.compile(e.arg)
        vals = [v for v in e.values if v is not None]
        if not vals:
            res = jnp.zeros(val.shape, jnp.bool_) if hasattr(val, "shape") and val.shape else jnp.asarray(False)
        elif len(vals) <= 16:
            res = None
            for v in vals:
                c = val == jnp.asarray(v, val.dtype)
                res = c if res is None else (res | c)
        else:
            # membership via sorted search (reference InValuesBitmap analogue)
            table = jnp.asarray(np.sort(np.asarray(vals)), val.dtype)
            idx = jnp.searchsorted(table, val)
            idx = jnp.clip(idx, 0, table.shape[0] - 1)
            res = table[idx] == val
        if e.negated:
            res = ~res
        return res, valid

    def _c_DictStrPredicate(self, e: E.DictStrPredicate) -> TV:
        ids, valid = self.compile(e.arg)
        aux = self.aux[e.key()]
        if e.kind in ("LENGTH", "INTFN"):
            # aux: int value per dict id (LENGTH / POSITION / HASH / ...);
            # per-entry NULL results (e.g. HASH('') ) are stored as the
            # type's null sentinel
            n = aux.shape[0]
            safe = jnp.clip(ids, 0, max(n - 1, 0))
            out = aux[safe] if n else jnp.zeros_like(ids)
            if e.kind == "INTFN" and n:
                ok = out != jnp.asarray(e.type.null_sentinel(), aux.dtype)
                valid = and_valid(valid, ok)
            return out, valid
        if e.kind == "TRYCAST":
            n = aux.shape[0]
            safe = jnp.clip(ids, 0, max(n - 1, 0))
            out = aux[safe]
            if aux.dtype.kind == "f":
                ok = ~jnp.isnan(out)
            else:
                ok = out != jnp.asarray(e.type.null_sentinel(), aux.dtype)
            return out, and_valid(valid, ok & (ids >= 0))
        # aux: bool match-table per dict id
        n = aux.shape[0]
        if n == 0:
            res = jnp.zeros(ids.shape, jnp.bool_)
        else:
            safe = jnp.clip(ids, 0, n - 1)
            res = aux[safe]
            # ids beyond table (shouldn't happen) or negative (null) → False
            res = res & (ids >= 0) & (ids < n)
        if e.negated:
            res = ~res
        return res, valid

    def _c_StringTransform(self, e) -> TV:
        ids, valid = self.compile(e.arg)
        tbl = self.aux[e.key()]  # id → transformed-dict id (sentinel-safe)
        n = tbl.shape[0]
        safe = jnp.clip(ids, 0, max(n - 1, 0))
        out = jnp.where((ids >= 0) & (ids < n), tbl[safe],
                        jnp.asarray(np.iinfo(np.int32).min, jnp.int32))
        # ops may yield NULL (e.g. SPLIT_PART out of range): sentinel in table
        nullv = out != jnp.asarray(np.iinfo(np.int32).min, jnp.int32)
        valid = nullv if valid is None else (valid & nullv)
        return out, valid

    def _c_StringPairConcat(self, e) -> TV:
        idl, vl = self.compile(e.left)
        idr, vr = self.compile(e.right)
        tbl = self.aux[e.key()]  # (L, R) pair table → output dict ids
        nl, nr = tbl.shape
        sl = jnp.clip(idl, 0, nl - 1)
        sr = jnp.clip(idr, 0, nr - 1)
        sentinel = jnp.asarray(np.iinfo(np.int32).min, jnp.int32)
        ok = (idl >= 0) & (idl < nl) & (idr >= 0) & (idr < nr)
        out = jnp.where(ok, tbl[sl, sr], sentinel)
        valid = and_valid(and_valid(vl, vr), out != sentinel)
        return out, valid

    def _c_DictPairCompare(self, e) -> TV:
        idl, vl = self.compile(e.left)
        idr, vr = self.compile(e.right)
        rl_tbl, rr_tbl = self.aux[e.key()]  # id → merged rank (per side)
        sentinel = jnp.asarray(np.iinfo(np.int32).min, jnp.int32)
        rl = rl_tbl[jnp.clip(idl, 0, rl_tbl.shape[0] - 1)]
        rr = rr_tbl[jnp.clip(idr, 0, rr_tbl.shape[0] - 1)]
        ok = (idl >= 0) & (idr >= 0) & (rl != sentinel) & (rr != sentinel)
        res = {
            "<": rl < rr, "<=": rl <= rr, ">": rl > rr, ">=": rl >= rr,
            "=": rl == rr, "<>": rl != rr,
        }[e.op]
        return res, and_valid(and_valid(vl, vr), ok)

    def _c_Extract(self, e: E.Extract) -> TV:
        val, valid = self.compile(e.operand)
        ti = e.operand.type
        days, secs, frac = to_civil_parts(val, ti)
        out = extract_field(e.field_, days, secs, frac, ti)
        return out.astype(jnp.int64), valid

    def _c_DateTrunc(self, e: E.DateTrunc) -> TV:
        val, valid = self.compile(e.operand)
        ti = e.operand.type
        return date_trunc(e.field_, val, ti), valid

    def _c_FunctionOp(self, e: E.FunctionOp) -> TV:
        args = [self.compile(a) for a in e.args]
        valid = None
        for _, v in args:
            valid = and_valid(valid, v)
        vals = [a for a, _ in args]
        name = e.name
        out_dt = e.type.np_dtype()
        if name.startswith("UDF:"):
            fn, _, _ = self.udfs[name[4:]]
            res = fn(*vals)
            if isinstance(res, tuple):
                rval, rvalid = res
                return jnp.asarray(rval, out_dt), and_valid(valid, rvalid)
            return jnp.asarray(res, out_dt), valid
        # real-valued functions see decimals as their real value
        if name in ("SQRT", "EXP", "LN", "LOG", "LOG10", "SIN", "COS", "TAN",
                    "ASIN", "ACOS", "ATAN", "ATAN2", "DEGREES", "RADIANS",
                    "POWER", "POW", "WIDTH_BUCKET"):
            vals = [
                jnp.asarray(v, jnp.float64) / (10**a.type.scale)
                if a.type.is_decimal else v
                for v, a in zip(vals, e.args)
            ]
        if name.startswith("DATEADD_"):
            return dateadd(name[8:], vals[0], vals[1], e.args[0].type), valid
        if name.startswith("DATEDIFF_"):
            return datediff(name[9:], vals[0], vals[1], e.args[0].type, e.args[1].type), valid
        f1 = {
            "ABS": jnp.abs, "SIGN": jnp.sign, "SQRT": lambda x: jnp.sqrt(jnp.asarray(x, jnp.float64)),
            "EXP": lambda x: jnp.exp(jnp.asarray(x, jnp.float64)),
            "LN": lambda x: jnp.log(jnp.asarray(x, jnp.float64)),
            "LOG": lambda x: jnp.log(jnp.asarray(x, jnp.float64)),
            "LOG10": lambda x: jnp.log10(jnp.asarray(x, jnp.float64)),
            "SIN": lambda x: jnp.sin(jnp.asarray(x, jnp.float64)),
            "COS": lambda x: jnp.cos(jnp.asarray(x, jnp.float64)),
            "TAN": lambda x: jnp.tan(jnp.asarray(x, jnp.float64)),
            "ASIN": lambda x: jnp.arcsin(jnp.asarray(x, jnp.float64)),
            "ACOS": lambda x: jnp.arccos(jnp.asarray(x, jnp.float64)),
            "ATAN": lambda x: jnp.arctan(jnp.asarray(x, jnp.float64)),
            "DEGREES": lambda x: jnp.degrees(jnp.asarray(x, jnp.float64)),
            "RADIANS": lambda x: jnp.radians(jnp.asarray(x, jnp.float64)),
        }
        if name in f1:
            return jnp.asarray(f1[name](vals[0]), out_dt), valid
        if name in ("GREATEST", "LEAST"):
            # SQL n-ary max/min; NULL if any argument is NULL (valid is
            # already the AND of argument validities)
            fn = jnp.maximum if name == "GREATEST" else jnp.minimum
            acc = vals[0]
            for v in vals[1:]:
                acc = fn(acc, v)
            return jnp.asarray(acc, out_dt), valid
        if name in ("CEIL", "CEILING"):
            ti = e.args[0].type
            if ti.is_fp:
                return jnp.ceil(vals[0]), valid
            if ti.is_decimal:
                m = 10**ti.scale
                return -((-vals[0]) // m) * m, valid
            return vals[0], valid
        if name == "FLOOR":
            ti = e.args[0].type
            if ti.is_fp:
                return jnp.floor(vals[0]), valid
            if ti.is_decimal:
                m = 10**ti.scale
                return (vals[0] // m) * m, valid
            return vals[0], valid
        if name in ("ROUND", "TRUNCATE"):
            ti = e.args[0].type
            nd = vals[1] if len(vals) > 1 else 0
            if ti.is_fp:
                m = jnp.power(10.0, nd)
                if name == "ROUND":
                    return jnp.round(vals[0] * m) / m, valid
                return jnp.trunc(vals[0] * m) / m, valid
            if ti.is_decimal:
                # zero out digits below 10^(scale-nd), half-up for ROUND
                ndig = e.args[1].value if len(e.args) > 1 and isinstance(
                    e.args[1], E.Constant) else 0
                if isinstance(ndig, float):
                    ndig = int(ndig)
                shift = ti.scale - int(ndig)
                if shift <= 0:
                    return vals[0], valid
                m = 10**shift
                v = jnp.asarray(vals[0], jnp.int64)
                if name == "ROUND":
                    adj = jnp.where(v >= 0, m // 2, -(m // 2))
                    v = v + adj
                q = jnp.sign(v) * (jnp.abs(v) // m)
                return q * m, valid
            return vals[0], valid
        if name in ("POWER", "POW"):
            return jnp.power(jnp.asarray(vals[0], jnp.float64), jnp.asarray(vals[1], jnp.float64)), valid
        if name == "ATAN2":
            return jnp.arctan2(jnp.asarray(vals[0], jnp.float64), jnp.asarray(vals[1], jnp.float64)), valid
        if name == "MOD":
            # SQL MOD: sign follows dividend (unlike numpy's %)
            a = jnp.asarray(vals[0], out_dt)
            b = jnp.asarray(vals[1], out_dt)
            r = jnp.abs(a) % jnp.abs(b)
            return jnp.where(a < 0, -r, r).astype(out_dt), valid
        if name == "WIDTH_BUCKET":
            x, lo, hi, n = [jnp.asarray(v, jnp.float64) for v in vals]
            b = jnp.floor((x - lo) / (hi - lo) * n) + 1
            b = jnp.where(x < lo, 0, b)
            b = jnp.where(x >= hi, n + 1, b)
            return b.astype(jnp.int32), valid
        raise NotSupported(f"function {name}")

    def _c_Agg(self, e: E.Agg):
        raise NotSupported("aggregate outside Aggregate node")

    def _c_SubqueryExpr(self, e: E.SubqueryExpr):
        raise NotSupported("subquery must be substituted before compilation")


# ---------------------------------------------------------------------------
# Casts
# ---------------------------------------------------------------------------


def cast_value(val, src: T.TypeInfo, dst: T.TypeInfo):
    """Physical cast (reference CastIR.cpp codegenCast)."""
    out_dt = dst.np_dtype()
    if src.is_null_type:
        return jnp.asarray(val, out_dt)
    if src.is_decimal and dst.is_decimal:
        if src.scale == dst.scale:
            return jnp.asarray(val, out_dt)
        if dst.scale > src.scale:
            return jnp.asarray(val, jnp.int64) * (10 ** (dst.scale - src.scale))
        return jnp.asarray(val, jnp.int64) // (10 ** (src.scale - dst.scale))
    if src.is_decimal:
        if dst.is_fp:
            return jnp.asarray(val, out_dt) / (10**src.scale)
        if dst.is_integer or dst.is_boolean:
            return (jnp.asarray(val, jnp.int64) // (10**src.scale)).astype(out_dt)
    if dst.is_decimal:
        if src.is_fp:
            return jnp.round(jnp.asarray(val, jnp.float64) * (10**dst.scale)).astype(jnp.int64)
        return jnp.asarray(val, jnp.int64) * (10**dst.scale)
    if src.is_time or dst.is_time:
        return _cast_time(val, src, dst)
    if src.is_fp and (dst.is_integer or dst.is_boolean):
        # trunc toward zero (LLVM fptosi semantics, matches sqlite CAST)
        return jnp.trunc(val).astype(out_dt)
    if src.is_boolean and dst.is_fp:
        return jnp.asarray(val, out_dt)
    return jnp.asarray(val, out_dt)


def _cast_time(val, src: T.TypeInfo, dst: T.TypeInfo):
    K = T.SQLTypeKind
    out_dt = dst.np_dtype()
    if src.kind == K.DATE and dst.kind == K.TIMESTAMP:
        return (jnp.asarray(val, jnp.int64) * (86400 * 10**dst.precision)).astype(out_dt)
    if src.kind == K.TIMESTAMP and dst.kind == K.DATE:
        return jnp.floor_divide(jnp.asarray(val, jnp.int64), 86400 * 10**src.precision).astype(out_dt)
    if src.kind == K.TIMESTAMP and dst.kind == K.TIMESTAMP:
        if dst.precision >= src.precision:
            return jnp.asarray(val, jnp.int64) * (10 ** (dst.precision - src.precision))
        return jnp.floor_divide(jnp.asarray(val, jnp.int64), 10 ** (src.precision - dst.precision))
    if src.is_time and (dst.is_integer or dst.is_fp):
        return jnp.asarray(val, out_dt)
    if src.is_integer and dst.is_time:
        return jnp.asarray(val, out_dt)
    if src.kind == dst.kind:
        return jnp.asarray(val, out_dt)
    raise NotSupported(f"cast {src} → {dst}")


# ---------------------------------------------------------------------------
# Date/time decomposition — vectorized civil-calendar arithmetic
# (reference QueryEngine/ExtractFromTime.cpp / DateTruncate.cpp)
# Algorithm: Howard Hinnant's days↔civil (public domain), int-vectorized.
# ---------------------------------------------------------------------------


def to_civil_parts(val, ti: T.TypeInfo):
    """→ (days_since_epoch, seconds_of_day, fractional_units) as int64."""
    K = T.SQLTypeKind
    v = jnp.asarray(val, jnp.int64)
    if ti.kind == K.DATE:
        return v, jnp.zeros_like(v), jnp.zeros_like(v)
    if ti.kind == K.TIME:
        return jnp.zeros_like(v), v, jnp.zeros_like(v)
    mult = 10**ti.precision
    epoch_s = jnp.floor_divide(v, mult)
    frac = v - epoch_s * mult
    days = jnp.floor_divide(epoch_s, 86400)
    secs = epoch_s - days * 86400
    return days, secs, frac


def civil_from_days(days):
    """days since 1970-01-01 → (year, month, day) int64 arrays."""
    z = days + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097  # [0, 146096]
    yoe = jnp.floor_divide(doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524) - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y, m, d


def days_from_civil(y, m, d):
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = m + jnp.where(m > 2, -3, 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100) + doy
    return era * 146097 + doe - 719468


def extract_field(field_: E.ExtractField, days, secs, frac, ti: T.TypeInfo):
    F = E.ExtractField
    if field_ == F.EPOCH:
        return days * 86400 + secs
    if field_ == F.HOUR:
        return jnp.floor_divide(secs, 3600)
    if field_ == F.MINUTE:
        return jnp.floor_divide(secs % 3600, 60)
    if field_ == F.SECOND:
        return secs % 60
    if field_ == F.MILLISECOND:
        mult = 10**ti.precision
        ms = (frac * 1000) // mult if mult else jnp.zeros_like(frac)
        return (secs % 60) * 1000 + ms
    if field_ == F.DOW:
        # 0=Sunday..6=Saturday (HeavyDB ExtractFromTime.cpp:extract_dow is 0=Sun)
        return (days + 4) % 7
    if field_ == F.ISODOW:
        return ((days + 3) % 7) + 1
    y, m, d = civil_from_days(days)
    if field_ == F.YEAR:
        return y
    if field_ == F.MONTH:
        return m
    if field_ == F.DAY:
        return d
    if field_ == F.QUARTER:
        return jnp.floor_divide(m - 1, 3) + 1
    if field_ == F.DOY:
        jan1 = days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
        return days - jan1 + 1
    if field_ == F.WEEK:
        # ISO week number
        dow = ((days + 3) % 7)  # 0=Mon
        thursday = days - dow + 3
        ty, _, _ = civil_from_days(thursday)
        jan1 = days_from_civil(ty, jnp.ones_like(ty), jnp.ones_like(ty))
        return jnp.floor_divide(thursday - jan1, 7) + 1
    if field_ == F.DECADE:
        return jnp.floor_divide(y, 10)
    if field_ == F.CENTURY:
        return jnp.floor_divide(y + 99, 100)
    if field_ == F.MILLENNIUM:
        return jnp.floor_divide(y + 999, 1000)
    raise NotSupported(f"EXTRACT {field_}")


def date_trunc(field_: E.ExtractField, val, ti: T.TypeInfo):
    F = E.ExtractField
    K = T.SQLTypeKind
    days, secs, frac = to_civil_parts(val, ti)
    mult = 10**ti.precision if ti.kind == K.TIMESTAMP else 1

    def rebuild(days2, secs2):
        if ti.kind == K.DATE:
            return jnp.asarray(days2, jnp.int32)
        return (days2 * 86400 + secs2) * mult

    if field_ == F.SECOND:
        return rebuild(days, secs)
    if field_ == F.MINUTE:
        return rebuild(days, (secs // 60) * 60)
    if field_ == F.HOUR:
        return rebuild(days, (secs // 3600) * 3600)
    if field_ == F.DAY:
        return rebuild(days, jnp.zeros_like(secs))
    if field_ == F.WEEK:
        dow = (days + 3) % 7  # 0=Monday
        return rebuild(days - dow, jnp.zeros_like(secs))
    y, m, d = civil_from_days(days)
    one = jnp.ones_like(d)
    if field_ == F.MONTH:
        return rebuild(days_from_civil(y, m, one), jnp.zeros_like(secs))
    if field_ == F.QUARTER:
        qm = ((m - 1) // 3) * 3 + 1
        return rebuild(days_from_civil(y, qm, one), jnp.zeros_like(secs))
    if field_ == F.YEAR:
        return rebuild(days_from_civil(y, one, one), jnp.zeros_like(secs))
    if field_ == F.DECADE:
        return rebuild(days_from_civil((y // 10) * 10, one, one), jnp.zeros_like(secs))
    if field_ == F.CENTURY:
        return rebuild(days_from_civil(((y + 99) // 100) * 100 - 99, one, one), jnp.zeros_like(secs))
    if field_ == F.MILLENNIUM:
        return rebuild(days_from_civil(((y + 999) // 1000) * 1000 - 999, one, one), jnp.zeros_like(secs))
    raise NotSupported(f"DATE_TRUNC {field_}")


def dateadd(unit: str, ts, amount, ti: T.TypeInfo):
    """reference QueryEngine/DateAdd.cpp semantics."""
    K = T.SQLTypeKind
    amount = jnp.asarray(amount, jnp.int64)
    if ti.kind == K.DATE:
        days = jnp.asarray(ts, jnp.int64)
        secs = jnp.zeros_like(days)
        mult = 1
    else:
        days, secs, frac = to_civil_parts(ts, ti)
        mult = 10**ti.precision
    if unit in ("DAY", "WEEK"):
        k = 7 if unit == "WEEK" else 1
        days2, secs2 = days + k * amount, secs
    elif unit in ("HOUR", "MINUTE", "SECOND"):
        k = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1}[unit]
        total = days * 86400 + secs + k * amount
        days2 = jnp.floor_divide(total, 86400)
        secs2 = total - days2 * 86400
    elif unit in ("MONTH", "YEAR", "QUARTER"):
        y, m, d = civil_from_days(days)
        months = y * 12 + (m - 1) + amount * {"MONTH": 1, "QUARTER": 3, "YEAR": 12}[unit]
        y2 = jnp.floor_divide(months, 12)
        m2 = months - y2 * 12 + 1
        # clamp day to target month length
        next_m = days_from_civil(y2 + (m2 == 12), jnp.where(m2 == 12, 1, m2 + 1), jnp.ones_like(d))
        this_m = days_from_civil(y2, m2, jnp.ones_like(d))
        maxd = next_m - this_m
        d2 = jnp.minimum(d, maxd)
        days2, secs2 = days_from_civil(y2, m2, d2), secs
    else:
        raise NotSupported(f"DATEADD {unit}")
    if ti.kind == K.DATE:
        return jnp.asarray(days2, jnp.int32)
    frac0 = jnp.asarray(ts, jnp.int64) - (days * 86400 + secs) * mult
    return (days2 * 86400 + secs2) * mult + frac0


def datediff(unit: str, start, end, ti_a: T.TypeInfo, ti_b: T.TypeInfo):
    """DATEDIFF(unit, start, end) = end - start in units."""
    da, sa, _ = to_civil_parts(start, ti_a)
    db_, sb, _ = to_civil_parts(end, ti_b)
    if unit in ("DAY", "WEEK"):
        d = (db_ * 86400 + sb - da * 86400 - sa) // 86400
        return d // 7 if unit == "WEEK" else d
    if unit in ("HOUR", "MINUTE", "SECOND"):
        k = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1}[unit]
        return (db_ * 86400 + sb - da * 86400 - sa) // k
    ya, ma, _ = civil_from_days(da)
    yb, mb, _ = civil_from_days(db_)
    months = (yb * 12 + mb) - (ya * 12 + ma)
    if unit == "MONTH":
        return months
    if unit == "QUARTER":
        return months // 3
    if unit == "YEAR":
        return yb - ya
    raise NotSupported(f"DATEDIFF {unit}")
