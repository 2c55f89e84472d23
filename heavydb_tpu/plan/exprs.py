"""Typed expression tree — the analogue of the reference's Analyzer AST
(Analyzer/Analyzer.h:67-3394): the binder lowers parser AST into these typed
nodes; the expression compiler (exec/expr_compiler.py) lowers them to
JAX/jnp ops (where the reference emits LLVM IR via QueryEngine/*IR.cpp).

Conventions:
- InputRef(input_idx, field_idx) references field `field_idx` of relational
  input `input_idx` (0 = left/probe side, 1+ = join build sides), playing the
  role of the reference's RexInput/Analyzer::ColumnVar with rte_idx.
- Constants hold PHYSICAL values (dict ids for strings, scaled ints for
  decimals, epoch ints for dates) — conversion happens at bind time.
- DictStrPredicate defers host-side dictionary scans (LIKE/compare over
  dictionary entries) to kernel-launch time; the compiled kernel consumes a
  boolean id→match lookup table, mirroring HeavyDB's dictionary translation
  strategy (StringDictionary/StringDictionaryProxy.h:39).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from heavydb_tpu import types as T


class Expr:
    type: T.TypeInfo

    def children(self) -> Sequence["Expr"]:
        return ()

    def key(self) -> tuple:
        """Structural identity for plan-cache keys and common-subexpr checks."""
        return (type(self).__name__,) + tuple(
            c.key() if isinstance(c, Expr) else c for c in self._key_parts()
        )

    def _key_parts(self) -> tuple:
        return tuple(self.children())

    def match_key(self) -> tuple:
        """Like key(), but transient output-dictionary ids are erased:
        two independent binds of the same string expression (each
        registering its own transient dict) compare equal.  Used for
        GROUP BY ↔ SELECT-list expression matching."""
        return _strip_transients(self.key())


def _strip_transients(k):
    if isinstance(k, tuple):
        if len(k) == 2 and k[0] == "$transient" and isinstance(k[1], int):
            return ("$transient",)
        return tuple(_strip_transients(x) for x in k)
    return k


@dataclass(frozen=True)
class SampleRatio(Expr):
    """SAMPLE_RATIO(f): deterministic per-row sampling predicate
    (reference Analyzer::SampleRatioExpr / RuntimeFunctions
    sample_ratio) — splitmix-style hash of the row's GLOBAL physical
    position (`pos` = the table's virtual rowid field) compared against
    the ratio, so results are stable under fragment skipping, wave
    streaming, and join expansion."""

    ratio: float = 0.0
    pos: "Expr" = None  # InputRef to the scan's hidden rowid field
    type: T.TypeInfo = None

    def children(self):
        return (self.pos,) if self.pos is not None else ()

    def _key_parts(self):
        return (self.ratio,) + tuple(self.children())


@dataclass(frozen=True)
class InputRef(Expr):
    input_idx: int
    field_idx: int
    type: T.TypeInfo = None
    # dictionary identity for dict-encoded string fields: (table_id, col_id)
    dict_ref: Optional[tuple] = None

    def _key_parts(self):
        # a geo transform chain (dict_ref[2], builder._with_geo_step)
        # makes the ref a DIFFERENT expression than the raw column
        if self.dict_ref is not None and len(self.dict_ref) > 2:
            return (self.input_idx, self.field_idx, self.dict_ref[2])
        return (self.input_idx, self.field_idx)

    def __repr__(self):
        return f"${self.input_idx}.{self.field_idx}"


@dataclass(frozen=True)
class Constant(Expr):
    value: object  # physical value; None = NULL
    type: T.TypeInfo = None
    # set for string literals lifted into a transient dictionary
    dict_ref: Optional[tuple] = None

    def _key_parts(self):
        return (self.value, self.type.kind if self.type else None,
                self.dict_ref)

    @property
    def is_null(self):
        return self.value is None

    def __repr__(self):
        return f"lit({self.value})"


class BinOpKind(enum.Enum):
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"
    MOD = "%"
    EQ = "="
    NE = "<>"
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="
    AND = "AND"
    OR = "OR"


COMPARISON_OPS = {
    BinOpKind.EQ,
    BinOpKind.NE,
    BinOpKind.LT,
    BinOpKind.LE,
    BinOpKind.GT,
    BinOpKind.GE,
}
ARITH_OPS = {BinOpKind.ADD, BinOpKind.SUB, BinOpKind.MUL, BinOpKind.DIV, BinOpKind.MOD}
LOGIC_OPS = {BinOpKind.AND, BinOpKind.OR}


@dataclass(frozen=True)
class BinOp(Expr):
    op: BinOpKind
    left: Expr = None
    right: Expr = None
    type: T.TypeInfo = None

    def children(self):
        return (self.left, self.right)

    def _key_parts(self):
        return (self.op.value, self.left, self.right)

    def __repr__(self):
        return f"({self.left} {self.op.value} {self.right})"


class UnOpKind(enum.Enum):
    NOT = "NOT"
    NEG = "-"
    ISNULL = "IS NULL"
    ISNOTNULL = "IS NOT NULL"


@dataclass(frozen=True)
class UnOp(Expr):
    op: UnOpKind
    operand: Expr = None
    type: T.TypeInfo = None

    def children(self):
        return (self.operand,)

    def _key_parts(self):
        return (self.op.value, self.operand)


@dataclass(frozen=True)
class Cast(Expr):
    operand: Expr = None
    type: T.TypeInfo = None

    def children(self):
        return (self.operand,)

    def _key_parts(self):
        return (self.operand, self.type.kind, self.type.precision, self.type.scale)


@dataclass(frozen=True)
class Case(Expr):
    whens: Tuple[Tuple[Expr, Expr], ...] = ()
    else_: Optional[Expr] = None
    type: T.TypeInfo = None
    # set when the CASE yields dict-encoded strings (shared or transient dict)
    dict_ref: Optional[tuple] = None

    def children(self):
        out = []
        for c, r in self.whens:
            out += [c, r]
        if self.else_ is not None:
            out.append(self.else_)
        return tuple(out)


@dataclass(frozen=True)
class InValues(Expr):
    """arg IN (const, const, ...) — device-evaluated membership.  For small
    lists this compiles to OR-chains; for large lists / dict-id sets the
    compiler builds a lookup table (reference InValuesBitmap)."""

    arg: Expr = None
    values: Tuple[object, ...] = ()  # physical constants, may include None
    negated: bool = False
    type: T.TypeInfo = None

    def children(self):
        return (self.arg,)

    def _key_parts(self):
        return (self.arg, self.values, self.negated)


@dataclass(frozen=True)
class DictStrPredicate(Expr):
    """String predicate over a dict-encoded column, evaluated host-side over
    dictionary entries at launch time → boolean id lookup table on device."""

    arg: Expr = None  # dict-encoded int32 ids
    kind: str = "LIKE"  # LIKE | ILIKE | REGEXP | CMP
    pattern: str = ""
    escape: Optional[str] = None
    cmp_op: str = "="  # for kind == CMP
    negated: bool = False
    dict_ref: tuple = None  # (table_id, col_id) — resolved by the executor
    type: T.TypeInfo = None

    def children(self):
        return (self.arg,)

    def _key_parts(self):
        return (self.arg, self.kind, self.pattern, self.escape, self.cmp_op,
                self.negated, self.dict_ref)


@dataclass(frozen=True)
class StringTransform(Expr):
    """String function chain over a dict-encoded column, evaluated host-side
    over the dictionary entries at launch time → id→id translation array
    into a transient output dictionary.  The reference's StringOps kernels
    applied as dict-to-dict translation maps (StringOps/StringOps.h +
    StringDictionaryTranslationMgr)."""

    arg: Expr = None  # dict-encoded input
    # chain of (op_name, (args...)), applied left to right
    ops: Tuple[tuple, ...] = ()
    src_dict_ref: tuple = None
    dict_ref: tuple = None  # output transient dict
    type: T.TypeInfo = None

    def children(self):
        return (self.arg,)

    def _key_parts(self):
        return (self.arg, self.ops, self.src_dict_ref, self.dict_ref)


@dataclass(frozen=True)
class StringPairConcat(Expr):
    """left || right where BOTH sides are dict-encoded columns (each with
    an optional transform chain).  The translation table is PAIRWISE: at
    launch time the dense |L|x|R| cross product of the two source
    dictionaries is concatenated and interned into a transient output
    dictionary; the kernel indexes it by l*R + r — one gather, no string
    work on device.  Bounded by config.pair_concat_max_entries.
    Reference: two-variable StringOps evaluated per row via
    StringDictionaryProxy transients (QueryEngine/StringOpsIR.cpp)."""

    left: Expr = None
    right: Expr = None
    left_ops: Tuple[tuple, ...] = ()   # chains applied to each side's
    right_ops: Tuple[tuple, ...] = ()  # dictionary entries at build time
    left_ref: tuple = None             # source dict refs
    right_ref: tuple = None
    dict_ref: tuple = None             # output transient dict
    type: T.TypeInfo = None

    def children(self):
        return (self.left, self.right)

    def _key_parts(self):
        return (self.left, self.right, self.left_ops, self.right_ops,
                self.left_ref, self.right_ref, self.dict_ref)


@dataclass(frozen=True)
class DictPairCompare(Expr):
    """Ordering comparison between two dict-encoded string columns
    (possibly each under a transform chain).  At launch the UNION of the
    two dictionaries' (transformed) entries is sorted once; each side
    gets an id→merged-rank table (equal strings share a rank), so the
    kernel compares two int gathers — no string work on device.
    Reference: StringOps comparisons lowered over proxies
    (QueryEngine/StringOpsIR.cpp)."""

    left: Expr = None
    right: Expr = None
    op: str = "<"          # <, <=, >, >=, =, <>
    left_ops: Tuple[tuple, ...] = ()
    right_ops: Tuple[tuple, ...] = ()
    left_ref: tuple = None
    right_ref: tuple = None
    type: T.TypeInfo = None

    def children(self):
        return (self.left, self.right)

    def _key_parts(self):
        return (self.left, self.right, self.op, self.left_ops,
                self.right_ops, self.left_ref, self.right_ref)


@dataclass(frozen=True)
class DictTranslateExpr(Expr):
    """Re-encode a dict-string value into another dictionary: at launch
    every entry of the source dictionary is interned into the target
    (id→id table), so CASE/COALESCE branches from DIFFERENT dictionaries
    unify into one output dict with a single gather per branch.
    Reference: StringDictionaryTranslationMgr union maps."""

    arg: Expr = None
    src_ref: tuple = None
    dict_ref: tuple = None  # target (usually transient union) dict
    type: T.TypeInfo = None

    def children(self):
        return (self.arg,)

    def _key_parts(self):
        return (self.arg, self.src_ref, self.dict_ref)


class ExtractField(enum.Enum):
    YEAR = "YEAR"
    QUARTER = "QUARTER"
    MONTH = "MONTH"
    DAY = "DAY"
    HOUR = "HOUR"
    MINUTE = "MINUTE"
    SECOND = "SECOND"
    MILLISECOND = "MILLISECOND"
    DOW = "DOW"
    ISODOW = "ISODOW"
    DOY = "DOY"
    EPOCH = "EPOCH"
    WEEK = "WEEK"
    DECADE = "DECADE"
    CENTURY = "CENTURY"
    MILLENNIUM = "MILLENNIUM"


@dataclass(frozen=True)
class Extract(Expr):
    field_: ExtractField = None
    operand: Expr = None
    type: T.TypeInfo = None

    def children(self):
        return (self.operand,)

    def _key_parts(self):
        return (self.field_.value, self.operand)


@dataclass(frozen=True)
class DateTrunc(Expr):
    field_: ExtractField = None
    operand: Expr = None
    type: T.TypeInfo = None

    def children(self):
        return (self.operand,)

    def _key_parts(self):
        return ("TRUNC", self.field_.value, self.operand)


@dataclass(frozen=True)
class FunctionOp(Expr):
    """Scalar builtin (ABS, FLOOR, POWER, ...) — reference FunctionOper /
    ExtensionFunctions.hpp whitelist."""

    name: str = ""
    args: Tuple[Expr, ...] = ()
    type: T.TypeInfo = None

    def children(self):
        return self.args

    def _key_parts(self):
        return (self.name,) + self.args


class AggKind(enum.Enum):
    COUNT = "COUNT"
    SUM = "SUM"
    AVG = "AVG"
    MIN = "MIN"
    MAX = "MAX"
    SAMPLE = "SAMPLE"
    SINGLE_VALUE = "SINGLE_VALUE"
    APPROX_COUNT_DISTINCT = "APPROX_COUNT_DISTINCT"
    APPROX_QUANTILE = "APPROX_QUANTILE"
    COUNT_IF = "COUNT_IF"
    SUM_IF = "SUM_IF"
    MODE = "MODE"
    STDDEV = "STDDEV"
    VARIANCE = "VARIANCE"
    COUNT_DISTINCT = "COUNT_DISTINCT"  # COUNT(DISTINCT x)


@dataclass(frozen=True)
class Agg(Expr):
    """Aggregate target (reference Analyzer::AggExpr).  Appears only in
    Aggregate/Compound target lists."""

    kind: AggKind = None
    arg: Optional[Expr] = None  # None for COUNT(*)
    distinct: bool = False
    type: T.TypeInfo = None
    # second argument (condition for SUM_IF, quantile for APPROX_QUANTILE)
    arg2: Optional[Expr] = None

    def children(self):
        out = []
        if self.arg is not None:
            out.append(self.arg)
        if self.arg2 is not None:
            out.append(self.arg2)
        return tuple(out)

    def _key_parts(self):
        return (self.kind.value, self.distinct, self.arg, self.arg2)


class WindowKind(enum.Enum):
    ROW_NUMBER = "ROW_NUMBER"
    RANK = "RANK"
    DENSE_RANK = "DENSE_RANK"
    PERCENT_RANK = "PERCENT_RANK"
    CUME_DIST = "CUME_DIST"
    NTILE = "NTILE"
    LAG = "LAG"
    LEAD = "LEAD"
    FIRST_VALUE = "FIRST_VALUE"
    LAST_VALUE = "LAST_VALUE"
    NTH_VALUE = "NTH_VALUE"
    COUNT = "COUNT"
    SUM = "SUM"
    AVG = "AVG"
    MIN = "MIN"
    MAX = "MAX"


@dataclass(frozen=True)
class WindowFunc(Expr):
    """Window function over (partition_by, order_by) — reference
    Analyzer::WindowFunction / WindowFunctionContext (WindowContext.h:326).
    Appears only in Window-node specs (the planner separates window
    expressions into their own step, mirroring the reference's
    separate_window_function_expressions pass)."""

    kind: WindowKind = None
    args: Tuple[Expr, ...] = ()
    partition_by: Tuple[Expr, ...] = ()
    # (expr, asc, nulls_first)
    order_by: Tuple[tuple, ...] = ()
    type: T.TypeInfo = None
    dict_ref: Optional[tuple] = None
    # explicit frame ("ROWS"|"RANGE", lo_bound, hi_bound) with bounds
    # ("UP",)/("CR",)/("UF",)/("P", n)/("F", n); None = default frame
    frame: Optional[tuple] = None
    ignore_nulls: bool = False

    def children(self):
        return tuple(self.args) + tuple(self.partition_by) + tuple(
            e for e, _, _ in self.order_by
        )

    def _key_parts(self):
        return (self.kind.value, self.frame, self.ignore_nulls) + tuple(
            self.args
        ) + tuple(self.partition_by) + tuple(
            (e, a, nf) for e, a, nf in self.order_by
        )


@dataclass(frozen=True)
class ArrayFn(Expr):
    """Array operation over a base-table ARRAY column (reference
    Analyzer::CardinalityExpr, BinOper with kARRAY_AT, Analyzer::BinOper
    qualifier kANY/kALL over array RHS — QueryEngine/ArrayIR.cpp).

    The device representation of an array column is its global ROWID
    (int32); lengths/offsets/flat-values ride as aux arrays resolved by
    `arr_ref` = (table_id, col_id).  op:
      CARDINALITY — element count (NULL for NULL array)
      SUBSCRIPT   — 1-based element access, args=(index,)
      ANY / ALL   — quantified comparison, args=(lhs value expr,) with
                    cmp_op; lhs must be a constant for now
    """

    op: str = ""
    arr_ref: tuple = ()
    rowid: "Expr" = None
    args: Tuple["Expr", ...] = ()
    cmp_op: str = ""
    elem: T.TypeInfo = None
    type: T.TypeInfo = None
    dict_ref: Optional[tuple] = None

    def children(self):
        return (self.rowid,) + tuple(self.args)

    def _key_parts(self):
        return (self.op, self.arr_ref, self.cmp_op, self.rowid) + tuple(
            self.args
        )


@dataclass(frozen=True)
class OuterRef(Expr):
    """Reference to a column of the ENCLOSING query inside a correlated
    subquery (reference Analyzer::Var with rte_idx into the outer query).
    Eliminated by decorrelation (→ semi/anti-join equi conditions)."""

    field_idx: int = 0
    type: T.TypeInfo = None
    dict_ref: Optional[tuple] = None

    def _key_parts(self):
        return ("outer", self.field_idx)

    def __repr__(self):
        return f"$outer.{self.field_idx}"


@dataclass(frozen=True)
class SubqueryExpr(Expr):
    """Uncorrelated scalar subquery / IN-subquery placeholder.  The executor
    evaluates the sub-plan first and substitutes a Constant / InValues
    (reference RelAlgExecutor::executeRelAlgSubqueries)."""

    plan: object = None  # RelNode
    kind: str = "scalar"  # 'scalar' | 'in' | 'exists'
    arg: Optional[Expr] = None  # lhs for IN
    negated: bool = False
    correlated: bool = False  # plan contains OuterRefs → decorrelate
    type: T.TypeInfo = None

    def children(self):
        return (self.arg,) if self.arg is not None else ()

    def _key_parts(self):
        return (self.kind, id(self.plan), self.arg, self.negated)


def is_aggregate(e: Expr) -> bool:
    if isinstance(e, Agg):
        return True
    return any(is_aggregate(c) for c in e.children())


def walk(e: Expr):
    yield e
    for c in e.children():
        yield from walk(c)


def collect_input_refs(e: Expr) -> List[InputRef]:
    return [n for n in walk(e) if isinstance(n, InputRef)]


def rewrite(e: Expr, fn):
    """Bottom-up structural rewrite: fn(node, rewritten_children)->node."""
    import dataclasses

    if isinstance(e, Case):
        whens = tuple((rewrite(c, fn), rewrite(r, fn)) for c, r in e.whens)
        else_ = rewrite(e.else_, fn) if e.else_ is not None else None
        return fn(dataclasses.replace(e, whens=whens, else_=else_))
    if isinstance(e, BinOp):
        return fn(
            dataclasses.replace(
                e, left=rewrite(e.left, fn), right=rewrite(e.right, fn)
            )
        )
    if isinstance(e, UnOp):
        return fn(dataclasses.replace(e, operand=rewrite(e.operand, fn)))
    if isinstance(e, Cast):
        return fn(dataclasses.replace(e, operand=rewrite(e.operand, fn)))
    if isinstance(e, (InValues, DictStrPredicate)):
        return fn(dataclasses.replace(e, arg=rewrite(e.arg, fn)))
    if isinstance(e, (Extract, DateTrunc)):
        return fn(dataclasses.replace(e, operand=rewrite(e.operand, fn)))
    if isinstance(e, FunctionOp):
        return fn(
            dataclasses.replace(e, args=tuple(rewrite(a, fn) for a in e.args))
        )
    if isinstance(e, Agg):
        arg = rewrite(e.arg, fn) if e.arg is not None else None
        arg2 = rewrite(e.arg2, fn) if e.arg2 is not None else None
        return fn(dataclasses.replace(e, arg=arg, arg2=arg2))
    if isinstance(e, SubqueryExpr) and e.arg is not None:
        return fn(dataclasses.replace(e, arg=rewrite(e.arg, fn)))
    if isinstance(e, SampleRatio) and e.pos is not None:
        return fn(dataclasses.replace(e, pos=rewrite(e.pos, fn)))
    if isinstance(e, ArrayFn):
        return fn(dataclasses.replace(
            e, rowid=rewrite(e.rowid, fn),
            args=tuple(rewrite(a, fn) for a in e.args),
        ))
    if isinstance(e, (StringPairConcat, DictPairCompare)):
        return fn(dataclasses.replace(
            e, left=rewrite(e.left, fn), right=rewrite(e.right, fn)))
    if isinstance(e, (StringTransform, DictTranslateExpr)):
        return fn(dataclasses.replace(e, arg=rewrite(e.arg, fn)))
    return fn(e)
