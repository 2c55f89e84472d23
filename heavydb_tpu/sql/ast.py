"""Untyped SQL AST produced by the parser.

This is the engine's replacement for the Calcite front half (reference
java/calcite HeavyDBParser): the parser builds these nodes, then
plan/builder.py resolves names/types and lowers to the relational algebra
DAG (plan/rel_alg.py), playing the role of Calcite's RA JSON +
RelAlgDagBuilder.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union


class Node:
    pass


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


class Expr(Node):
    pass


@dataclass
class Literal(Expr):
    value: object  # int | float | str | bool | None
    # 'num_int' | 'num_float' | 'num_decimal' | 'string' | 'bool' | 'null'
    kind: str = "num_int"
    text: str = ""  # original literal text (decimals keep exactness)


@dataclass
class Identifier(Expr):
    parts: Tuple[str, ...]  # ('t', 'x') or ('x',)

    @property
    def name(self) -> str:
        return self.parts[-1]


@dataclass
class Star(Expr):
    table: Optional[str] = None  # t.* if set


@dataclass
class Unary(Expr):
    op: str  # 'NOT' | '-' | '+'
    operand: Expr


@dataclass
class Binary(Expr):
    op: str  # '+','-','*','/','%','=','<>','<','<=','>','>=','AND','OR','||'
    left: Expr
    right: Expr


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    operand: Expr
    items: List[Expr] = field(default_factory=list)
    negated: bool = False


@dataclass
class InSubquery(Expr):
    operand: Expr
    subquery: "Select" = None
    negated: bool = False


@dataclass
class Like(Expr):
    operand: Expr
    pattern: Expr
    escape: Optional[Expr] = None
    negated: bool = False
    ilike: bool = False


@dataclass
class CaseWhen(Expr):
    # CASE [operand] WHEN c THEN r ... [ELSE e] END ; simple CASE is rewritten
    # to searched CASE by the parser.
    whens: List[Tuple[Expr, Expr]] = field(default_factory=list)
    else_: Optional[Expr] = None


@dataclass
class TypeName(Node):
    name: str  # canonical upper-case base name
    params: Tuple[int, ...] = ()  # (p, s) / (n)
    is_array: bool = False  # TYPE[] / TYPE[n] (size hint ignored)
    not_null: bool = False
    encoding: Optional[str] = None  # 'DICT' | 'NONE' | 'FIXED' | 'DAYS'
    encoding_param: int = 0


@dataclass
class Cast(Expr):
    operand: Expr
    type_name: TypeName
    try_: bool = False


@dataclass
class Subscript(Expr):
    """arr[idx] — 1-based array element access (HeavyDB kARRAY_AT)."""

    base: Expr = None
    index: Expr = None


@dataclass
class ArrayLiteral(Expr):
    """ARRAY[...] / {...} literal."""

    items: List[Expr] = field(default_factory=list)


@dataclass
class QuantCmp(Expr):
    """lhs <op> ANY/ALL rhs where rhs is an array expression."""

    op: str = "="
    lhs: Expr = None
    rhs: Expr = None
    quant: str = "ANY"  # ANY | ALL


@dataclass
class FuncCall(Expr):
    name: str  # upper-cased
    args: List[Expr] = field(default_factory=list)
    distinct: bool = False
    star: bool = False  # COUNT(*)


@dataclass
class ExtractExpr(Expr):
    field_: str  # YEAR, MONTH, DAY, HOUR, MINUTE, SECOND, DOW, DOY, EPOCH, QUARTER, WEEK, MILLENNIUM...
    operand: Expr


@dataclass
class ScalarSubquery(Expr):
    subquery: "Select" = None


@dataclass
class Exists(Expr):
    subquery: "Select" = None
    negated: bool = False


@dataclass
class IntervalLit(Expr):
    value: Expr
    unit: str  # YEAR/MONTH/DAY/HOUR/MINUTE/SECOND


@dataclass
class WindowSpec(Node):
    partition_by: List[Expr] = field(default_factory=list)
    order_by: List["OrderItem"] = field(default_factory=list)
    # frame support arrives with window functions
    frame: Optional[tuple] = None


@dataclass
class WindowFuncCall(Expr):
    func: FuncCall = None
    spec: WindowSpec = None
    ignore_nulls: bool = False


# ---------------------------------------------------------------------------
# Table references
# ---------------------------------------------------------------------------


class TableRef(Node):
    pass


@dataclass
class NamedTable(TableRef):
    name: str
    alias: Optional[str] = None


@dataclass
class SubqueryRef(TableRef):
    select: "Select" = None
    alias: Optional[str] = None


@dataclass
class TableFuncRef(TableRef):
    """FROM TABLE(fn(CURSOR(SELECT ...), arg, ...)) — reference UDTF syntax."""

    name: str = ""
    args: List[object] = field(default_factory=list)  # Expr | Select (cursor)
    alias: Optional[str] = None


@dataclass
class JoinRef(TableRef):
    left: TableRef = None
    right: TableRef = None
    kind: str = "INNER"  # INNER | LEFT | CROSS (RIGHT rewritten to LEFT)
    condition: Optional[Expr] = None
    using: Optional[List[str]] = None


# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------


class Statement(Node):
    pass


@dataclass
class OrderItem(Node):
    expr: Expr
    asc: bool = True
    nulls_first: Optional[bool] = None  # None = dialect default (nulls last asc / first desc)


@dataclass
class Select(Statement):
    projections: List[Tuple[Expr, Optional[str]]] = field(default_factory=list)
    from_: Optional[TableRef] = None
    where: Optional[Expr] = None
    group_by: List[Expr] = field(default_factory=list)
    # GROUPING SETS / ROLLUP / CUBE → list of grouping sets, each a list
    # of group exprs; desugared by the planner into a UNION ALL of
    # per-set aggregations with dropped keys as NULL
    grouping_sets: Optional[List[List[Expr]]] = None
    having: Optional[Expr] = None
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None
    distinct: bool = False
    # set operations: ('UNION'|'UNION ALL', Select) applied left to right
    set_ops: List[Tuple[str, "Select"]] = field(default_factory=list)
    ctes: List[Tuple[str, "Select"]] = field(default_factory=list)
    # /*+ hint(...) */ hints (reference QueryEngine/QueryHint.h:29-62)
    hints: dict = field(default_factory=dict)


@dataclass
class ColumnDef(Node):
    name: str
    type_name: TypeName
    default: Optional[Expr] = None


@dataclass
class AlterSetting(Statement):
    """ALTER SYSTEM|SESSION SET key = value (reference DdlCommandExecutor
    AlterSystemCommand / runtime-settable g_* flags)."""

    scope: str = "SESSION"  # SESSION | SYSTEM
    key: str = ""
    value: object = None


@dataclass
class CreateServer(Statement):
    """CREATE SERVER name FOREIGN DATA WRAPPER wrapper WITH (...) —
    reference FSI ForeignServer (Catalog/ForeignServer.h)."""

    name: str = ""
    wrapper: str = ""
    options: dict = field(default_factory=dict)
    if_not_exists: bool = False


@dataclass
class DropServer(Statement):
    name: str = ""
    if_exists: bool = False


@dataclass
class CreateForeignTable(Statement):
    """CREATE FOREIGN TABLE ... SERVER srv WITH (file_path=...) —
    reference Catalog/ForeignTable.h + foreign storage wrappers."""

    name: str = ""
    columns: List["ColumnDef"] = field(default_factory=list)
    server: str = ""
    options: dict = field(default_factory=dict)
    if_not_exists: bool = False


@dataclass
class RefreshForeignTables(Statement):
    tables: List[str] = field(default_factory=list)
    evict: bool = False


@dataclass
class ShowServers(Statement):
    pass


@dataclass
class ShowFunctions(Statement):
    table_functions: bool = False


@dataclass
class CreateTable(Statement):
    name: str
    columns: List[ColumnDef] = field(default_factory=list)
    if_not_exists: bool = False
    temporary: bool = False
    options: dict = field(default_factory=dict)  # WITH (fragment_size=..., ...)
    as_select: Optional[Select] = None
    # SHARD KEY (col) — reference TableDescriptor shardedColumnId +
    # nShards (WITH (shard_count=N)); drives co-located distributed loads
    shard_key: Optional[str] = None


@dataclass
class DropTable(Statement):
    name: str
    if_exists: bool = False


@dataclass
class RenameTable(Statement):
    old: str
    new: str


@dataclass
class AddColumn(Statement):
    table: str = ""
    column: "ColumnDef" = None


@dataclass
class DropColumn(Statement):
    table: str = ""
    column: str = ""


@dataclass
class RenameColumn(Statement):
    table: str = ""
    old: str = ""
    new: str = ""


@dataclass
class AlterColumnType(Statement):
    """ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE <type> [NOT NULL]
    (reference Catalog/DdlCommandExecutor.h AlterTableAlterColumnCommand)."""

    table: str = ""
    column: str = ""
    type_name: "TypeName" = None


@dataclass
class CommentOn(Statement):
    """COMMENT ON TABLE t IS '...' | COMMENT ON COLUMN t.c IS '...'
    (reference ddlParser.ftl:1156, Catalog::setTableComment/setColumnComment).
    text None = clear (IS NULL)."""

    kind: str = "TABLE"  # TABLE | COLUMN
    table: str = ""
    column: Optional[str] = None
    text: Optional[str] = None


@dataclass
class CreatePolicy(Statement):
    """CREATE POLICY ON COLUMN t.c TO grantee VALUES (...) — row-level
    security (reference SqlCreatePolicy + HeavyDBPlanner InjectFilterRule:
    SELECTs by the grantee see only rows where c IN values)."""

    table: str = ""
    column: str = ""
    grantee: str = ""
    values: tuple = ()


@dataclass
class DropPolicy(Statement):
    table: str = ""
    column: str = ""
    grantee: str = ""


@dataclass
class ShowPolicies(Statement):
    """SHOW [ALL] POLICIES <grantee> (reference SqlShowPolicies)."""

    grantee: str = ""
    effective: bool = False  # ALL: include policies via granted roles


@dataclass
class OptimizeTable(Statement):
    name: str = ""


@dataclass
class InsertValues(Statement):
    table: str
    columns: Optional[List[str]] = None
    rows: List[List[Expr]] = field(default_factory=list)


@dataclass
class InsertSelect(Statement):
    table: str
    columns: Optional[List[str]] = None
    select: Select = None


@dataclass
class Update(Statement):
    table: str
    assignments: List[Tuple[str, Expr]] = field(default_factory=list)
    where: Optional[Expr] = None


@dataclass
class Delete(Statement):
    table: str
    where: Optional[Expr] = None


@dataclass
class CopyFrom(Statement):
    table: str
    path: str
    options: dict = field(default_factory=dict)


@dataclass
class CopyTo(Statement):
    select: Select = None
    path: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class Explain(Statement):
    stmt: Statement = None
    kind: str = "PLAN"  # PLAN | CALCITE | OPTIMIZED — maps to plan / jaxpr / HLO dumps


@dataclass
class ShowTables(Statement):
    pass


@dataclass
class ShowCreateTable(Statement):
    name: str = ""


@dataclass
class ShowTableDetails(Statement):
    names: tuple = ()


@dataclass
class ShowUserSessions(Statement):
    pass


@dataclass
class ShowQueries(Statement):
    pass


@dataclass
class KillQuery(Statement):
    session_id: str = ""


@dataclass
class DescribeTable(Statement):
    name: str = ""


@dataclass
class TruncateTable(Statement):
    name: str = ""


@dataclass
class CreateView(Statement):
    name: str = ""
    select: Select = None
    if_not_exists: bool = False


@dataclass
class DropView(Statement):
    name: str = ""
    if_exists: bool = False


@dataclass
class ValidateStmt(Statement):
    pass


@dataclass
class CreateUser(Statement):
    name: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class DropUser(Statement):
    name: str = ""


@dataclass
class AlterUser(Statement):
    name: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class CreateRole(Statement):
    name: str = ""


@dataclass
class DropRole(Statement):
    name: str = ""


@dataclass
class GrantStmt(Statement):
    # privileges ['SELECT',...] on object, or role grant (privileges=None)
    privileges: Optional[List[str]] = None
    object: Optional[str] = None  # table name or '*'
    roles: Optional[List[str]] = None
    grantees: List[str] = field(default_factory=list)
    revoke: bool = False


@dataclass
class ShowUsers(Statement):
    pass


@dataclass
class ShowRoles(Statement):
    pass


@dataclass
class DumpTable(Statement):
    name: str = ""
    path: str = ""


@dataclass
class RestoreTable(Statement):
    name: str = ""
    path: str = ""
