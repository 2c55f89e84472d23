"""Relational-algebra DAG — the analogue of the reference's RelAlgDag
(QueryEngine/RelAlgDag.h:1281-3206).  The binder builds these from the SQL
AST; the optimizer coalesces Filter+Project+Aggregate into Compound nodes
(reference RelAlgOptimizer `create_compound`); the executor walks the DAG in
topological step order (reference RaExecutionSequence).

Every node has an output schema: list of (name, TypeInfo).  Expressions in a
node reference input fields via exprs.InputRef(input_idx, field_idx).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from heavydb_tpu import types as T
from heavydb_tpu.plan import exprs as E

_node_ids = itertools.count(1)


class RelNode:
    def __init__(self, inputs: Sequence["RelNode"]):
        self.id = next(_node_ids)
        self.inputs: List[RelNode] = list(inputs)
        self.fields: List[str] = []
        self.types: List[T.TypeInfo] = []

    @property
    def arity(self) -> int:
        return len(self.fields)

    def schema(self) -> List[Tuple[str, T.TypeInfo]]:
        return list(zip(self.fields, self.types))

    def explain(self, indent: int = 0) -> str:
        pad = "  " * indent
        lines = [pad + self._label()]
        for i in self.inputs:
            lines.append(i.explain(indent + 1))
        return "\n".join(lines)

    def _label(self) -> str:
        return type(self).__name__

    def plan_key(self) -> tuple:
        """Canonical structural key for the plan-DAG cache (reference
        QueryPlanDagCache.h:110)."""
        return (type(self).__name__,) + self._key_parts() + tuple(
            i.plan_key() for i in self.inputs
        )

    def _key_parts(self) -> tuple:
        return ()


class Scan(RelNode):
    ROWID_FIELD = "$rowid"

    def __init__(self, table, with_rowid: bool = False):
        super().__init__([])
        self.table = table  # storage Table
        self.fields = [cd.name for cd in table.columns]
        # none-encoded TEXT executes as ids of its lazily-built
        # dictionary — downstream the column IS a dict string
        self.types = [
            T.text_dict(nullable=cd.type.nullable)
            if cd.type.is_none_string else cd.type
            for cd in table.columns
        ]
        # `rowid` pseudo-column (reference: Catalog's implicit virtual
        # rowid column): GLOBAL physical row position — fragment base +
        # local offset — so it is stable under fragment skipping, wave
        # streaming, and join gathers.  Exposed as a hidden trailing
        # field only when the query references rowid / SAMPLE_RATIO.
        self.with_rowid = bool(with_rowid)
        if self.with_rowid:
            self.fields.append(self.ROWID_FIELD)
            self.types.append(T.bigint(nullable=False))

    def _label(self):
        return f"Scan({self.table.name})"

    def _key_parts(self):
        # generation deliberately excluded: kernel structure is data-independent
        # (data-dependent choices — ranges, caps — are separate cache-key parts)
        return (self.table.table_id, self.with_rowid)


class Project(RelNode):
    def __init__(self, input_: RelNode, exprs: Sequence[E.Expr], names: Sequence[str]):
        super().__init__([input_])
        self.exprs = list(exprs)
        self.fields = list(names)
        self.types = [e.type for e in exprs]

    def _label(self):
        return f"Project({', '.join(map(str, self.fields))})"

    def _key_parts(self):
        return tuple(e.key() for e in self.exprs)


class Filter(RelNode):
    def __init__(self, input_: RelNode, condition: E.Expr):
        super().__init__([input_])
        self.condition = condition
        self.fields = list(input_.fields)
        self.types = list(input_.types)

    def _label(self):
        return f"Filter({self.condition})"

    def _key_parts(self):
        return (self.condition.key(),)


class Aggregate(RelNode):
    """Group-by + aggregates.  group_exprs are expressions over the input;
    agg_exprs are E.Agg nodes.  Output schema = group keys then aggs."""

    def __init__(
        self,
        input_: RelNode,
        group_exprs: Sequence[E.Expr],
        agg_exprs: Sequence[E.Agg],
        names: Sequence[str],
    ):
        super().__init__([input_])
        self.group_exprs = list(group_exprs)
        self.agg_exprs = list(agg_exprs)
        self.fields = list(names)
        self.types = [e.type for e in group_exprs] + [a.type for a in agg_exprs]

    def _label(self):
        return f"Aggregate(keys={len(self.group_exprs)}, aggs={[a.kind.value for a in self.agg_exprs]})"

    def _key_parts(self):
        return tuple(e.key() for e in self.group_exprs) + tuple(
            a.key() for a in self.agg_exprs
        )


class Join(RelNode):
    """Binary join.  Output schema = left fields ++ right fields, except
    SEMI/ANTI (existence joins) whose output is the left schema only.
    condition references the combined (left ++ right) schema."""

    def __init__(self, left: RelNode, right: RelNode, kind: str, condition):
        super().__init__([left, right])
        self.kind = kind  # INNER | LEFT | CROSS | SEMI | ANTI
        self.condition = condition
        if kind in ("SEMI", "ANTI"):
            self.fields = list(left.fields)
            self.types = list(left.types)
        else:
            self.fields = list(left.fields) + list(right.fields)
            ltypes = [
                t.with_nullable(True) if kind == "FULL" else t
                for t in left.types
            ]
            rtypes = [
                t.with_nullable(True) if kind in ("LEFT", "FULL") else t
                for t in right.types
            ]
            self.types = ltypes + rtypes

    def _label(self):
        return f"Join({self.kind}, {self.condition})"

    def _key_parts(self):
        return (self.kind, self.condition.key() if self.condition else None)


class Sort(RelNode):
    def __init__(
        self,
        input_: RelNode,
        keys: Sequence[Tuple[int, bool, bool]],  # (field_idx, asc, nulls_first)
        limit: Optional[int],
        offset: Optional[int],
    ):
        super().__init__([input_])
        self.keys = list(keys)
        self.limit = limit
        self.offset = offset
        self.fields = list(input_.fields)
        self.types = list(input_.types)

    def _label(self):
        return f"Sort(keys={self.keys}, limit={self.limit}, offset={self.offset})"

    def _key_parts(self):
        return (tuple(self.keys), self.limit, self.offset)


class Union(RelNode):
    def __init__(self, inputs: Sequence[RelNode], all_: bool):
        super().__init__(inputs)
        self.all = all_
        self.fields = list(inputs[0].fields)
        self.types = list(inputs[0].types)

    def _label(self):
        return f"Union(all={self.all})"

    def _key_parts(self):
        return (self.all,)


class Values(RelNode):
    """Literal rows (reference RelLogicalValues)."""

    def __init__(self, names, types, rows):
        super().__init__([])
        self.fields = list(names)
        self.types = list(types)
        self.rows = rows  # list of tuples of physical python values

    def _label(self):
        return f"Values({len(self.rows)} rows)"

    def _key_parts(self):
        return (len(self.rows),)


class TableData(RelNode):
    """Materialized host columns (table-function output, executed eagerly at
    plan time like subqueries — reference TableFunctionExecutionContext)."""

    def __init__(self, names, types, arrays, dict_refs=None):
        super().__init__([])
        self.fields = list(names)
        self.types = list(types)
        self.arrays = arrays  # list of numpy arrays
        self.dict_refs = dict_refs or [None] * len(self.fields)

    @property
    def num_rows(self):
        return 0 if not self.arrays else len(self.arrays[0])

    def _label(self):
        return f"TableData({self.num_rows} rows)"

    def _key_parts(self):
        # STRUCTURAL key, not identity: the arrays reach the kernel as
        # runtime args (executor _exec → from_host_columns → Batch), so
        # the compiled program depends only on schema; keying on node id
        # forced a ~0.3s re-trace of every distributed merge / exchange
        # Compound on every query (the row-count shape bucket rides the
        # kernel-cache key separately)
        return (
            "td",
            tuple(self.fields),
            tuple(str(t) for t in self.types),
            tuple(self.dict_refs),
        )


class Window(RelNode):
    """Appends window-function columns to its input (reference RelProject
    with window exprs, separated by separate_window_function_expressions).
    Output schema = input fields ++ one field per window function."""

    def __init__(self, input_: RelNode, wfuncs):
        super().__init__([input_])
        self.wfuncs = list(wfuncs)  # E.WindowFunc
        self.fields = list(input_.fields) + [
            f"$w{i}" for i in range(len(self.wfuncs))
        ]
        self.types = list(input_.types) + [w.type for w in self.wfuncs]

    def _label(self):
        return f"Window({[w.kind.value for w in self.wfuncs]})"

    def _key_parts(self):
        return tuple(w.key() for w in self.wfuncs)


class Unnest(RelNode):
    """Expands each input row into one row per array element (reference:
    Calcite UNNEST → correlated join over an array iterator; HeavyDB
    RelLogicalValues/ArrayIR UNNEST support).  Output schema = input
    fields ++ the element column."""

    def __init__(self, input_: RelNode, afn):
        super().__init__([input_])
        self.afn = afn  # E.ArrayFn op=UNNEST (carries arr_ref + rowid)
        self.fields = list(input_.fields) + ["$unnest"]
        self.types = list(input_.types) + [afn.type]

    def _label(self):
        return f"Unnest({self.afn.arr_ref})"

    def _key_parts(self):
        return (self.afn.key(),)


class Compound(RelNode):
    """Fused join→filter→aggregate→project work unit — the unit of kernel
    compilation (reference RelCompound + RelAlgExecutionUnit,
    QueryEngine/RelAlgExecutionUnit.h:165).  Produced by the optimizer.

    Semantics (one XLA program):
      1. join inputs[0] (probe) with inputs[1:] per join_levels — conditions
         reference the COMBINED input schema (concat of all input fields);
      2. filter_cond over the joined row domain;
      3. if group_exprs or aggs: group by group_exprs, compute aggs; the
         post-agg domain is [group keys ++ agg results]; `having` filters it;
         target_exprs are evaluated over the post-agg domain.
         else: target_exprs are evaluated over the joined row domain.
    """

    def __init__(
        self,
        inputs: Sequence[RelNode],
        join_levels,  # list of (kind, condition) for inputs[1:]
        filter_cond: Optional[E.Expr],
        group_exprs: Sequence[E.Expr],
        aggs: Sequence[E.Agg],
        target_exprs: Sequence[E.Expr],
        names: Sequence[str],
        having: Optional[E.Expr] = None,
    ):
        super().__init__(inputs)
        self.join_levels = list(join_levels)
        self.filter_cond = filter_cond
        self.group_exprs = list(group_exprs)
        self.aggs = list(aggs)
        self.target_exprs = list(target_exprs)
        self.having = having
        self.fields = list(names)
        self.types = [e.type for e in self.target_exprs]

    @property
    def is_aggregate(self) -> bool:
        return bool(self.group_exprs) or bool(self.aggs)

    def _label(self):
        parts = []
        if self.join_levels:
            parts.append(f"joins={[(k, str(c)) for k, c in self.join_levels]}")
        if self.filter_cond is not None:
            parts.append(f"filter={self.filter_cond}")
        if self.group_exprs:
            parts.append(f"keys={[str(e) for e in self.group_exprs]}")
        if self.aggs:
            parts.append(f"aggs={[a.kind.value for a in self.aggs]}")
        parts.append(f"targets={[str(e) for e in self.target_exprs]}")
        return "Compound(" + ", ".join(parts) + ")"

    def _key_parts(self):
        return (
            tuple((k, c.key() if c else None) for k, c in self.join_levels),
            self.filter_cond.key() if self.filter_cond is not None else None,
            tuple(e.key() for e in self.group_exprs),
            tuple(a.key() for a in self.aggs),
            tuple(e.key() for e in self.target_exprs),
            self.having.key() if self.having is not None else None,
        )


def topo_order(root: RelNode) -> List[RelNode]:
    """Post-order (inputs before consumers), deduplicated — the analogue of
    RaExecutionSequence topo sort (docs/source/execution/scheduler.rst)."""
    seen = {}
    order: List[RelNode] = []

    def visit(n: RelNode):
        if n.id in seen:
            return
        seen[n.id] = True
        for i in n.inputs:
            visit(i)
        order.append(n)

    visit(root)
    return order
