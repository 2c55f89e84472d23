"""RA optimizer: coalesces Filter/Project/Aggregate/Join chains into Compound
work units and hoists equi-join conditions out of cross joins.

Reference passes: QueryEngine/RelAlgOptimizer.h (create_compound,
hoist_filter_cond_to_cross_join, eliminate_identical_copy) and
RelLeftDeepInnerJoin.cpp (left-deep join tree flattening).  Dead-column
elimination happens at kernel-build time instead (the executor only fetches
referenced columns).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from heavydb_tpu.plan import exprs as E
from heavydb_tpu.plan import rel_alg as R


def optimize(root: R.RelNode) -> R.RelNode:
    root = _hoist_cross_join_filters(root)
    root = _fuse(root)
    root = _simplify_outer_joins(root)
    root = _push_filter_through_agg(root)
    root = _reorder_joins(root)
    # fixpoint: trims cascade (an outer Compound's trim exposes dead
    # columns in its child's Window/Compound on the NEXT sweep — the
    # walk is bottom-up, so one sweep can't see its own parents' trims)
    for _ in range(4):
        _PRUNE_CHANGED[0] = False
        root = _prune_dead_columns(root)
        if not _PRUNE_CHANGED[0]:
            break
    return root


_PRUNE_CHANGED = [False]


# ---------------------------------------------------------------------------
# Outer-join simplification via null rejection (reference Calcite's
# OuterJoinOptViaNullRejectionRule in HeavyDBPlanner.java:189-266): a WHERE
# conjunct that cannot evaluate TRUE when the build side's fields are all
# NULL filters out every LEFT-join-unmatched row anyway, so the LEFT join
# is equivalent to an INNER join — which unlocks build-side filter
# push-down and cardinality-based join reordering.
# ---------------------------------------------------------------------------


def _strict_null_prop(e: E.Expr, lo: int, hi: int):
    """(strictly_null_propagating, references_[lo,hi)) for scalar expr e.
    "Strict" = NULL in any input forces a NULL result (no CASE/COALESCE/
    IS NULL that could manufacture a non-NULL from a NULL)."""
    if isinstance(e, E.InputRef):
        return True, lo <= e.field_idx < hi
    if isinstance(e, E.Constant):
        return e.value is not None, False
    if isinstance(e, E.BinOp) and (
        e.op in E.ARITH_OPS or e.op in E.COMPARISON_OPS
    ):
        ls, lr = _strict_null_prop(e.left, lo, hi)
        rs, rr = _strict_null_prop(e.right, lo, hi)
        return ls and rs, lr or rr
    if isinstance(e, E.Cast):
        return _strict_null_prop(e.operand, lo, hi)
    if isinstance(e, (E.Extract, E.DateTrunc)):
        return _strict_null_prop(e.operand, lo, hi)
    if isinstance(e, E.UnOp) and e.op == E.UnOpKind.NEG:
        return _strict_null_prop(e.operand, lo, hi)
    return False, False


def _null_rejecting(c: E.Expr, lo: int, hi: int) -> bool:
    """Can conjunct c evaluate TRUE when every field in [lo, hi) is NULL?
    False ⇒ c rejects that input's NULL-extended rows."""
    if isinstance(c, E.BinOp):
        if c.op == E.BinOpKind.AND:
            return (_null_rejecting(c.left, lo, hi)
                    or _null_rejecting(c.right, lo, hi))
        if c.op == E.BinOpKind.OR:
            return (_null_rejecting(c.left, lo, hi)
                    and _null_rejecting(c.right, lo, hi))
        if c.op in E.COMPARISON_OPS:
            s, r = _strict_null_prop(c, lo, hi)
            return s and r
        return False
    if isinstance(c, E.UnOp):
        if c.op == E.UnOpKind.ISNOTNULL:
            s, r = _strict_null_prop(c.operand, lo, hi)
            return s and r
        if c.op == E.UnOpKind.NOT and isinstance(c.operand, E.BinOp) \
                and c.operand.op in E.COMPARISON_OPS:
            # NOT(a <cmp> b): NULL input → NULL comparison → NOT NULL
            # is still NULL → not TRUE
            s, r = _strict_null_prop(c.operand, lo, hi)
            return s and r
        return False
    if isinstance(c, E.InValues):
        s, r = _strict_null_prop(c.arg, lo, hi)
        return s and r  # x [NOT] IN (...) is NULL (not TRUE) on NULL x
    if isinstance(c, E.DictStrPredicate):
        s, r = _strict_null_prop(c.arg, lo, hi)
        return s and r  # [NOT] LIKE/REGEXP/CMP is NULL on NULL strings
    return False


def _simplify_outer_joins(node: R.RelNode, seen=None) -> R.RelNode:
    if seen is None:
        seen = set()
    if id(node) in seen:
        return node
    seen.add(id(node))
    for i in node.inputs:
        _simplify_outer_joins(i, seen)
    if (
        isinstance(node, R.Compound)
        and node.filter_cond is not None
        and node.join_levels
    ):
        offsets = [0]
        for inp in node.inputs:
            offsets.append(offsets[-1] + inp.arity)
        conjs = _split_conjuncts(node.filter_cond)
        probe_rej = any(
            _null_rejecting(c, 0, offsets[1]) for c in conjs
        )
        for li, (kind, cond) in enumerate(node.join_levels):
            lo, hi = offsets[li + 1], offsets[li + 2]
            build_rej = any(_null_rejecting(c, lo, hi) for c in conjs)
            if kind == "FULL" and probe_rej:
                # probe fields are NULL exactly on the appended unmatched
                # build rows — a probe-side rejecting filter drops them
                kind = "LEFT"
            if kind == "LEFT" and build_rej:
                kind = "INNER"
            node.join_levels[li] = (kind, cond)
    return node


def _push_filter_through_agg(node: R.RelNode, seen=None) -> R.RelNode:
    """Filter-aggregate transpose (reference Calcite
    FilterAggregateTransposeRule in HeavyDBPlanner's rule set): conjuncts
    of an outer Compound's filter that reference ONLY group-key outputs
    of an inner aggregate Compound move below the aggregation, rewritten
    over the inner input domain — rows are filtered before grouping
    instead of aggregating everything and discarding groups."""
    if seen is None:
        seen = {}
    if id(node) in seen:
        return seen[id(node)]
    node.inputs[:] = [
        _push_filter_through_agg(i, seen) for i in node.inputs
    ]
    out = node
    if (
        isinstance(node, R.Compound)
        and node.filter_cond is not None
        and not node.join_levels
        and len(node.inputs) == 1
        and isinstance(node.inputs[0], R.Compound)
        and node.inputs[0].is_aggregate
        and node.inputs[0].group_exprs
    ):
        child = node.inputs[0]
        n_keys = len(child.group_exprs)
        keymap = {}
        for i, te in enumerate(child.target_exprs):
            if isinstance(te, E.InputRef) and te.field_idx < n_keys:
                keymap[i] = child.group_exprs[te.field_idx]
        push, keep = [], []
        for c in _split_conjuncts(node.filter_cond):
            refs = E.collect_input_refs(c)
            if refs and all(r.field_idx in keymap for r in refs):
                push.append(E.rewrite(
                    c, lambda e: keymap[e.field_idx]
                    if isinstance(e, E.InputRef) else e
                ))
            else:
                keep.append(c)
        if push:
            new_inner_filter = _and_all(
                ([child.filter_cond] if child.filter_cond is not None
                 else []) + push
            )
            new_child = R.Compound(
                list(child.inputs), list(child.join_levels),
                new_inner_filter, list(child.group_exprs),
                list(child.aggs), list(child.target_exprs),
                list(child.fields), child.having,
            )
            out = R.Compound(
                [new_child], [], _and_all(keep), list(node.group_exprs),
                list(node.aggs), list(node.target_exprs),
                list(node.fields), node.having,
            )
    seen[id(node)] = out
    return out


# ---------------------------------------------------------------------------
# Pass 3: cardinality-based join reordering (reference
# QueryEngine/FromTableReordering.cpp) — pick the largest input as the probe
# side and greedily order build inputs small-first, so a query phrased with
# the big table second doesn't build a huge hash table and probe with the
# small one.  INNER-only chains (reordering LEFT/SEMI/ANTI changes results).
# ---------------------------------------------------------------------------


def _estimate_rows(n: R.RelNode) -> Optional[int]:
    """Plan-time cardinality estimate (table row counts + crude selectivity
    discounts; the reference uses the same table-cardinality ordering)."""
    if isinstance(n, R.Scan):
        return n.table.num_rows
    if isinstance(n, R.Values):
        return len(n.rows)
    if isinstance(n, R.TableData):
        return n.num_rows
    if isinstance(n, R.Sort):
        e = _estimate_rows(n.inputs[0])
        if e is None:
            return None
        return min(e, n.limit) if n.limit is not None else e
    if isinstance(n, R.Union):
        es = [_estimate_rows(i) for i in n.inputs]
        return None if any(e is None for e in es) else sum(es)
    if isinstance(n, (R.Window, R.Unnest)):
        return _estimate_rows(n.inputs[0])
    if isinstance(n, R.Compound):
        if not n.inputs:
            return None
        base = _estimate_rows(n.inputs[0])
        if base is None:
            return None
        if n.is_aggregate:
            # group-by output ≈ NDV, unknown at plan time; a conservative
            # tenth keeps aggregated subqueries off the probe slot unless
            # their source dwarfs everything else
            base = max(1, base // 10)
        elif n.filter_cond is not None:
            base = max(1, base // 3)
        return base
    return None


def _reorder_joins(node: R.RelNode, sizes=None) -> R.RelNode:
    """Reorder a Compound's join inputs by cardinality.  `sizes` (actual
    per-input row counts, known once inputs are materialized) overrides
    the plan-time estimates — the runtime half of the reference's
    FromTableReordering."""
    if sizes is None:
        node.inputs = [_reorder_joins(i) for i in node.inputs]
    if not isinstance(node, R.Compound) or len(node.inputs) < 2:
        return node
    if any(k != "INNER" or c is None for k, c in node.join_levels):
        return node
    ests = sizes if sizes is not None else [
        _estimate_rows(i) for i in node.inputs
    ]
    if any(e is None for e in ests):
        return node

    n_in = len(node.inputs)
    old_off = []
    acc = 0
    for i in node.inputs:
        old_off.append(acc)
        acc += i.arity

    # which inputs does each join conjunct touch?
    conjs = []
    for _, cond in node.join_levels:
        for c in _split_conjuncts(cond):
            refs = E.collect_input_refs(c)
            touched = set()
            for r in refs:
                j = n_in - 1
                while old_off[j] > r.field_idx:
                    j -= 1
                touched.add(j)
            conjs.append((c, touched))

    # probe = largest input; builds greedily: smallest EQUI-CONNECTED
    # next.  Connectivity must follow EQUALITY edges only — a non-equi
    # conjunct (e.g. a disjunction spanning two tables, TPC-H Q7/Q19
    # shapes) connects inputs in the join graph but cannot key a hash
    # level, and an order chosen through it leaves a level without an
    # equality (executor requires ≥1 equi per level).
    def _is_equi(c):
        return (
            isinstance(c, E.BinOp) and c.op == E.BinOpKind.EQ
        ) or (getattr(c, "op", None) == "=" and hasattr(c, "left_ref"))

    equi_conjs = [(c, t) for c, t in conjs if _is_equi(c) and len(t) >= 2]
    probe = max(range(n_in), key=lambda i: ests[i])
    order = [probe]
    remaining = set(range(n_in)) - {probe}
    while remaining:
        connected = [
            i for i in remaining
            if any(i in t and (t & set(order)) for _, t in equi_conjs)
        ]
        if not connected:
            return node  # keep the original (validated) order
        nxt = min(connected, key=lambda i: ests[i])
        order.append(nxt)
        remaining.discard(nxt)
    if order == list(range(n_in)):
        return node

    # index remap old combined idx → new combined idx
    new_off = {}
    acc = 0
    for i in order:
        new_off[i] = acc
        acc += node.inputs[i].arity
    remap = {}
    for i in range(n_in):
        for f in range(node.inputs[i].arity):
            remap[old_off[i] + f] = new_off[i] + f

    import dataclasses

    def rn(e):
        if isinstance(e, E.InputRef):
            return dataclasses.replace(e, field_idx=remap[e.field_idx])
        return e

    # assign each conjunct to the first level at which all its inputs are
    # placed; conjuncts over a single input sink into the filter
    placed = {probe}
    levels = []
    extra_filter = []
    pending = [(c, t) for c, t in conjs]
    for li in range(1, n_in):
        placed.add(order[li])
        mine, rest = [], []
        for c, t in pending:
            if t <= placed:
                (extra_filter if order[li] not in t else mine).append((c, t))
            else:
                rest.append((c, t))
        pending = rest
        cond = _and_all([E.rewrite(c, rn) for c, _ in mine])
        if cond is None or not any(_is_equi(c) for c, _ in mine):
            # no equality keys this level → the executor can't build a
            # hash table for it; keep the original (validated) order
            return node
        levels.append(("INNER", cond))

    node.inputs = [node.inputs[i] for i in order]
    node.join_levels = levels
    if sizes is not None:
        # runtime call: the caller holds materialized inputs and must
        # permute them to match
        node._reordered = order
    fc = [E.rewrite(c, rn) for c, _ in extra_filter]
    if node.filter_cond is not None:
        fc.append(E.rewrite(node.filter_cond, rn))
    node.filter_cond = _and_all(fc)
    node.group_exprs = [E.rewrite(g, rn) for g in node.group_exprs]
    node.aggs = [_rewrite_agg(a, rn) for a in node.aggs]
    if not node.is_aggregate:
        # target_exprs reference the joined row domain only in the
        # non-aggregate case; post-agg targets/having index the
        # [group keys ++ agg results] domain and need no remap
        node.target_exprs = [E.rewrite(t, rn) for t in node.target_exprs]
    return node


def _rewrite_agg(a, fn):
    import dataclasses

    return dataclasses.replace(
        a,
        arg=E.rewrite(a.arg, fn) if a.arg is not None else None,
        arg2=E.rewrite(a.arg2, fn) if a.arg2 is not None else None,
    )


# ---------------------------------------------------------------------------
# Pass 1: Filter(CROSS Join) → INNER Join with equi conds
# ---------------------------------------------------------------------------


def _split_conjuncts(e: E.Expr) -> List[E.Expr]:
    if isinstance(e, E.BinOp) and e.op == E.BinOpKind.AND:
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _and_all(conds: List[E.Expr]) -> Optional[E.Expr]:
    if not conds:
        return None
    out = conds[0]
    from heavydb_tpu import types as T

    for c in conds[1:]:
        out = E.BinOp(E.BinOpKind.AND, out, c,
                      T.boolean(out.type.nullable or c.type.nullable))
    return out


def _refs_sides(e: E.Expr, left_arity: int, total: int):
    refs = E.collect_input_refs(e)
    l = any(r.field_idx < left_arity for r in refs)
    r = any(r.field_idx >= left_arity for r in refs)
    return l, r


def _hoist_cross_join_filters(node: R.RelNode) -> R.RelNode:
    node.inputs = [_hoist_cross_join_filters(i) for i in node.inputs]
    if isinstance(node, R.Filter) and isinstance(node.inputs[0], R.Join):
        join = node.inputs[0]
        la = join.inputs[0].arity
        total = join.arity
        conjs = _split_conjuncts(node.condition)
        to_join, keep = [], []
        for c in conjs:
            l, r = _refs_sides(c, la, total)
            if l and r and join.kind in ("CROSS", "INNER"):
                to_join.append(c)
            else:
                keep.append(c)
        if to_join:
            new_cond = _and_all(
                ([join.condition] if join.condition is not None else []) + to_join
            )
            new_join = R.Join(join.inputs[0], join.inputs[1], "INNER", new_cond)
            if keep:
                return R.Filter(new_join, _and_all(keep))
            return new_join
    return node


# ---------------------------------------------------------------------------
# Pass 2: fuse into Compound
# ---------------------------------------------------------------------------


def _extract_source(node: R.RelNode):
    """Decompose a Filter/Join chain into (inputs, join_levels, filter_cond).
    The combined schema of `inputs` equals node's output schema."""
    if isinstance(node, R.Filter):
        if isinstance(node.inputs[0], (R.Filter, R.Join, R.Scan)):
            inputs, levels, cond = _extract_source(node.inputs[0])
            conds = ([cond] if cond is not None else []) + [node.condition]
            return inputs, levels, _and_all(conds)
        return [_fuse(node.inputs[0])], [], node.condition
    if isinstance(node, R.Join):
        # left-deep flatten: the left side may itself be a join chain
        l_inputs, l_levels, l_cond = _extract_source(node.inputs[0])
        right = _fuse(node.inputs[1])
        # SEMI/ANTI levels hide their build fields from the planner's index
        # space: conditions of levels stacked above them were numbered with
        # visible (left-node) arity — shift build-side refs to combined space
        visible = node.inputs[0].arity
        combined = sum(i.arity for i in l_inputs)
        cond = node.condition
        if cond is not None and combined != visible:
            delta = combined - visible

            def shift(e):
                if isinstance(e, E.InputRef) and e.field_idx >= visible:
                    import dataclasses

                    return dataclasses.replace(
                        e, field_idx=e.field_idx + delta
                    )
                return e

            cond = E.rewrite(cond, shift)
        levels = l_levels + [(node.kind, cond)]
        # filters between joins stay as part of the final filter only for
        # INNER joins (safe to reorder); outer joins break the chain — a
        # pre-join filter hoisted above a LEFT/FULL join would drop the
        # null-extended rows it should never see
        if l_cond is not None and node.kind in ("LEFT", "FULL"):
            left = _fuse(node.inputs[0])
            return [left, right], [(node.kind, node.condition)], None
        return l_inputs + [right], levels, l_cond
    if isinstance(node, R.Scan):
        return [node], [], None
    return [_fuse(node)], [], None


def _inline_projections(source: R.RelNode, exprs_lists):
    """While `source` is a pure Project over a fusable chain, substitute its
    output expressions into every expression of `exprs_lists` (lists are
    rewritten IN PLACE) and descend — so Aggregate(Project(Filter(Scan)))
    becomes one Compound instead of materializing the projection
    (reference: create_compound coalesces Project into the work unit)."""
    node = source
    while isinstance(node, R.Project) and isinstance(
        node.inputs[0], (R.Filter, R.Join, R.Scan)
    ):
        pex = node.exprs

        def sub(e):
            if isinstance(e, E.InputRef):
                return pex[e.field_idx]
            return e

        for lst in exprs_lists:
            for i, e in enumerate(lst):
                if e is not None:
                    lst[i] = E.rewrite(e, sub)
        node = node.inputs[0]
    return node


def _identity_targets(node: R.RelNode):
    return [
        E.InputRef(0, i, t) for i, t in enumerate(node.types)
    ], list(node.fields)


def _fuse(node: R.RelNode) -> R.RelNode:
    if isinstance(node, (R.Scan, R.Values, R.TableData)):
        return node
    if isinstance(node, R.Sort):
        node.inputs = [_fuse(node.inputs[0])]
        return node
    if isinstance(node, R.Union):
        node.inputs = [_fuse(i) for i in node.inputs]
        return node
    if isinstance(node, R.Compound):
        node.inputs = [_fuse(i) for i in node.inputs]
        return node
    if isinstance(node, R.Window):
        node.inputs = [_fuse(node.inputs[0])]
        return node
    if isinstance(node, R.Unnest):
        node.inputs = [_fuse(node.inputs[0])]
        return node

    if isinstance(node, R.Project):
        inner = node.inputs[0]
        having = None
        agg = None
        if isinstance(inner, R.Filter) and isinstance(inner.inputs[0], R.Aggregate):
            having = inner.condition
            agg = inner.inputs[0]
        elif isinstance(inner, R.Aggregate):
            agg = inner
        if agg is not None:
            groups = list(agg.group_exprs)
            aggs = list(agg.agg_exprs)
            hv = [having]
            src = _inline_projections(agg.inputs[0], [groups, aggs, hv])
            inputs, levels, fcond = _extract_source(src)
            return R.Compound(
                inputs, levels, fcond, groups, aggs,
                node.exprs, node.fields, hv[0],
            )
        inputs, levels, fcond = _extract_source(inner)
        return R.Compound(
            inputs, levels, fcond, [], [], node.exprs, node.fields, None
        )

    if isinstance(node, R.Aggregate):
        # bare Aggregate (DISTINCT wrapper): identity projection over outputs
        groups = list(node.group_exprs)
        aggs_l = list(node.agg_exprs)
        src = _inline_projections(node.inputs[0], [groups, aggs_l])
        node.group_exprs = groups
        node.agg_exprs = aggs_l
        inputs, levels, fcond = _extract_source(src)
        n_keys = len(node.group_exprs)
        targets = []
        for i, t in enumerate(node.types):
            if i < n_keys:
                dref = getattr(node.group_exprs[i], "dict_ref", None)
            else:
                a = node.agg_exprs[i - n_keys]
                dref = (
                    getattr(a.arg, "dict_ref", None)
                    if a.kind in (E.AggKind.MIN, E.AggKind.MAX,
                                  E.AggKind.SAMPLE, E.AggKind.SINGLE_VALUE,
                                  E.AggKind.MODE)
                    else None
                )
            targets.append(E.InputRef(0, i, t, dref))
        return R.Compound(
            inputs, levels, fcond, node.group_exprs, node.agg_exprs,
            targets, node.fields, None,
        )

    if isinstance(node, R.Filter):
        inputs, levels, fcond = _extract_source(node)
        targets, names = _identity_targets(node)
        return R.Compound(inputs, levels, fcond, [], [], targets, names, None)

    if isinstance(node, R.Join):
        inputs, levels, fcond = _extract_source(node)
        targets, names = _identity_targets(node)
        return R.Compound(inputs, levels, fcond, [], [], targets, names, None)

    raise AssertionError(f"unhandled node {type(node).__name__}")


# ---------------------------------------------------------------------------
# Pass 4: dead-column elimination (reference RelAlgOptimizer.cpp
# eliminate_dead_columns) — a Compound child consumed by exactly one
# Compound parent computes only the targets the parent actually references;
# the parent's combined-domain InputRefs are remapped to the trimmed
# layout.  Scan pruning is separate (the executor fetches only referenced
# scan columns); this pass shrinks INTERMEDIATE results and their kernels.
# ---------------------------------------------------------------------------


def _consumer_counts(root: R.RelNode):
    counts: dict = {}
    seen = set()

    def walk(n):
        if n.id in seen:
            return
        seen.add(n.id)
        for i in n.inputs:
            counts[i.id] = counts.get(i.id, 0) + 1
            walk(i)

    counts[root.id] = 1
    walk(root)
    return counts


def _input_domain_exprs(node: R.Compound):
    """Exprs of `node` that reference the COMBINED INPUT domain (an agg
    Compound's targets/having reference the post-agg domain instead)."""
    for _, c in node.join_levels:
        if c is not None:
            yield c
    if node.filter_cond is not None:
        yield node.filter_cond
    yield from node.group_exprs
    yield from node.aggs
    if not node.is_aggregate:
        yield from node.target_exprs


def _prune_dead_columns(node: R.RelNode, counts=None, seen=None) -> R.RelNode:
    if counts is None:
        counts = _consumer_counts(node)
        seen = set()
    if node.id in seen:
        return node
    seen.add(node.id)
    for i in node.inputs:
        _prune_dead_columns(i, counts, seen)
    if not isinstance(node, R.Compound) or not node.inputs:
        return node

    offsets = []
    off = 0
    for i in node.inputs:
        offsets.append(off)
        off += i.arity

    needed_local = [set() for _ in node.inputs]
    for e in _input_domain_exprs(node):
        for r in E.collect_input_refs(e):
            for i in reversed(range(len(node.inputs))):
                if r.field_idx >= offsets[i]:
                    needed_local[i].add(r.field_idx - offsets[i])
                    break

    new_offsets = []
    field_map = {}
    noff = 0
    trimmed_any = False
    for i, child in enumerate(node.inputs):
        new_offsets.append(noff)
        keep = sorted(needed_local[i])
        if (
            isinstance(child, R.Window)
            and counts.get(child.id, 0) == 1
            and node.inputs.count(child) == 1
        ):
            # drop window functions whose outputs the (sole) consumer
            # never references — each dropped wfunc saves its segmented
            # scans AND the materialization of a full-width column
            # (reference RelAlgOptimizer.cpp eliminate_dead_columns
            # covers RelProject window exprs the same way)
            base = child.inputs[0].arity
            keep_w = [j for j in range(len(child.wfuncs))
                      if base + j in needed_local[i]]
            if len(keep_w) < len(child.wfuncs):
                child.wfuncs = [child.wfuncs[j] for j in keep_w]
                child.fields = (list(child.fields[:base])
                                + [f"$w{r}" for r in range(len(keep_w))])
                child.types = (list(child.types[:base])
                               + [w.type for w in child.wfuncs])
                for j in range(base):
                    field_map[offsets[i] + j] = noff + j
                for rank, j in enumerate(keep_w):
                    field_map[offsets[i] + base + j] = noff + base + rank
                noff += base + len(keep_w)
                trimmed_any = True
                _PRUNE_CHANGED[0] = True
                continue
        trim = (
            isinstance(child, R.Compound)
            and counts.get(child.id, 0) == 1
            and node.inputs.count(child) == 1
            and 0 < len(keep) < child.arity
        )
        if trim:
            child.target_exprs = [child.target_exprs[j] for j in keep]
            child.types = [child.types[j] for j in keep]
            if getattr(child, "fields", None):
                child.fields = [child.fields[j] for j in keep]
            if child.is_aggregate:
                _trim_unused_aggs(child)
            for rank, j in enumerate(keep):
                field_map[offsets[i] + j] = noff + rank
            noff += len(keep)
            trimmed_any = True
            _PRUNE_CHANGED[0] = True
        else:
            for j in range(child.arity):
                field_map[offsets[i] + j] = noff + j
            noff += child.arity

    if not trimmed_any:
        return node

    def subst(e):
        if isinstance(e, E.InputRef) and e.field_idx in field_map:
            import dataclasses

            return dataclasses.replace(e, field_idx=field_map[e.field_idx])
        return e

    node.join_levels = [
        (k, E.rewrite(c, subst) if c is not None else None)
        for k, c in node.join_levels
    ]
    if node.filter_cond is not None:
        node.filter_cond = E.rewrite(node.filter_cond, subst)
    node.group_exprs = [E.rewrite(g, subst) for g in node.group_exprs]
    node.aggs = [_rewrite_agg(a, subst) for a in node.aggs]
    if not node.is_aggregate:
        node.target_exprs = [E.rewrite(t, subst) for t in node.target_exprs]
    return node


def _trim_unused_aggs(child: R.Compound) -> None:
    """After an agg Compound's targets were trimmed, drop aggregates the
    remaining targets/having no longer reference (group keys always stay —
    they define the grouping).  Post-agg field space = keys ++ aggs."""
    n_keys = len(child.group_exprs)
    used = set()
    exprs = list(child.target_exprs) + (
        [child.having] if child.having is not None else []
    )
    for e in exprs:
        for r in E.collect_input_refs(e):
            used.add(r.field_idx)
    keep_aggs = [
        j for j in range(len(child.aggs)) if (n_keys + j) in used
    ]
    if len(keep_aggs) == len(child.aggs):
        return
    amap = {}
    for rank, j in enumerate(keep_aggs):
        amap[n_keys + j] = n_keys + rank
    for k in range(n_keys):
        amap[k] = k
    child.aggs = [child.aggs[j] for j in keep_aggs]

    def subst(e):
        if isinstance(e, E.InputRef) and e.field_idx in amap:
            import dataclasses

            return dataclasses.replace(e, field_idx=amap[e.field_idx])
        return e

    child.target_exprs = [E.rewrite(t, subst) for t in child.target_exprs]
    if child.having is not None:
        child.having = E.rewrite(child.having, subst)
