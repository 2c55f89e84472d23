"""SELECT statement → RelAlg DAG.

The logic Calcite performs for the reference (scope building over the FROM
tree, aggregate splitting, HAVING/ORDER BY resolution, set-op assembly) —
rebuilt natively over plan/builder.ExprBinder.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from heavydb_tpu import types as T
from heavydb_tpu.errors import BinderError, NotSupported
from heavydb_tpu.plan import exprs as E
from heavydb_tpu.plan import rel_alg as R
from heavydb_tpu.plan.builder import ExprBinder, Scope
from heavydb_tpu.sql import ast as A


def _mentions_rowid(node) -> bool:
    """Does this AST (including subqueries) reference the `rowid`
    pseudo-column or SAMPLE_RATIO?  Drives whether base-table scans
    expose the hidden rowid field (reference: Catalog's virtual rowid
    column exists on every physical table; we materialize it only on
    demand)."""
    import dataclasses as _dc

    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, A.Identifier):
            if n.parts and n.parts[-1].lower() == "rowid":
                return True
            continue
        if isinstance(n, A.FuncCall) and n.name.upper() == "SAMPLE_RATIO":
            return True
        if _dc.is_dataclass(n) and not isinstance(n, type):
            for f in _dc.fields(n):
                stack.append(getattr(n, f.name))
        elif isinstance(n, (list, tuple)):
            stack.extend(n)
    return False


def plan_has_outer_refs(node: R.RelNode) -> bool:
    from heavydb_tpu.api import _iter_all_exprs

    for n in R.topo_order(node):
        for e in _iter_all_exprs(n):
            for sub in E.walk(e):
                if isinstance(sub, E.OuterRef):
                    return True
    return False


class SelectPlanner:
    def __init__(self, db, cte_env: Optional[Dict[str, R.RelNode]] = None,
                 outer_scope=None):
        self.db = db  # Database facade (catalog access + subquery planning)
        self.cte_env = dict(cte_env or {})
        self.outer_scope = outer_scope

    # ------------------------------------------------------------------
    def plan(self, sel: A.Select) -> R.RelNode:
        # CTEs extend the environment for this select and its children
        env = dict(self.cte_env)
        for name, cte_sel in sel.ctes:
            env[name.lower()] = SelectPlanner(self.db, env).plan(cte_sel)
        if getattr(sel, "grouping_sets", None):
            return self._plan_grouping_sets(sel, env)
        apply_order_inline = not sel.set_ops
        core = self._plan_core(sel, env, apply_order=apply_order_inline)

        for op, rhs_sel in sel.set_ops:
            rhs = SelectPlanner(self.db, env)._plan_core(
                rhs_sel, env, apply_order=False
            )
            if rhs.arity != core.arity:
                raise BinderError("set-op inputs must have same column count")
            if op in ("UNION", "UNION ALL"):
                core = self._make_union(core, rhs, all_=(op == "UNION ALL"))
            else:
                core = self._make_intersect_except(core, rhs, op)

        if not apply_order_inline:
            core = self._apply_order_limit(core, sel)
        return core

    def _plan_grouping_sets(self, sel: A.Select, env) -> R.RelNode:
        """Desugar GROUPING SETS / ROLLUP / CUBE into a UNION ALL of
        per-set aggregations (reference: Calcite expands these the same
        way before the RA reaches the engine).  In each branch, select
        items referencing a group expr NOT in the branch's set evaluate
        to NULL."""
        import copy
        import dataclasses as _dc

        all_exprs = []
        for s in sel.grouping_sets:
            for e in s:
                if not any(e == x for x in all_exprs):
                    all_exprs.append(e)

        def drop_to_null(node, dropped):
            if any(node == d for d in dropped):
                return A.Literal(None, "null")
            if _dc.is_dataclass(node) and isinstance(node, A.Node):
                kw = {}
                for f in _dc.fields(node):
                    v = getattr(node, f.name)
                    if isinstance(v, A.Node):
                        kw[f.name] = drop_to_null(v, dropped)
                    elif isinstance(v, (list, tuple)):
                        nv = [
                            drop_to_null(x, dropped)
                            if isinstance(x, A.Node) else x
                            for x in v
                        ]
                        kw[f.name] = type(v)(nv) if isinstance(v, tuple) \
                            else nv
                    else:
                        kw[f.name] = v
                return _dc.replace(node, **kw)
            return node

        # typing probe: plan (never execute) the query grouped by ALL
        # referenced group exprs — its output types type the NULL-filled
        # columns of every real branch
        probe = copy.deepcopy(sel)
        probe.grouping_sets = None
        probe.set_ops = []
        probe.order_by = []
        probe.limit = None
        probe.offset = None
        probe.ctes = []
        probe.group_by = list(all_exprs)
        base_types = list(SelectPlanner(self.db, env)._plan_core(
            probe, env, apply_order=False
        ).types)

        core = None
        for gset in sel.grouping_sets:
            dropped = [
                e for e in all_exprs if not any(e == g for g in gset)
            ]
            branch = copy.deepcopy(sel)
            branch.grouping_sets = None
            branch.set_ops = []
            branch.order_by = []
            branch.limit = None
            branch.offset = None
            branch.ctes = []
            branch.group_by = list(gset)
            branch.projections = [
                (drop_to_null(e, dropped) if e is not None else e, nm)
                for e, nm in branch.projections
            ]
            # bare NULL projections take the probe's column type so every
            # branch's Compound materializes a typed column (NULLT has no
            # device representation)
            branch.projections = [
                (
                    A.Cast(e, A.TypeName(base_types[i].sql_name()))
                    if isinstance(e, A.Literal) and e.kind == "null"
                    and not base_types[i].is_null_type else e,
                    nm,
                )
                for i, (e, nm) in enumerate(branch.projections)
            ]
            if branch.having is not None:
                branch.having = drop_to_null(branch.having, dropped)
            rhs = SelectPlanner(self.db, env)._plan_core(
                branch, env, apply_order=False
            )
            core = rhs if core is None else self._make_union(
                core, rhs, all_=True
            )
        return self._apply_order_limit(core, sel)

    def _make_union(self, left, right, all_: bool) -> R.RelNode:
        # coerce right columns to left's types where needed
        casts = []
        need = False
        for i, (lt, rt) in enumerate(zip(left.types, right.types)):
            ref = E.InputRef(0, i, rt, _node_dict_ref(right, i))
            if lt.is_dict_string and rt.is_dict_string:
                lref = _node_dict_ref(left, i)
                rref = _node_dict_ref(right, i)
                if lref != rref:
                    if lref is None or rref is None:
                        raise NotSupported(
                            "UNION over untracked string dictionaries"
                        )
                    # translate right ids into left's dictionary at launch
                    # (reference StringDictionaryTranslationMgr); unseen
                    # strings are interned into the target
                    casts.append(E.StringTransform(
                        arg=ref, ops=(("IDENTITY", ()),),
                        src_dict_ref=rref, dict_ref=lref,
                        type=T.text_dict(nullable=rt.nullable),
                    ))
                    need = True
                    continue
                casts.append(ref)
            elif lt.kind != rt.kind or (lt.is_decimal and lt.scale != rt.scale):
                if lt.is_dict_string or rt.is_dict_string:
                    raise NotSupported("UNION with mismatched string columns")
                casts.append(E.Cast(ref, T.common_numeric_type(lt, rt)))
                need = True
            else:
                casts.append(ref)
        if need:
            right = R.Project(right, casts, left.fields)
        u = R.Union([left, right], all_)
        u.dict_refs = [_node_dict_ref(left, i) for i in range(left.arity)]
        if not all_:
            # UNION DISTINCT = group by all columns
            keys = [
                E.InputRef(0, i, t, u.dict_refs[i])
                for i, t in enumerate(u.types)
            ]
            u = R.Aggregate(u, keys, [], list(u.fields))
        return u

    def _make_intersect_except(self, left, right, op: str) -> R.RelNode:
        """INTERSECT/EXCEPT via tagged union + group-by over all columns +
        per-side COUNT_IF — NULLs group together, giving correct SQL set
        semantics (unlike a join formulation)."""
        side_t = T.integer(nullable=False)

        def tag(node, side):
            exprs = [
                E.InputRef(0, i, t, _node_dict_ref(node, i))
                for i, t in enumerate(node.types)
            ] + [E.Constant(side, side_t)]
            return R.Project(node, exprs, list(node.fields) + ["$side"])

        # coerce right to left's types first (reuse union's cast logic)
        u_all = self._make_union(tag(left, 0), tag(right, 1), all_=True)
        n = left.arity
        keys = [
            E.InputRef(0, i, t, _node_dict_ref(u_all, i))
            for i, t in enumerate(left.types)
        ]
        side_ref = E.InputRef(0, n, side_t)
        zero = E.Constant(0, side_t)
        one = E.Constant(1, side_t)
        cnt_l = E.Agg(E.AggKind.COUNT_IF, None, False, T.bigint(False),
                      E.BinOp(E.BinOpKind.EQ, side_ref, zero, T.boolean(False)))
        cnt_r = E.Agg(E.AggKind.COUNT_IF, None, False, T.bigint(False),
                      E.BinOp(E.BinOpKind.EQ, side_ref, one, T.boolean(False)))
        agg = R.Aggregate(u_all, keys, [cnt_l, cnt_r],
                          list(left.fields) + ["$cl", "$cr"])
        cl = E.InputRef(0, n, T.bigint(False))
        cr = E.InputRef(0, n + 1, T.bigint(False))
        if op == "INTERSECT":
            cond = E.BinOp(
                E.BinOpKind.AND,
                E.BinOp(E.BinOpKind.GT, cl, E.Constant(0, T.bigint(False)),
                        T.boolean(False)),
                E.BinOp(E.BinOpKind.GT, cr, E.Constant(0, T.bigint(False)),
                        T.boolean(False)),
                T.boolean(False),
            )
        else:  # EXCEPT
            cond = E.BinOp(
                E.BinOpKind.AND,
                E.BinOp(E.BinOpKind.GT, cl, E.Constant(0, T.bigint(False)),
                        T.boolean(False)),
                E.BinOp(E.BinOpKind.EQ, cr, E.Constant(0, T.bigint(False)),
                        T.boolean(False)),
                T.boolean(False),
            )
        filt = R.Filter(agg, cond)
        keep = [
            E.InputRef(0, i, t, _node_dict_ref(agg, i))
            for i, t in enumerate(left.types)
        ]
        return R.Project(filt, keep, list(left.fields))

    # ------------------------------------------------------------------
    def _plan_core(self, sel: A.Select, env, apply_order: bool = False) -> R.RelNode:
        # CTEs of this select (and enclosing ones) are visible to every
        # binder below, including inside subqueries (SQL name scoping)
        self._env = env
        # expose the virtual rowid field on base-table scans only when the
        # query (or a subquery of it) references rowid / SAMPLE_RATIO
        self._uses_rowid = _mentions_rowid(sel)
        scope = Scope()
        rel = self._plan_from(sel.from_, scope, env)

        binder = ExprBinder(scope, self.db, allow_aggs=False,
                            outer_scope=self.outer_scope,
                            cte_env=self._env)

        # WHERE — correlated EXISTS/IN conjuncts decorrelate into SEMI/ANTI
        # joins (reference: hash-join existence quals); the rest filters
        if sel.where is not None:
            cond = binder.bind_condition(sel.where)
            if E.is_aggregate(cond):
                raise BinderError("aggregates not allowed in WHERE")
            rel, cond = self._decorrelate_where(rel, cond)
            rel, cond = self._decorrelate_scalar(rel, cond)
            if cond is not None:
                rel = R.Filter(rel, cond)

        # expand stars, bind projections
        proj_items: List[Tuple[E.Expr, str]] = []
        agg_binder = ExprBinder(scope, self.db, allow_aggs=True, cte_env=self._env)
        for expr_ast, alias in sel.projections:
            if isinstance(expr_ast, A.Star):
                for name, fb in scope.all_fields(expr_ast.table):
                    proj_items.append(
                        (E.InputRef(0, fb.field_idx, fb.type, fb.dict_ref), name)
                    )
                continue
            e = agg_binder.bind(expr_ast)
            # bare string literals in the select list → transient dict ids
            # (TEXT has no direct device representation)
            if (
                isinstance(e, E.Constant)
                and e.type.is_string
                and not e.type.is_dict_string
                and e.value is not None
            ):
                ref, td = self.db.register_transient_dict()
                e = E.Constant(
                    td.get_or_add(str(e.value)),
                    T.text_dict(nullable=False),
                    dict_ref=ref,
                )
            name = alias or _auto_name(expr_ast, len(proj_items))
            rel, e = self._decorrelate_scalar(rel, e)
            proj_items.append((e, name))

        # UNNEST expansion — one row per array element, before aggregation
        # (reference: Calcite rewrites SELECT-list UNNEST into a correlated
        # join over an array iterator)
        unnest_keys = {}
        for e, _ in proj_items:
            for n_ in E.walk(e):
                if isinstance(n_, E.ArrayFn) and n_.op == "UNNEST":
                    unnest_keys.setdefault(n_.key(), n_)
        if unnest_keys:
            if len(unnest_keys) > 1:
                raise NotSupported("multiple distinct UNNEST expressions")
            u = next(iter(unnest_keys.values()))
            base_arity = rel.arity
            rel = R.Unnest(rel, u)

            def _swap_unnest(e_):
                if isinstance(e_, E.ArrayFn) and e_.op == "UNNEST":
                    return E.InputRef(0, base_arity, u.type, u.dict_ref)
                return e_

            proj_items = [
                (E.rewrite(e, _swap_unnest), n) for e, n in proj_items
            ]

        has_aggs = bool(sel.group_by) or any(
            E.is_aggregate(e) for e, _ in proj_items
        ) or (sel.having is not None)

        # separate window expressions into their own step (reference
        # separate_window_function_expressions, RelAlgDag.cpp)
        has_windows = any(
            isinstance(n_, E.WindowFunc)
            for e, _ in proj_items
            for n_ in E.walk(e)
        )
        if has_windows:
            if has_aggs:
                raise NotSupported(
                    "window functions combined with GROUP BY/aggregates"
                )
            rel, proj_items = self._plan_windows(rel, proj_items)

        rewrite_fn = None
        if has_aggs:
            rel, rewrite_fn = self._plan_aggregate(sel, rel, scope, proj_items)
        else:
            rel = R.Project(
                rel, [e for e, _ in proj_items], [n for _, n in proj_items]
            )

        if sel.distinct:
            keys = [
                E.InputRef(0, i, t, _node_dict_ref(rel, i))
                for i, t in enumerate(rel.types)
            ]
            rel = R.Aggregate(rel, keys, [], list(rel.fields))
            rewrite_fn = None  # DISTINCT output: order keys must be in list

        if apply_order and (sel.order_by or sel.limit is not None or sel.offset):
            rel = self._apply_order_rich(
                rel, sel, scope, rewrite_fn, has_aggs or sel.distinct
            )
        return rel

    # ------------------------------------------------------------------
    def _decorrelate_where(self, rel, cond):
        """Pull correlated EXISTS/IN conjuncts out of the WHERE condition and
        turn them into SEMI/ANTI joins on `rel`."""
        from heavydb_tpu.plan.optimizer import _and_all, _split_conjuncts

        conjs = _split_conjuncts(cond)
        keep = []
        for c in conjs:
            anti = False
            sub = c
            if isinstance(c, E.UnOp) and c.op == E.UnOpKind.NOT and \
                    isinstance(c.operand, E.SubqueryExpr):
                sub = c.operand
                anti = True
            if not (isinstance(sub, E.SubqueryExpr) and sub.correlated
                    and sub.kind in ("exists", "in")):
                keep.append(c)
                continue
            if sub.negated:
                anti = not anti
            rel = self._build_existence_join(rel, sub, anti)
        return rel, _and_all(keep)

    def _decorrelate_scalar(self, rel, expr):
        """Rewrite each correlated SCALAR subquery inside `expr` (the
        aggregate-over-correlated-equality shape: TPC-H Q2/Q11/Q17) into a
        LEFT JOIN of `rel` against the subquery re-grouped by its
        correlation keys; the subquery expr becomes an InputRef to the
        joined aggregate column (reference: Calcite RelDecorrelator /
        RelAlgDag.cpp subquery unnesting).  Returns (new_rel, new_expr)."""
        import dataclasses

        from heavydb_tpu.plan.optimizer import _and_all

        if expr is None:
            return rel, None
        subs = [
            s for s in E.walk(expr)
            if isinstance(s, E.SubqueryExpr) and s.kind == "scalar"
            and s.correlated
        ]
        if not subs:
            return rel, expr
        replacements = {}
        for sub in subs:
            if id(sub) in replacements:
                continue
            plan = sub.plan
            if not isinstance(plan, R.Project):
                raise NotSupported("correlated scalar subquery shape")
            # optional HAVING filters sit between Project and Aggregate
            having = []
            agg = plan.inputs[0]
            while isinstance(agg, R.Filter):
                having.append(agg.condition)
                agg = agg.inputs[0]
            if not isinstance(agg, R.Aggregate) or agg.group_exprs:
                raise NotSupported(
                    "correlated scalar subquery must be a single aggregate"
                )
            filters = []
            base = agg.inputs[0]
            while isinstance(base, R.Filter):
                filters.append(base.condition)
                base = base.inputs[0]
            # equality-only: the regrouping needs hashable correlation keys
            pairs, residual, extras = self._correlated_pairs(filters)
            if extras or not pairs:
                raise NotSupported(
                    "correlated scalar subquery without equi predicates"
                )
            sq = base
            resid = _and_all(residual)
            if resid is not None:
                sq = R.Filter(sq, resid)
            inner_keys = [ie for _, ie in pairs]
            n_keys = len(inner_keys)
            new_agg = R.Aggregate(
                sq, inner_keys, agg.agg_exprs,
                [f"$ck{i}" for i in range(n_keys)]
                + [f"$agg{i}" for i in range(len(agg.agg_exprs))],
            )

            def shift(e):
                # original plan's refs address [aggs...]; now [keys ++ aggs]
                if isinstance(e, E.InputRef):
                    return dataclasses.replace(
                        e, field_idx=e.field_idx + n_keys
                    )
                return e

            out: R.RelNode = new_agg
            for h in reversed(having):
                out = R.Filter(out, E.rewrite(h, shift))
            scalar_e = E.rewrite(plan.exprs[0], shift)
            key_refs = [
                E.InputRef(0, i, new_agg.types[i],
                           getattr(inner_keys[i], "dict_ref", None))
                for i in range(n_keys)
            ]
            new_proj = R.Project(
                out, [scalar_e] + key_refs,
                [plan.fields[0]] + [f"$ck{i}" for i in range(n_keys)],
            )
            conds = []
            for i, (outer_probe, _ie) in enumerate(pairs):
                conds.append(E.BinOp(
                    E.BinOpKind.EQ, outer_probe,
                    E.InputRef(0, rel.arity + 1 + i, new_proj.types[1 + i]),
                    T.boolean(True),
                ))
            scalar_idx = rel.arity
            rel = R.Join(rel, new_proj, "LEFT", _and_all(conds))
            ref = E.InputRef(0, scalar_idx, sub.type,
                             getattr(scalar_e, "dict_ref", None))
            rep: E.Expr = ref
            # COUNT over an empty correlated set is 0, but the LEFT-join
            # miss yields NULL — coalesce when the scalar is a bare COUNT
            if (
                isinstance(plan.exprs[0], E.InputRef)
                and plan.exprs[0].field_idx < len(agg.agg_exprs)
                and agg.agg_exprs[plan.exprs[0].field_idx].kind
                in (E.AggKind.COUNT, E.AggKind.COUNT_IF,
                    E.AggKind.COUNT_DISTINCT)
            ):
                rep = E.Case(
                    whens=((E.UnOp(E.UnOpKind.ISNULL, ref,
                                   T.boolean(False)),
                            E.Constant(0, sub.type.with_nullable(False))),),
                    else_=ref, type=sub.type.with_nullable(False),
                )
            replacements[id(sub)] = rep

        def swap(e):
            return replacements.get(id(e), e)

        return rel, E.rewrite(expr, swap)

    @staticmethod
    def _correlated_pairs(filters, allow_noneq: bool = False):
        """Split filter conjuncts into (outer_probe, inner_expr) equality
        pairs and outer-free residual conjuncts.  outer_probe has OuterRefs
        rewritten to InputRefs over the ENCLOSING query's schema.  With
        `allow_noneq`, correlated comparison conjuncts (outer-vs-inner,
        any operator) come back as extras: (op, outer_probe, inner_expr,
        outer_is_left) — the caller turns them into residual join
        conditions (TPC-H Q4/Q21's l_shipdate > o_orderdate)."""
        from heavydb_tpu.plan.optimizer import _split_conjuncts

        _CMP = (E.BinOpKind.EQ, E.BinOpKind.NE, E.BinOpKind.LT,
                E.BinOpKind.LE, E.BinOpKind.GT, E.BinOpKind.GE)
        pairs = []  # (outer_expr, inner_expr)
        residual = []
        extras = []  # (op, outer_probe, inner_expr, outer_is_left)
        for f in filters:
            for c in _split_conjuncts(f):
                has_outer = any(
                    isinstance(x, E.OuterRef) for x in E.walk(c)
                )
                if not has_outer:
                    residual.append(c)
                    continue
                ok = isinstance(c, E.BinOp) and (
                    c.op == E.BinOpKind.EQ
                    or (allow_noneq and c.op in _CMP)
                )
                if ok:
                    l_out = any(isinstance(x, E.OuterRef) for x in E.walk(c.left))
                    r_out = any(isinstance(x, E.OuterRef) for x in E.walk(c.right))
                    if l_out and not r_out:
                        outer_e, inner_e, outer_left = c.left, c.right, True
                    elif r_out and not l_out:
                        outer_e, inner_e, outer_left = c.right, c.left, False
                    else:
                        ok = False
                if not ok:
                    raise NotSupported(
                        "correlated predicate must be a comparison between an "
                        "outer expression and a subquery expression"
                    )
                # outer side must be PURE outer (becomes a probe-side expr)
                def to_inner_ref(e):
                    if isinstance(e, E.OuterRef):
                        return E.InputRef(0, e.field_idx, e.type, e.dict_ref)
                    return e

                outer_probe = E.rewrite(outer_e, to_inner_ref)
                if any(isinstance(x, E.OuterRef) for x in E.walk(inner_e)):
                    raise NotSupported("mixed correlated predicate")
                if c.op == E.BinOpKind.EQ:
                    pairs.append((outer_probe, inner_e))
                else:
                    extras.append((c.op, outer_probe, inner_e, outer_left))
        return pairs, residual, extras

    def _build_existence_join(self, rel, sub: E.SubqueryExpr, anti: bool):
        """Decorrelate one EXISTS/IN subquery into a SEMI/ANTI join."""
        plan = sub.plan
        # peel Project/Filter chain; collect filter conjuncts over `base`
        if not isinstance(plan, R.Project):
            raise NotSupported("cannot decorrelate this subquery shape")
        proj = plan
        filters = []
        base = proj.inputs[0]
        while isinstance(base, R.Filter):
            filters.append(base.condition)
            base = base.inputs[0]
        from heavydb_tpu.plan.optimizer import _and_all

        pairs, residual, extras = self._correlated_pairs(
            filters, allow_noneq=True
        )
        if not pairs and not (sub.kind == "in" and sub.arg is not None):
            raise NotSupported("correlated subquery without equi predicates")
        # rebuild subplan: base + residual filters + projection of the
        # original outputs ++ the inner join-key/comparison exprs
        sq = base
        resid = _and_all(residual)
        if resid is not None:
            sq = R.Filter(sq, resid)
        inner_exprs = [p for _, p in pairs] + [x[2] for x in extras]
        new_proj = R.Project(
            sq,
            list(proj.exprs) + inner_exprs,
            list(proj.fields) + [f"$ck{i}" for i in range(len(inner_exprs))],
        )
        # join condition over combined schema [rel fields ++ subplan fields]
        base_idx = rel.arity + len(proj.exprs)
        conds = []
        for i, (outer_probe, inner_e) in enumerate(pairs):
            conds.append(E.BinOp(
                E.BinOpKind.EQ, outer_probe,
                E.InputRef(0, base_idx + i, inner_e.type),
                T.boolean(True),
            ))
        # correlated comparisons ride along as residual join conditions,
        # preserving operand orientation
        for j, (op, outer_probe, inner_e, outer_left) in enumerate(extras):
            iref = E.InputRef(0, base_idx + len(pairs) + j, inner_e.type)
            left, right = (outer_probe, iref) if outer_left \
                else (iref, outer_probe)
            conds.append(E.BinOp(op, left, right, T.boolean(True)))
        if sub.kind == "in":
            conds.append(E.BinOp(
                E.BinOpKind.EQ, sub.arg,
                E.InputRef(0, rel.arity + 0, plan.types[0]),
                T.boolean(True),
            ))
        cond = _and_all(conds)
        return R.Join(rel, new_proj, "ANTI" if anti else "SEMI", cond)

    # ------------------------------------------------------------------
    def _plan_windows(self, rel, proj_items):
        """Hoist WindowFunc exprs into a Window node below the projection."""
        wfuncs: List[E.WindowFunc] = []
        windex: Dict[tuple, int] = {}
        base_arity = rel.arity

        def hoist(e: E.Expr) -> E.Expr:
            if isinstance(e, E.WindowFunc):
                k = e.key()
                if k not in windex:
                    windex[k] = len(wfuncs)
                    wfuncs.append(e)
                return E.InputRef(
                    0, base_arity + windex[k], e.type, e.dict_ref
                )
            return e

        new_items = [(E.rewrite(e, hoist), n) for e, n in proj_items]
        wnode = R.Window(rel, wfuncs)
        return wnode, new_items

    # ------------------------------------------------------------------
    def _apply_order_rich(self, rel, sel, scope, rewrite_fn, restricted):
        """ORDER BY with fallback to non-projected source columns / exprs."""
        keys = []
        extra_exprs: List[E.Expr] = []
        extra_names: List[str] = []

        def resolve(item: A.OrderItem) -> int:
            e_ast = item.expr
            if isinstance(e_ast, A.Literal) and e_ast.kind == "num_int":
                idx = int(e_ast.value) - 1
                if not 0 <= idx < rel.arity:
                    raise BinderError(f"ORDER BY ordinal {e_ast.value} out of range")
                return idx
            if isinstance(e_ast, A.Identifier) and len(e_ast.parts) == 1:
                name = e_ast.parts[0].lower()
                for i, f in enumerate(rel.fields):
                    if f.lower() == name:
                        return i
            # bind against the source scope (aggregate-aware)
            b = ExprBinder(scope, self.db, allow_aggs=True, cte_env=self._env)
            e = b.bind(e_ast)
            if rewrite_fn is not None:
                e = rewrite_fn(e)
            elif restricted:
                raise BinderError(
                    "ORDER BY expression must appear in the DISTINCT select list"
                )
            # match existing projection exprs structurally
            if isinstance(rel, R.Project):
                for i, pe in enumerate(rel.exprs):
                    if pe.key() == e.key():
                        return i
            extra_exprs.append(e)
            extra_names.append(f"$sortkey{len(extra_exprs)}")
            return rel.arity + len(extra_exprs) - 1

        for item in sel.order_by:
            idx = resolve(item)
            nulls_first = item.nulls_first
            if nulls_first is None:
                nulls_first = not item.asc
            keys.append((idx, item.asc, nulls_first))

        base = rel
        if extra_exprs:
            if isinstance(rel, R.Project):
                # widen the projection with hidden sort keys
                base = R.Project(
                    rel.inputs[0],
                    list(rel.exprs) + extra_exprs,
                    list(rel.fields) + extra_names,
                )
            else:
                all_refs = [
                    E.InputRef(0, i, t, _node_dict_ref(rel, i))
                    for i, t in enumerate(rel.types)
                ]
                base = R.Project(
                    rel, all_refs + extra_exprs, list(rel.fields) + extra_names
                )
        for _ki, _, _ in keys:
            if base.types[_ki].is_array:
                raise BinderError("array columns cannot be ORDER BY keys")
        sorted_ = R.Sort(base, keys, sel.limit, sel.offset)
        if extra_exprs:
            keep = [
                E.InputRef(0, i, t, _node_dict_ref(sorted_, i))
                for i, t in enumerate(rel.types)
            ]
            return R.Project(sorted_, keep, list(rel.fields))
        return sorted_

    # ------------------------------------------------------------------
    def _plan_from(self, ref: Optional[A.TableRef], scope: Scope, env) -> R.RelNode:
        if ref is None:
            # SELECT without FROM: single-row Values
            return R.Values(["$dummy"], [T.integer(False)], [(0,)])
        return self._plan_table_ref(ref, scope, env)

    def _plan_table_ref(self, ref: A.TableRef, scope: Scope, env) -> R.RelNode:
        if isinstance(ref, A.NamedTable):
            key = ref.name.lower()
            if key in env:
                node = env[key]
                alias = ref.alias or ref.name
                dict_refs = [_node_dict_ref(node, i) for i in range(node.arity)]
                scope.add_relation(alias, node.fields, node.types, dict_refs)
                return node
            view = self.db._get_view(key)
            if view is not None:
                node = SelectPlanner(self.db, env).plan(view)
                alias = ref.alias or ref.name
                dict_refs = [_node_dict_ref(node, i) for i in range(node.arity)]
                scope.add_relation(alias, node.fields, node.types, dict_refs)
                return node
            table = self.db.catalog.get_table(ref.name)
            if hasattr(self.db, "ensure_foreign_loaded"):
                self.db.ensure_foreign_loaded(table)  # lazy FSI population
            with_rowid = getattr(self, "_uses_rowid", False) and not any(
                cd.name.lower() == "rowid" for cd in table.columns
            )
            node = R.Scan(table, with_rowid=with_rowid)
            alias = ref.alias or ref.name
            dict_refs = [
                (table.table_id, cd.col_id)
                if (cd.type.is_dict_string or cd.type.is_array
                    or cd.type.is_none_string) else None
                for cd in table.columns
            ]
            ncols = len(table.columns)
            scope.add_relation(
                alias, node.fields[:ncols], node.types[:ncols], dict_refs,
                hidden_fields=(
                    [("rowid", T.bigint(nullable=False))] if with_rowid
                    else ()
                ),
            )
            return node
        if isinstance(ref, A.SubqueryRef):
            node = SelectPlanner(self.db, env).plan(ref.select)
            alias = ref.alias or f"$subquery{len(scope.by_alias)}"
            dict_refs = [_node_dict_ref(node, i) for i in range(node.arity)]
            scope.add_relation(alias, node.fields, node.types, dict_refs)
            return node
        if isinstance(ref, A.TableFuncRef):
            node = self._exec_table_function(ref, env)
            alias = ref.alias or ref.name
            scope.add_relation(alias, node.fields, node.types, node.dict_refs)
            return node
        if isinstance(ref, A.JoinRef):
            left = self._plan_table_ref(ref.left, scope, env)
            left_arity = left.arity
            right = self._plan_table_ref(ref.right, scope, env)
            cond = None
            if ref.using:
                if ref.using == "NATURAL":
                    raise NotSupported("NATURAL JOIN")
                conds = None
                for col in ref.using:
                    c = A.Binary(
                        "=",
                        A.Identifier((_alias_of(ref.left), col)),
                        A.Identifier((_alias_of(ref.right), col)),
                    )
                    conds = c if conds is None else A.Binary("AND", conds, c)
                binder = ExprBinder(scope, self.db, allow_aggs=False, cte_env=self._env)
                cond = binder.bind_condition(conds)
            elif ref.condition is not None:
                binder = ExprBinder(scope, self.db, allow_aggs=False, cte_env=self._env)
                cond = binder.bind_condition(ref.condition)
            elif ref.kind != "CROSS":
                raise BinderError("JOIN requires a condition")
            return R.Join(left, right, ref.kind, cond)
        raise NotSupported(f"table ref {type(ref).__name__}")

    # ------------------------------------------------------------------
    def _exec_table_function(self, ref: A.TableFuncRef, env) -> R.TableData:
        """Execute a table function eagerly at plan time (args are constants;
        cursors are subqueries, which the reference also runs first)."""
        import numpy as np

        fn = self.db._table_functions.get(ref.name.lower())
        if fn is None:
            raise BinderError(f"unknown table function {ref.name!r}")
        scalar_args = []
        cursor = None
        empty_scope = Scope()
        binder = ExprBinder(empty_scope, self.db, allow_aggs=False, cte_env=self._env)
        for a in ref.args:
            if isinstance(a, A.Select):
                from heavydb_tpu.plan.optimizer import optimize

                plan = optimize(SelectPlanner(self.db, env).plan(a))
                batch = self.db.executor.execute(plan)
                host = batch.to_numpy()
                cursor = {}
                for i, f in enumerate(plan.fields):
                    arr = host[i]
                    ti = plan.types[i]
                    if ti.is_dict_string:
                        dref = _node_dict_ref(plan, i)
                        d = self.db.dict_by_ref(dref) if dref else None
                        arr = np.array(
                            d.get_strings(arr) if d else [None] * len(arr),
                            object,
                        )
                    cursor[f] = arr
                continue
            e = binder.bind(a)
            if not isinstance(e, E.Constant):
                raise NotSupported("table function arguments must be constant")
            v = e.value
            if e.type.is_decimal and v is not None:
                v = v / 10**e.type.scale
            scalar_args.append(v)
        out = fn(*scalar_args, cursor=cursor)
        names, types, arrays, dict_refs = [], [], [], []
        from heavydb_tpu.api import _infer_type

        for cname, arr in out.items():
            arr = np.asarray(arr)
            ti = _infer_type(arr)
            if ti.is_dict_string:
                tref, td = self.db.register_transient_dict()
                ids = td.get_or_add_bulk(list(arr))
                arrays.append(ids)
                dict_refs.append(tref)
            else:
                from heavydb_tpu.storage.table import to_physical

                arrays.append(to_physical(arr, ti))
                dict_refs.append(None)
            names.append(cname)
            types.append(ti)
        return R.TableData(names, types, arrays, dict_refs)

    # ------------------------------------------------------------------
    def _plan_aggregate(self, sel, rel, scope, proj_items) -> R.RelNode:
        binder = ExprBinder(scope, self.db, allow_aggs=False, cte_env=self._env)

        # bind GROUP BY items: ordinals, aliases, or expressions over input
        group_exprs: List[E.Expr] = []
        proj_exprs = [e for e, _ in proj_items]
        proj_names = [n for _, n in proj_items]
        for g_ast in sel.group_by:
            ge = self._resolve_groupitem(g_ast, binder, proj_items)
            group_exprs.append(ge)

        # collect aggregates from projections + having; HAVING may
        # reference select-list aliases (HeavyDB/Calcite dialect:
        # SUM(x) AS sx ... HAVING sx < sy)
        having_expr = None
        alias_env = {
            n.lower(): e for e, n in proj_items if n
        }
        agg_binder = ExprBinder(scope, self.db, allow_aggs=True,
                                cte_env=self._env, alias_env=alias_env)
        if sel.having is not None:
            having_expr = agg_binder.bind_condition(sel.having)

        aggs: List[E.Agg] = []
        agg_index: Dict[tuple, int] = {}

        def collect_aggs(e: E.Expr):
            for n in E.walk(e):
                if isinstance(n, E.Agg):
                    k = n.match_key()
                    if k not in agg_index:
                        agg_index[k] = len(aggs)
                        aggs.append(n)

        for e in proj_exprs:
            collect_aggs(e)
        if having_expr is not None:
            collect_aggs(having_expr)

        for g in group_exprs:
            if g.type.is_array:
                raise BinderError("array columns cannot be GROUP BY keys")
        group_keys = [g.match_key() for g in group_exprs]
        n_keys = len(group_exprs)

        agg_node = R.Aggregate(
            rel,
            group_exprs,
            aggs,
            [f"$key{i}" for i in range(n_keys)] + [f"$agg{i}" for i in range(len(aggs))],
        )

        # rewrite projection/having expressions over the Aggregate's output
        def rewrite_over_agg(e: E.Expr) -> E.Expr:
            k = e.match_key()
            if k in group_keys:
                idx = group_keys.index(k)
                # string transforms register a fresh transient dict per
                # bind — keep the GROUP BY expr's dict so ids line up
                dref = getattr(group_exprs[idx], "dict_ref",
                               getattr(e, "dict_ref", None))
                return E.InputRef(0, idx, agg_node.types[idx], dref)
            if isinstance(e, E.Agg):
                if k not in agg_index:
                    raise BinderError(
                        "aggregate must appear in the select list or HAVING"
                    )
                idx = n_keys + agg_index[k]
                # MIN/MAX/SAMPLE of a dict column yield ids of the same dict
                dref = None
                if e.kind in (E.AggKind.MIN, E.AggKind.MAX, E.AggKind.SAMPLE,
                              E.AggKind.SINGLE_VALUE, E.AggKind.MODE):
                    dref = getattr(e.arg, "dict_ref", None)
                return E.InputRef(0, idx, e.type, dref)
            if isinstance(e, E.InputRef):
                raise BinderError(
                    f"column {e} must appear in GROUP BY or an aggregate"
                )
            import dataclasses

            if isinstance(e, E.Case):
                whens = tuple(
                    (rewrite_over_agg(c), rewrite_over_agg(r)) for c, r in e.whens
                )
                el = rewrite_over_agg(e.else_) if e.else_ is not None else None
                return dataclasses.replace(e, whens=whens, else_=el)
            if isinstance(e, E.BinOp):
                return dataclasses.replace(
                    e, left=rewrite_over_agg(e.left), right=rewrite_over_agg(e.right)
                )
            if isinstance(e, E.UnOp):
                return dataclasses.replace(e, operand=rewrite_over_agg(e.operand))
            if isinstance(e, E.Cast):
                return dataclasses.replace(e, operand=rewrite_over_agg(e.operand))
            if isinstance(e, (E.InValues, E.DictStrPredicate,
                              E.StringTransform)):
                return dataclasses.replace(e, arg=rewrite_over_agg(e.arg))
            if isinstance(e, (E.StringPairConcat, E.DictPairCompare)):
                return dataclasses.replace(
                    e, left=rewrite_over_agg(e.left),
                    right=rewrite_over_agg(e.right))
            if isinstance(e, (E.Extract, E.DateTrunc)):
                return dataclasses.replace(e, operand=rewrite_over_agg(e.operand))
            if isinstance(e, E.FunctionOp):
                return dataclasses.replace(
                    e, args=tuple(rewrite_over_agg(a) for a in e.args)
                )
            if isinstance(e, (E.Constant, E.SubqueryExpr)):
                return e
            raise NotSupported(f"expr over aggregate: {type(e).__name__}")

        out: R.RelNode = agg_node
        if having_expr is not None:
            out = R.Filter(out, rewrite_over_agg(having_expr))

        final_exprs = [rewrite_over_agg(e) for e in proj_exprs]
        out = R.Project(out, final_exprs, proj_names)
        return out, rewrite_over_agg

    def _resolve_groupitem(self, g_ast, binder, proj_items) -> E.Expr:
        # ordinal: GROUP BY 1
        if isinstance(g_ast, A.Literal) and g_ast.kind == "num_int":
            idx = int(g_ast.value) - 1
            if not 0 <= idx < len(proj_items):
                raise BinderError(f"GROUP BY ordinal {g_ast.value} out of range")
            return proj_items[idx][0]
        # alias: GROUP BY with a select-list alias
        if isinstance(g_ast, A.Identifier) and len(g_ast.parts) == 1:
            name = g_ast.parts[0].lower()
            try:
                return binder.bind(g_ast)
            except BinderError:
                for e, n in proj_items:
                    if n and n.lower() == name:
                        return e
                raise
        e = binder.bind(g_ast)
        if E.is_aggregate(e):
            raise BinderError("aggregates not allowed in GROUP BY")
        return e

    # ------------------------------------------------------------------
    def _apply_order_limit(self, rel: R.RelNode, sel: A.Select) -> R.RelNode:
        if not sel.order_by and sel.limit is None and sel.offset is None:
            return rel
        keys = []
        extra_exprs: List[E.Expr] = []
        extra_names: List[str] = []
        for item in sel.order_by:
            idx = self._order_key_index(item.expr, rel, extra_exprs, extra_names)
            asc = item.asc
            nulls_first = item.nulls_first
            if nulls_first is None:
                # dialect default: NULLS LAST for ASC, NULLS FIRST for DESC
                # (matches HeavyDB/Calcite default)
                nulls_first = not asc
            keys.append((idx, asc, nulls_first))
        base = rel
        if extra_exprs:
            # materialize hidden sort keys, sort, then project them away
            all_exprs = [
                E.InputRef(0, i, t, _node_dict_ref(rel, i))
                for i, t in enumerate(rel.types)
            ] + extra_exprs
            names = list(rel.fields) + extra_names
            base = R.Project(rel, all_exprs, names)
        for _ki, _, _ in keys:
            if base.types[_ki].is_array:
                raise BinderError("array columns cannot be ORDER BY keys")
        sorted_ = R.Sort(base, keys, sel.limit, sel.offset)
        if extra_exprs:
            keep = [
                E.InputRef(0, i, t, _node_dict_ref(rel, i))
                for i, t in enumerate(rel.types)
            ]
            return R.Project(sorted_, keep, list(rel.fields))
        return sorted_

    def _order_key_index(self, e_ast, rel, extra_exprs, extra_names) -> int:
        if isinstance(e_ast, A.Literal) and e_ast.kind == "num_int":
            idx = int(e_ast.value) - 1
            if not 0 <= idx < rel.arity:
                raise BinderError(f"ORDER BY ordinal {e_ast.value} out of range")
            return idx
        if isinstance(e_ast, A.Identifier) and len(e_ast.parts) == 1:
            name = e_ast.parts[0].lower()
            for i, f in enumerate(rel.fields):
                if f.lower() == name:
                    return i
        # expression over output columns
        scope = Scope()
        dict_refs = [_node_dict_ref(rel, i) for i in range(rel.arity)]
        scope.add_relation("$out", rel.fields, rel.types, dict_refs)
        binder = ExprBinder(scope, self.db, allow_aggs=False, cte_env=self._env)
        e = binder.bind(e_ast)
        if isinstance(e, E.InputRef):
            return e.field_idx
        extra_exprs.append(e)
        extra_names.append(f"$sortkey{len(extra_exprs)}")
        return rel.arity + len(extra_exprs) - 1


def _alias_of(ref: A.TableRef) -> str:
    if isinstance(ref, A.NamedTable):
        return ref.alias or ref.name
    if isinstance(ref, A.SubqueryRef):
        return ref.alias or ""
    raise BinderError("USING join requires simple table refs")


def _auto_name(expr_ast, idx: int) -> str:
    if isinstance(expr_ast, A.Identifier):
        return expr_ast.parts[-1]
    if isinstance(expr_ast, A.FuncCall):
        return expr_ast.name.lower()
    return f"expr${idx}"


def _node_dict_ref(node: R.RelNode, field_idx: int):
    """Propagate dictionary identity through Scan/Project/Aggregate outputs."""
    if isinstance(node, R.Scan):
        if field_idx >= len(node.table.columns):  # virtual rowid field
            return None
        cd = node.table.columns[field_idx]
        if cd.type.is_dict_string or cd.type.is_array \
                or cd.type.is_none_string:
            return (node.table.table_id, cd.col_id)
        return None
    if isinstance(node, R.Project):
        e = node.exprs[field_idx]
        return getattr(e, "dict_ref", None)
    if isinstance(node, R.Aggregate):
        if field_idx < len(node.group_exprs):
            return getattr(node.group_exprs[field_idx], "dict_ref", None)
        return None
    if isinstance(node, (R.Filter, R.Sort)):
        return _node_dict_ref(node.inputs[0], field_idx)
    if isinstance(node, R.Join):
        la = node.inputs[0].arity
        if field_idx < la:
            return _node_dict_ref(node.inputs[0], field_idx)
        return _node_dict_ref(node.inputs[1], field_idx - la)
    if isinstance(node, R.Union):
        refs = getattr(node, "dict_refs", None)
        return refs[field_idx] if refs else None
    if isinstance(node, R.Window):
        base = node.inputs[0].arity
        if field_idx < base:
            return _node_dict_ref(node.inputs[0], field_idx)
        return node.wfuncs[field_idx - base].dict_ref
    if isinstance(node, R.Unnest):
        base = node.inputs[0].arity
        if field_idx < base:
            return _node_dict_ref(node.inputs[0], field_idx)
        return node.afn.dict_ref
    if isinstance(node, R.TableData):
        return node.dict_refs[field_idx]
    if isinstance(node, R.Compound):
        if field_idx < len(node.target_exprs):
            return getattr(node.target_exprs[field_idx], "dict_ref", None)
    return None
