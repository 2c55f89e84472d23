"""DistEngine: aggregator/leaf SQL execution across hosts.

Each host owns a row partition of the distributed tables (dimension
tables may be replicated).  A query executes as (reference
RelAlgExecutor::executeRelAlgQuerySingleStep + aggregator merge,
QueryEngine/RelAlgExecutor.cpp:1211, heavy.thrift:769-771):

  1. plan locally (all hosts parse the same SQL against dictionaries
     built globally at load time → identical ids);
  2. leaf step: run the Compound with DECOMPOSED aggregates over the
     local partition (exec/partial_agg.py — the leaf partial aggregate);
  3. exchange: process_allgather of the small partial-result columns
     (replaces broadcast_serialized_rows);
  4. aggregator merge: re-aggregate partials + finalize targets/having,
     executed replicated so every host holds the full result.

ORDER BY / LIMIT over aggregates run on the merged result (the reference
also sorts on the aggregator, RelAlgExecutor.cpp:1264-1292).  Projection
top-k distributes as local-top-k → gather S·k candidates → final top-k.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from heavydb_tpu import types as T
from heavydb_tpu.errors import NotSupported
from heavydb_tpu.exec.partial_agg import (
    decomposable,
    make_leaf_node,
    make_merge_node,
)
from heavydb_tpu.plan import exprs as E
from heavydb_tpu.plan import rel_alg as R
from heavydb_tpu.parallel.multihost import MultiHostRuntime, generations_snapshot


def _hash_columns(cols: List[np.ndarray]) -> np.ndarray:
    """Deterministic row hash over key columns — identical on every host
    (splitmix-style mix over the raw 64-bit lanes; float NaNs — the NULL
    sentinel — are canonicalized so NULL keys co-locate)."""
    n = len(cols[0]) if cols else 0
    h = np.full(n, 0x243F6A8885A308D3, np.uint64)
    for c in cols:
        a = np.asarray(c)
        if a.dtype.kind == "f":
            b = a.astype(np.float64)
            lanes = np.where(
                np.isnan(b), np.uint64(0x7FF8000000000000),
                b.view(np.uint64),
            )
        elif a.dtype.kind == "b":
            lanes = a.astype(np.uint64)
        else:
            lanes = a.astype(np.int64).view(np.uint64)
        x = h ^ (lanes * np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = x ^ (x >> np.uint64(31))
    return h


class DistEngine:
    def __init__(self, db, runtime: MultiHostRuntime):
        self.db = db
        self.rt = runtime
        # global row counts per distributed table (generations snapshot)
        self.global_rows: Dict[str, int] = {}

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------
    def load_table(self, name: str, local_data, create: bool = True,
                   replicated: bool = False,
                   route_by_shard_key: bool = False):
        """Load `local_data` (this host's rows; dict of numpy columns).
        Distributed tables build their string dictionaries globally so ids
        agree on every host; replicated tables must be passed identical
        data on every host.  With route_by_shard_key=True every host passes
        the SAME full dataset and keeps only the rows whose
        hash(shard_key) lands on it — the reference's SHARD_KEY co-located
        loading (Fragmenter/InsertDataLoader shard routing)."""
        from heavydb_tpu.api import _normalize_tabular, _infer_type

        cols = _normalize_tabular(local_data)
        if route_by_shard_key and self.rt.num_processes > 1:
            existing = self.db.catalog.get_table_opt(name)
            key_col = getattr(existing, "shard_key", None) if existing \
                else None
            if key_col is None or key_col not in cols:
                raise NotSupported(
                    "route_by_shard_key requires a table created with "
                    "SHARD KEY (col)"
                )
            k = np.asarray(cols[key_col])
            if k.dtype.kind in "iu":
                h = (k.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
                dest = (h % np.uint64(self.rt.num_processes)).astype(int)
            else:
                import zlib

                dest = np.array([
                    zlib.crc32(str(v).encode()) % self.rt.num_processes
                    for v in k
                ])
            keep = dest == self.rt.process_id
            cols = {c: np.asarray(a)[keep] for c, a in cols.items()}
        if create and self.db.catalog.get_table_opt(name) is None:
            defs = [(cname, _infer_type(arr)) for cname, arr in cols.items()]
            self.db.catalog.create_table(name, defs)
        t = self.db.catalog.get_table(name)
        if not replicated:
            # global dictionary build: deterministic merged intern order
            for cd in t.columns:
                if cd.col_id not in t.dicts or cd.name not in cols:
                    continue
                arr = cols[cd.name]
                uniq: List[str] = []
                seen = set()
                for s in arr:
                    if s is not None and not (
                        isinstance(s, float) and np.isnan(s)
                    ) and s not in seen:
                        seen.add(s)
                        uniq.append(str(s))
                merged = self.rt.allgather_strings(uniq)
                t.dicts[cd.col_id].get_or_add_bulk(merged)
        self.db._insert_columns(t, cols)
        n_local = int(
            len(next(iter(cols.values()))) if cols else 0
        )
        if replicated:
            self.global_rows[name.lower()] = t.num_rows
        else:
            self.global_rows[name.lower()] = sum(
                self.rt.allgather_scalar(n_local)
            )
        return t

    # ------------------------------------------------------------------
    # querying
    # ------------------------------------------------------------------
    def sql(self, text: str):
        """Distributed SELECT.  Returns a ResultSet (identical on every
        host)."""
        from heavydb_tpu.api import _node_dict_ref
        from heavydb_tpu.exec.result_set import from_batch
        from heavydb_tpu.plan.optimizer import optimize
        from heavydb_tpu.sql import ast as A
        from heavydb_tpu.sql.parser import parse_many

        stmts = parse_many(text)
        if len(stmts) != 1 or not isinstance(stmts[0], A.Select):
            raise NotSupported("DistEngine.sql executes a single SELECT")
        plan = optimize(self.db._plan_select(stmts[0]))
        batch, out_node = self._exec_distributed(plan)
        dicts = []
        for i in range(out_node.arity):
            ref = _node_dict_ref(out_node, i)
            dicts.append(
                self.db.dict_by_ref(ref)
                if ref and not out_node.types[i].is_array else None
            )
        return from_batch(batch, out_node.fields, out_node.types, dicts)

    def snapshot(self) -> dict:
        """Generations snapshot merged across hosts — verifies metadata
        consistency before distributed planning (reference
        prepareLeafExecution)."""
        import json

        local = generations_snapshot(self.db)
        for name, n in self.global_rows.items():
            if name in local:
                local[name]["num_rows_global"] = n
        blobs = self.rt.allgather_bytes(
            json.dumps(sorted(local.keys())).encode()
        )
        tables = [json.loads(b) for b in blobs]
        if any(ts != tables[0] for ts in tables[1:]):
            raise NotSupported(
                "catalog divergence across hosts: " + repr(tables)
            )
        return local

    # ------------------------------------------------------------------
    def _exec_distributed(self, plan: R.RelNode):
        ex = self.db.executor
        if isinstance(plan, R.Sort):
            child = plan.inputs[0]
            if isinstance(child, R.Compound) and child.is_aggregate:
                batch, _ = self._exec_distributed(child)
                # aggregator-side sort over the (replicated) merged result
                memo = {child.id: batch}
                out = ex._exec_sort(plan, memo)
                return out, plan
            if plan.limit is not None:
                return self._dist_topk(plan), plan
            raise NotSupported("distributed full sort without LIMIT")
        if isinstance(plan, R.Compound) and decomposable(plan):
            return self._dist_aggregate(plan), plan
        if isinstance(plan, R.Compound) and plan.is_aggregate:
            # non-decomposable aggregates (COUNT DISTINCT, APPROX_*,
            # MODE, STDDEV, dict-string MIN/MAX): repartition by group key
            return self._dist_repartition_agg(plan), plan
        if isinstance(plan, R.Compound) and not plan.is_aggregate:
            # distributed projection: local rows, gathered (small results
            # only — the watchdog guards unbounded projections locally)
            out = ex.execute(plan)
            host = out.to_numpy()
            if any(c is None for c in host):
                raise NotSupported(
                    "distributed projection with pruned columns"
                )
            cols = self.rt.allgather_concat(list(host))
            import heavydb_tpu.exec.batch as B

            return (
                B.from_host_columns(cols, len(cols[0]) if cols else 0,
                                    plan.types),
                plan,
            )
        raise NotSupported(
            f"distributed execution of {type(plan).__name__} "
            "(non-decomposable aggregates)"
        )

    def _dist_aggregate(self, node: R.Compound):
        """Leaf partial aggregate → allgather → aggregator merge."""
        import heavydb_tpu.exec.batch as B

        ex = self.db.executor
        leaf, wave_aggs, fin = make_leaf_node(node)
        local = ex.execute(leaf)
        host_cols = local.to_numpy()
        cols = self.rt.allgather_concat(
            [c for c in host_cols]
        )
        n = len(cols[0]) if cols else 0
        td = R.TableData(
            list(leaf.fields), [wt.type for wt in leaf.target_exprs], cols,
            [getattr(wt, "dict_ref", None) for wt in leaf.target_exprs],
        )
        merge_node = make_merge_node(node, wave_aggs, fin, td)
        return ex.execute(merge_node)

    def _dist_repartition_agg(self, node: R.Compound):
        """Non-decomposable aggregates: repartition rows by hashed group
        key so every group lands WHOLLY on one host, run the ORIGINAL
        aggregate locally over complete groups, and concatenate the
        disjoint per-host group results (reference: sharded top-k groups
        skip the aggregator re-agg the same way,
        QueryEngine/RelAlgExecutor.cpp:1266-1292
        shard_count_for_top_groups)."""
        import dataclasses

        import heavydb_tpu.exec.batch as B

        ex = self.db.executor
        k = len(node.group_exprs)
        if k == 0:
            return self._dist_keyless_distinct(node)

        # leaf projection over the local partition: group keys ++ agg
        # args (joins/filter evaluated locally — build sides must be
        # replicated dimension tables, as for the decomposable path)
        proj_targets: List[E.Expr] = list(node.group_exprs)

        def _project(e: Optional[E.Expr]) -> Optional[int]:
            if e is None or not E.collect_input_refs(e):
                return None  # constants stay inline (e.g. quantile frac)
            proj_targets.append(e)
            return len(proj_targets) - 1

        arg_pos = [_project(a.arg) for a in node.aggs]
        arg2_pos = [_project(a.arg2) for a in node.aggs]
        for t in proj_targets:
            if t.type.is_array or t.type.is_geo:
                raise NotSupported(
                    "distributed repartition aggregate over array/geo "
                    "columns (rowid payloads are host-local)"
                )
        names = [f"c{i}" for i in range(len(proj_targets))]
        leaf = R.Compound(
            list(node.inputs), list(node.join_levels), node.filter_cond,
            [], [], proj_targets, names, None,
        )
        out = ex.execute(leaf)
        host = out.to_numpy()
        if any(c is None for c in host):
            raise NotSupported("repartition aggregate with pruned columns")
        dest = (_hash_columns(host[:k])
                % np.uint64(self.rt.num_processes)).astype(np.int32)
        mine = self.rt.exchange_rows(list(host), dest)

        td = R.TableData(
            names, [t.type for t in proj_targets], mine,
            [getattr(t, "dict_ref", None) for t in proj_targets],
        )
        final_groups = [
            E.InputRef(0, i, g.type, getattr(g, "dict_ref", None))
            for i, g in enumerate(node.group_exprs)
        ]

        def _ref(pos, orig):
            if pos is None:
                return orig  # None or a constant expression
            t = proj_targets[pos]
            return E.InputRef(0, pos, t.type, getattr(t, "dict_ref", None))

        final_aggs = [
            dataclasses.replace(
                a, arg=_ref(p, a.arg), arg2=_ref(p2, a.arg2)
            )
            for a, p, p2 in zip(node.aggs, arg_pos, arg2_pos)
        ]
        final = R.Compound(
            [td], [], None, final_groups, final_aggs,
            list(node.target_exprs), list(node.fields), node.having,
        )
        res = ex.execute(final)
        cols = self.rt.allgather_concat(list(res.to_numpy()))
        return B.from_host_columns(
            cols, len(cols[0]) if cols else 0, node.types
        )

    def _dist_keyless_distinct(self, node: R.Compound):
        """Keyless COUNT(DISTINCT x) / APPROX_COUNT_DISTINCT(x):
        repartition rows by hashed VALUE — per-host distinct sets are
        disjoint, so local distinct counts merge by exact SUM."""
        import dataclasses

        import heavydb_tpu.exec.batch as B

        ex = self.db.executor
        args = []
        for a in node.aggs:
            if (a.kind == E.AggKind.COUNT_DISTINCT
                    or (a.kind == E.AggKind.COUNT and a.distinct)
                    or a.kind == E.AggKind.APPROX_COUNT_DISTINCT):
                args.append(a.arg)
            else:
                raise NotSupported(
                    "distributed keyless aggregate mixing DISTINCT with "
                    f"{a.kind.value}"
                )
        if len({a.key() for a in args}) != 1:
            raise NotSupported(
                "distributed keyless DISTINCT aggregates must share one "
                "argument (value-partitioned merge)"
            )
        arg = args[0]
        if arg.type.is_array or arg.type.is_geo:
            raise NotSupported("distributed DISTINCT over array/geo")
        leaf = R.Compound(
            list(node.inputs), list(node.join_levels), node.filter_cond,
            [], [], [arg], ["c0"], None,
        )
        out = ex.execute(leaf)
        host = out.to_numpy()
        dest = (_hash_columns(host[:1])
                % np.uint64(self.rt.num_processes)).astype(np.int32)
        mine = self.rt.exchange_rows(list(host), dest)
        td = R.TableData(
            ["c0"], [arg.type], mine,
            [getattr(arg, "dict_ref", None)],
        )
        ref = E.InputRef(0, 0, arg.type, getattr(arg, "dict_ref", None))
        local_aggs = [dataclasses.replace(a, arg=ref) for a in node.aggs]
        ident = [
            E.InputRef(0, j, a.type) for j, a in enumerate(node.aggs)
        ]
        local = R.Compound(
            [td], [], None, [], local_aggs, ident,
            [f"p{j}" for j in range(len(node.aggs))], None,
        )
        res = ex.execute(local)
        cols = self.rt.allgather_concat(list(res.to_numpy()))
        ptd = R.TableData(
            [f"p{j}" for j in range(len(node.aggs))],
            [a.type for a in node.aggs], cols,
            [None] * len(node.aggs),
        )
        merge_aggs = [
            E.Agg(E.AggKind.SUM, E.InputRef(0, j, a.type), False, a.type)
            for j, a in enumerate(node.aggs)
        ]
        merge = R.Compound(
            [ptd], [], None, [], merge_aggs, list(node.target_exprs),
            list(node.fields), node.having,
        )
        return ex.execute(merge)

    def _dist_topk(self, plan: R.Sort):
        """Local top-k per host → gather S·k candidates → final top-k."""
        import heavydb_tpu.exec.batch as B

        ex = self.db.executor
        k = int(plan.limit) + int(plan.offset or 0)
        local_sort = R.Sort(plan.inputs[0], plan.keys, k, None)
        out = ex._exec(local_sort, {}, set(range(local_sort.arity)))
        cols = self.rt.allgather_concat([c for c in out.to_numpy()])
        n = len(cols[0]) if cols else 0
        td = R.TableData(
            list(plan.fields), list(plan.types), cols,
            [None] * len(plan.fields),
        )
        final = R.Sort(td, plan.keys, plan.limit, plan.offset)
        return ex._exec(final, {}, set(range(final.arity)))
