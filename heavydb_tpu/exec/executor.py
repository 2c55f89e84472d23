"""Query executor: walks the optimized RelAlg DAG, compiles each Compound
work unit into ONE jit'd XLA program, and runs it with a capacity-retry
ladder.

Reference mapping:
- Executor::executeWorkUnit / compileWorkUnit (Execute.cpp:2144,
  NativeCodegen.cpp:2919) → `_exec_compound` + `_build_kernel`: instead of
  emitting LLVM IR into query_template, we trace a Python closure under
  jax.jit; XLA fuses filter/join-probe/group-by/aggregate into one program.
- ERR_OUT_OF_SLOTS / CardinalityEstimationRequired retry loop
  (executeWorkUnitImpl:2213) → the capacity ladder: kernels return the EXACT
  needed capacity alongside results, so a miss re-traces once with the
  bucketed exact size.
- Join hash tables built inside compileWorkUnit (HashJoin::getInstance) →
  sorted/perfect positional builds inside the same kernel (ops/join.py).
- CodeCache keyed on IR (CodeCacheAccessor) → `kernel_cache` keyed on
  (plan key, shapes, caps, strategy).
- RaExecutionSequence temp tables → per-query Batch memoization.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu import types as T
from heavydb_tpu.errors import (
    DivisionByZero,
    ExecutionError,
    NotSupported,
    WatchdogException,
)
from heavydb_tpu.exec import batch as B
from heavydb_tpu.exec import geo_join as GEO
from heavydb_tpu.exec import ranges as RNG
from heavydb_tpu.exec.expr_compiler import ExprCompiler
from heavydb_tpu.ops import groupby as G
from heavydb_tpu.ops import join as J
from heavydb_tpu.ops import sort as S
from heavydb_tpu.plan import exprs as E
from heavydb_tpu.plan import rel_alg as R
from heavydb_tpu.storage.table import from_physical

MAX_RETRIES = 4


def _scan_field_type(table, f: int) -> T.TypeInfo:
    """Type of scan field f; fields past the physical columns are the
    virtual rowid pseudo-column (BIGINT NOT NULL)."""
    if f < len(table.columns):
        return table.columns[f].type
    return T.bigint(nullable=False)


def _walk_nodes(node: R.RelNode):
    yield node
    for i in node.inputs:
        yield from _walk_nodes(i)


def _iter_node_exprs(node: R.RelNode):
    if isinstance(node, R.Compound):
        for _, c in node.join_levels:
            if c is not None:
                yield c
        if node.filter_cond is not None:
            yield node.filter_cond
        yield from node.group_exprs
        yield from node.aggs
        yield from node.target_exprs
        if node.having is not None:
            yield node.having
    elif isinstance(node, R.Sort):
        pass


class Executor:
    def __init__(self, db):
        self.db = db
        self.config = db.config
        from heavydb_tpu.storage.buffer_mgr import (
            DeviceLRUCache,
            default_device_budget,
        )

        self.kernel_cache: Dict[tuple, object] = {}
        # LRU-evicting device caches under one HBM budget (reference slab
        # BufferMgr LRU, DataMgr/BufferMgr/BufferMgr.h:115); scan buffers
        # dominate, aux arrays ride the same budget
        budget = self.config.device_cache_bytes
        if budget == 0:
            budget = default_device_budget()
        elif budget < 0:
            budget = 0  # unbounded
        self.scan_cache = DeviceLRUCache(budget)
        self.aux_cache = DeviceLRUCache(
            max(budget // 4, 1 << 28) if budget else 0
        )
        # selectivity-probe result cache: (conjuncts, input, generation)
        # → surviving row count (reference caches push-down candidates per
        # query plan the same way)
        self._sel_cache: Dict[tuple, int] = {}
        # multi-device: tables row-sharded over a 1-D mesh; the jit'd
        # compound kernels are partitioned by XLA GSPMD, which inserts the
        # collectives (psum for aggregate merges, all-to-all under global
        # sorts) — the compiler-SPMD analogue of the reference's
        # fragment-per-GPU dispatch + reduceMultiDeviceResults
        # per-session interrupt hook (reference runtime interrupt,
        # RuntimeFunctions.cpp check_interrupt — ours checks between DAG
        # steps, the granularity of the reference's CPU fragment loop).
        # interrupt_check / timer / exec_hints / _deadline are THREAD-
        # LOCAL properties: the executor is shared across serving threads
        # (ThreadingTCPServer), and a plain attribute let the last
        # arriving session's lambda overwrite every other session's —
        # KILL QUERY could kill the wrong query (reference keeps a
        # per-session registry on the Executor, Execute.h:688).  Each RPC
        # thread runs its own query start-to-finish, so thread-local
        # state IS per-query state.
        import threading as _threading

        self._tls = _threading.local()
        self.resource_mgr = None
        if self.config.enable_executor_resource_mgr:
            from heavydb_tpu.exec.resource_mgr import ResourceMgr

            self.resource_mgr = ResourceMgr(
                self.config.max_concurrent_queries,
                self.config.max_exec_bytes or None,
                self.config.admission_queue_timeout_s,
            )
        self.mesh = None
        n = self.config.num_shards
        if n and n > 1:
            from heavydb_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n)

    # ---- per-query state: thread-local (see __init__ note) ----
    @property
    def interrupt_check(self):
        return getattr(self._tls, "interrupt_check", None)

    @interrupt_check.setter
    def interrupt_check(self, fn):
        self._tls.interrupt_check = fn

    @property
    def timer(self):
        t = getattr(self._tls, "timer", None)
        if t is None:
            from heavydb_tpu.utils.timer import NullTimer

            t = NullTimer()
            self._tls.timer = t
        return t

    @timer.setter
    def timer(self, t):
        self._tls.timer = t

    @property
    def exec_hints(self):
        return getattr(self._tls, "exec_hints", None) or {}

    @exec_hints.setter
    def exec_hints(self, h):
        self._tls.exec_hints = h

    @property
    def _deadline(self):
        return getattr(self._tls, "deadline", None)

    @_deadline.setter
    def _deadline(self, d):
        self._tls.deadline = d

    def _scan_sharding(self):
        if self.mesh is None:
            return None
        from heavydb_tpu.parallel.mesh import row_sharding

        return row_sharding(self.mesh)

    # staged host→device upload threshold (bytes); chunked device_put
    # measured 1.8-5x faster than one monolithic transfer on the remote
    # relay, AND it skips the full-size host pad copy (reference
    # JumpBufferTransferMgr: large transfers stage through fixed-size
    # pinned buffers, CudaMgr/JumpBufferTransferMgr.h:32)
    _STAGE_MIN_BYTES = 64 << 20
    _STAGE_CHUNK_BYTES = 32 << 20

    def _staged_put(self, host: np.ndarray, size: int, ti,
                    rng=None) -> jax.Array:
        """pad_to + device_put, chunked for large columns: upload the raw
        column in ~32MB pieces (transfers overlap), append the pad tail
        as a device-side fill, ONE device concat assembles the padded
        column — no O(column) host copy.  Integer columns whose
        chunk-stat range fits a narrower dtype transfer NARROW and widen
        on device (the host↔device link is the ingest bottleneck —
        measured ~19MB/s on the remote relay — so 8→2 bytes/row is a 4×
        ingest win; reference JumpBufferTransferMgr stages large
        transfers, CudaMgr/JumpBufferTransferMgr.h:32).  `rng` is the
        (lo, hi, has_nulls) chunk-stat range."""
        sharding = self._scan_sharding()
        if (host.nbytes < self._STAGE_MIN_BYTES or sharding is not None
                or host.ndim != 1):
            return jax.device_put(B.pad_to(host, size, ti), sharding)
        wide_dt = host.dtype
        sent = ti.null_sentinel()
        narrow_dt = None
        if (rng is not None and host.dtype.kind == "i"
                and rng[0] is not None and rng[1] is not None):
            lo, hi = int(rng[0]), int(rng[1])
            for cand in (np.int8, np.int16, np.int32):
                ii = np.iinfo(cand)
                # reserve the narrow dtype's min for the null sentinel
                if np.dtype(cand).itemsize < host.itemsize \
                        and ii.min < lo and hi <= ii.max:
                    narrow_dt = np.dtype(cand)
                    break
        if narrow_dt is not None:
            nsent = np.iinfo(narrow_dt).min
            send = host.astype(narrow_dt)
            if rng[2]:  # has_nulls: remap wide sentinel → narrow sentinel
                send[host == sent] = nsent
        else:
            send = host
        rows_per = max(1, self._STAGE_CHUNK_BYTES // max(send.itemsize, 1))
        parts = [
            jax.device_put(send[i:i + rows_per])
            for i in range(0, send.shape[0], rows_per)
        ]
        if size > send.shape[0]:
            parts.append(jnp.full(
                size - send.shape[0],
                np.iinfo(narrow_dt).min if narrow_dt is not None else sent,
                send.dtype,
            ))
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        if narrow_dt is not None:
            nsent = np.iinfo(narrow_dt).min
            wide = out.astype(wide_dt)
            out = jnp.where(out == np.array(nsent, narrow_dt),
                            jnp.asarray(sent, wide_dt), wide)
        return out

    # ------------------------------------------------------------------
    # entry
    # ------------------------------------------------------------------
    def execute(self, root: R.RelNode) -> B.Batch:
        # dynamic (time-budget) watchdog — reference DynamicWatchdog.cpp:
        # a cycle-budget deadline; ours is a wall deadline polled at every
        # execution checkpoint (DAG steps, fragment waves, retry rounds)
        import time as _time

        limit_ms = 0
        hints = getattr(self, "exec_hints", {}) or {}
        if self.config.enable_dynamic_watchdog or hints.get(
            "dynamic_watchdog"
        ) or hints.get("query_time_limit"):
            try:
                limit_ms = int(hints.get("query_time_limit") or 0)
            except (TypeError, ValueError):
                limit_ms = 0
            limit_ms = limit_ms or self.config.dynamic_watchdog_time_limit_ms
        self._deadline = (
            _time.monotonic() + limit_ms / 1000.0 if limit_ms else None
        )
        if self.resource_mgr is not None:
            est = (
                self.resource_mgr.estimate_scan_bytes(root)
                + self.resource_mgr.estimate_output_bytes(root, self)
            )
            with self.resource_mgr.acquire(est):
                return self._execute_admitted(root)
        return self._execute_admitted(root)

    def _checkpoint(self):
        """Interrupt + dynamic-watchdog poll (reference check_interrupt,
        RuntimeFunctions.cpp:2548 + dynamic_watchdog deadline)."""
        if self.interrupt_check is not None and self.interrupt_check():
            from heavydb_tpu.errors import QueryInterrupted

            raise QueryInterrupted("query interrupted by session")
        dl = getattr(self, "_deadline", None)
        if dl is not None:
            import time as _time

            if _time.monotonic() > dl:
                raise WatchdogException(
                    "query exceeded the dynamic watchdog time limit"
                )

    def _execute_admitted(self, root: R.RelNode) -> B.Batch:
        self._substitute_subqueries(root, set())
        memo: Dict[int, B.Batch] = {}
        return self._exec(root, memo, needed=set(range(root.arity)))

    # ------------------------------------------------------------------
    # subqueries (reference RelAlgExecutor::executeRelAlgSubqueries)
    # ------------------------------------------------------------------
    def _substitute_subqueries(self, node: R.RelNode, seen: set):
        if node.id in seen:
            return
        seen.add(node.id)
        for i in node.inputs:
            self._substitute_subqueries(i, seen)

        def subst(e: E.Expr) -> E.Expr:
            if not isinstance(e, E.SubqueryExpr):
                return e
            return self._eval_subquery(e)

        def rewrite_list(exprs):
            return [E.rewrite(e, subst) for e in exprs]

        if isinstance(node, R.Compound):
            node.join_levels = [
                (k, E.rewrite(c, subst) if c is not None else None)
                for k, c in node.join_levels
            ]
            if node.filter_cond is not None:
                node.filter_cond = E.rewrite(node.filter_cond, subst)
            node.group_exprs = rewrite_list(node.group_exprs)
            node.aggs = rewrite_list(node.aggs)
            node.target_exprs = rewrite_list(node.target_exprs)
            if node.having is not None:
                node.having = E.rewrite(node.having, subst)

    def _eval_subquery(self, e: E.SubqueryExpr) -> E.Expr:
        from heavydb_tpu.plan.optimizer import optimize

        plan = optimize(e.plan)
        # NOT self.execute: the parent query already holds its admission
        # grant; re-acquiring for a subquery could self-deadlock at
        # max_concurrent
        out = self._execute_admitted(plan)
        if e.kind == "scalar":
            if out.nrows == 0:
                return E.Constant(None, e.type)
            if out.nrows > 1:
                raise ExecutionError("scalar subquery returned more than one row")
            v = np.asarray(out.col(0))[0].item()
            ti = out.types[0]
            if _is_null_value(v, ti):
                return E.Constant(None, e.type)
            return E.Constant(v, ti.with_nullable(False))
        if e.kind == "exists":
            res = out.nrows > 0
            if e.negated:
                res = not res
            return E.Constant(1 if res else 0, T.boolean(False))
        # IN subquery
        vals = np.asarray(out.col(0))[: out.nrows]
        ti = out.types[0]
        arg = e.arg
        if arg.type.is_dict_string:
            # map subquery strings → probe-side dict ids
            sub_dict_ref = None
            if ti.is_dict_string:
                # decode via the subquery output's dictionary
                sub_dict_ref = self._result_dict_ref(plan, 0)
            if sub_dict_ref is None:
                raise NotSupported("IN subquery over computed strings")
            sub_dict = self.db.dict_by_ref(sub_dict_ref)
            strings = sub_dict.get_strings(vals)
            probe_dict = self.db.dict_by_ref(arg.dict_ref)
            ids = [probe_dict.get_id(s) for s in strings if s is not None]
            ids = tuple(i for i in ids if i >= 0)
            return E.InValues(arg=arg, values=ids, negated=e.negated,
                              type=T.boolean(arg.type.nullable))
        pys = []
        had_null = False
        for v in vals.tolist():
            if _is_null_value(v, ti):
                had_null = True
                continue
            pys.append(_const_to(v, ti, arg.type))
        if e.negated and had_null:
            # x NOT IN (..., NULL) is never TRUE (three-valued logic)
            return E.Constant(0, T.boolean(nullable=False))
        return E.InValues(arg=arg, values=tuple(pys), negated=e.negated,
                          type=T.boolean(arg.type.nullable))

    def _result_dict_ref(self, node: R.RelNode, field_idx: int):
        from heavydb_tpu.plan.select_planner import _node_dict_ref

        return _node_dict_ref(node, field_idx)

    def _dict_rank_table(self, ref) -> jax.Array:
        """id → lexicographic rank, for string ORDER BY."""
        d = self.db.dict_by_ref(ref)
        key = ("rank", ref, d.size)
        hit = self.aux_cache.get(key)
        if hit is not None:
            return hit
        size = max(d.size, 1)
        host = np.zeros(B.bucket(size), np.int32)
        order = np.argsort(np.array(d.entries(), dtype=object))
        host[order.astype(np.int32)] = np.arange(len(order), dtype=np.int32)
        arr = jax.device_put(host)
        self.aux_cache[key] = arr
        return arr

    # ------------------------------------------------------------------
    # node dispatch
    # ------------------------------------------------------------------
    def _exec(self, node: R.RelNode, memo, needed) -> B.Batch:
        if node.id in memo:
            return memo[node.id]
        self._checkpoint()
        with self.timer.scope(f"{type(node).__name__}#{node.id}"):
            if isinstance(node, R.Scan):
                out = self._exec_scan(node, needed)
            elif isinstance(node, R.Values):
                out = self._exec_values(node)
            elif isinstance(node, R.TableData):
                out = B.from_host_columns(node.arrays, node.num_rows, node.types)
            elif isinstance(node, R.Union):
                out = self._exec_union(node, memo)
            elif isinstance(node, R.Sort):
                out = self._exec_sort(node, memo)
            elif isinstance(node, R.Unnest):
                out = self._exec_unnest(node, memo)
            elif isinstance(node, R.Compound):
                out = self._exec_compound(node, memo)
            elif isinstance(node, R.Window):
                out = self._exec_window(node, memo)
            else:
                raise NotSupported(f"cannot execute node {type(node).__name__}")
        memo[node.id] = out
        return out

    def prestage_table(self, t) -> None:
        """Eagerly stage a table's columns into the device scan cache and
        force one tiny D2H sync (reference role: DataMgr prefetch — data
        is resident before the first query).  On the axon relay the first
        device→host fetch after a heavy host→device burst can stall for
        minutes (measured 60s-1400s, STATUS round 2); absorbing the
        transfer + sync at LOAD time keeps the first QUERY at engine
        speed.  Best-effort: staging failures fall back to on-demand."""
        try:
            batch = self._exec_scan(R.Scan(t), None)
            last = None
            for a in batch.cols:
                if a is not None and hasattr(a, "block_until_ready"):
                    a.block_until_ready()
                    last = a
            if last is not None:
                # ONE tiny D2H: block_until_ready can return before remote
                # completion on the relay; a real fetch is the true sync
                jax.device_get(jnp.ravel(last)[:1])
        except Exception:
            pass

    # ---- scan-cache patching for fragment-level UPDATE/DELETE ----
    # A generation bump invalidates every cached device array for the
    # table; re-uploading O(table) bytes over the relay's slow H2D for a
    # one-row UPDATE defeats the fragment-level storage path (reference:
    # chunks updated in place stay resident on device, UpdelStorage.cpp).
    # Instead, migrate resident full-table arrays to the new generation:
    # a device scatter for updates, a device gather (compaction) for
    # deletes — HBM-speed, no host round-trip.
    def patch_cache_update(self, t, old_gen: int, rowids: np.ndarray,
                           new_cols: Dict[int, np.ndarray]) -> None:
        try:
            rid = jnp.asarray(np.asarray(rowids, np.int64))
            moves = []
            for key, arr in list(self.scan_cache.items()):
                if not (isinstance(key, tuple) and len(key) == 5
                        and key[0] == t.table_id and key[1] == old_gen):
                    continue
                tid, gen, cid, size, fkey = key
                if fkey is not None:
                    self.scan_cache.pop(key)  # waves re-slice from full
                    continue
                if cid in new_cols:
                    cd = t.column_by_id(cid) if isinstance(cid, int) \
                        else None
                    if cd is not None and cd.type.is_none_string:
                        # device ids belong to the OLD generation's lazy
                        # dict; the new generation re-interns — re-upload
                        self.scan_cache.pop(key)
                        continue
                    vals = jnp.asarray(
                        np.asarray(new_cols[cid]), arr.dtype)
                    arr = arr.at[rid].set(vals, mode="drop")
                moves.append((key, (tid, t.generation, cid, size, None),
                              arr))
            for old_key, new_key, arr in moves:
                self.scan_cache.pop(old_key)
                self.scan_cache[new_key] = arr
        except Exception:
            pass  # correctness is generation-keyed; worst case re-upload

    def patch_cache_delete(self, t, old_gen: int, old_num_rows: int,
                           rowids: np.ndarray) -> None:
        try:
            delmask = np.zeros(old_num_rows, bool)
            delmask[np.asarray(rowids, np.int64)] = True
            keep = np.flatnonzero(~delmask)
            new_n = keep.shape[0]
            new_size = B.bucket(max(new_n, 1))
            kidx = jnp.asarray(keep)
            moves = []
            for key, arr in list(self.scan_cache.items()):
                if not (isinstance(key, tuple) and len(key) == 5
                        and key[0] == t.table_id and key[1] == old_gen):
                    continue
                tid, gen, cid, size, fkey = key
                if fkey is not None:
                    self.scan_cache.pop(key)
                    continue
                new_key = (tid, t.generation, cid, new_size, None)
                if cid == "$rowid":
                    # rowid == global position: synthesize on device
                    iota = jax.lax.broadcasted_iota(
                        jnp.int64, (new_size,), 0)
                    arr = jnp.where(iota < new_n, iota, jnp.int64(-1))
                elif isinstance(cid, int) and \
                        t.column_by_id(cid).type.is_array:
                    # array handles are global rowids too
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (new_size,), 0)
                    arr = jnp.where(iota < new_n, iota, jnp.int32(-1))
                elif isinstance(cid, int) and \
                        t.column_by_id(cid).type.is_none_string:
                    # lazy dict re-interns in the new generation's
                    # first-seen order — old ids don't survive a compact
                    self.scan_cache.pop(key)
                    continue
                else:
                    comp = arr[kidx]
                    if new_size > new_n:
                        sent = t.column_by_id(cid).type.null_sentinel()
                        pad = jnp.full(new_size - new_n, sent, arr.dtype)
                        comp = jnp.concatenate([comp, pad])
                    arr = comp[:new_size]
                moves.append((key, new_key, arr))
            for old_key, new_key, arr in moves:
                self.scan_cache.pop(old_key)
                self.scan_cache[new_key] = arr
        except Exception:
            pass

    # ---- Scan ----
    def _exec_scan(self, node: R.Scan, needed, frag_ids=None) -> B.Batch:
        t = node.table
        if frag_ids is not None:
            frags = [t.fragments[i] for i in frag_ids]
            n = sum(f.num_rows for f in frags)
            fkey = tuple(frag_ids)
        else:
            frags = None
            n = t.num_rows
            fkey = None
        size = B.bucket(n)
        cols: List[Optional[jax.Array]] = []
        for i in range(node.arity):
            if needed is not None and i not in needed:
                cols.append(None)
                continue
            if i >= len(t.columns):
                # virtual rowid field: GLOBAL physical row position
                # (fragment base + local offset) — stable under fragment
                # skipping and wave streaming; flows through join gathers
                # like any column (reference: Catalog's virtual rowid)
                key = (t.table_id, t.generation, "$rowid", size, fkey)
                arr = self.scan_cache.get(key)
                if arr is None:
                    gstart = np.cumsum(
                        [0] + [f.num_rows for f in t.fragments[:-1]]
                    )
                    use = (
                        list(zip(gstart, t.fragments)) if frags is None
                        else [(gstart[f.fragment_id], f) for f in frags]
                    )
                    host = (
                        np.concatenate([
                            g + np.arange(f.num_rows, dtype=np.int64)
                            for g, f in use if f.num_rows
                        ]) if any(f.num_rows for _, f in use)
                        else np.empty(0, np.int64)
                    )
                    if host.shape[0] < size:
                        host = np.concatenate([
                            host, np.full(size - host.shape[0], -1, np.int64)
                        ])
                    arr = jax.device_put(host, self._scan_sharding())
                    self.scan_cache[key] = arr
                cols.append(arr)
                continue
            cd = t.columns[i]
            key = (t.table_id, t.generation, cd.col_id, size, fkey)
            arr = self.scan_cache.get(key)
            if arr is None and fkey is not None and not cd.type.is_array:
                # device-slice fast path: if the FULL column is already
                # resident (device ingest / prestage), carve the wave out
                # of it instead of round-tripping through host chunks —
                # device-ingested tables may have no host master at all.
                # Slices are transient (one wave each) and NOT cached, so
                # they don't double-count against the LRU budget.
                full_key = (
                    t.table_id, t.generation, cd.col_id,
                    B.bucket(t.num_rows), None,
                )
                full = self.scan_cache.get(full_key)
                if full is not None:
                    gstart = np.cumsum(
                        [0] + [f.num_rows for f in t.fragments]
                    )
                    runs = []  # contiguous fragment-id runs → one slice
                    for fid in frag_ids:
                        if runs and fid == runs[-1][1]:
                            runs[-1][1] = fid + 1
                        else:
                            runs.append([fid, fid + 1])
                    segs = [
                        full[int(gstart[a]):int(gstart[b])]
                        for a, b in runs
                    ]
                    cat = segs[0] if len(segs) == 1 else jnp.concatenate(segs)
                    if cat.shape[0] < size:
                        pad = jnp.full(
                            size - cat.shape[0],
                            cd.type.null_sentinel(), cat.dtype,
                        )
                        cat = jnp.concatenate([cat, pad])
                    cols.append(cat)
                    continue
            if arr is None:
                if cd.type.is_none_string:
                    # none-encoded TEXT: device column = ids of the
                    # lazily-built per-generation dictionary (reference
                    # StringDictionaryProxy transient interning)
                    _, ids = t.lazy_text_dict(cd.col_id)
                    if frags is None:
                        host = ids
                    else:
                        gstart = np.cumsum(
                            [0] + [f.num_rows for f in t.fragments]
                        )
                        host = np.concatenate([
                            ids[int(gstart[f.fragment_id]):
                                int(gstart[f.fragment_id + 1])]
                            for f in frags
                        ]) if frags else np.empty(0, np.int32)
                    arr = self._staged_put(
                        host, size, T.text_dict(nullable=cd.type.nullable)
                    )
                    self.scan_cache[key] = arr
                    cols.append(arr)
                    continue
                if cd.type.is_array:
                    # array column device handle = GLOBAL rowid (stable
                    # across fragment skipping); lengths/offsets/flat ride
                    # as aux arrays (see _aux_array "array")
                    gstart = np.cumsum(
                        [0] + [f.num_rows for f in t.fragments[:-1]]
                    )
                    use = (
                        list(zip(gstart, t.fragments)) if frags is None
                        else [(gstart[f.fragment_id], f) for f in frags]
                    )
                    host = (
                        np.concatenate([
                            g + np.arange(f.num_rows, dtype=np.int32)
                            for g, f in use if f.num_rows
                        ]) if any(f.num_rows for _, f in use)
                        else np.empty(0, np.int32)
                    )
                elif frags is None:
                    host = t.column_values(cd.col_id)
                else:
                    parts = [f.chunks[cd.col_id] for f in frags if f.num_rows]
                    host = (
                        np.concatenate(parts)
                        if parts
                        else np.empty(0, cd.type.np_dtype())
                    )
                try:
                    crange = t.column_range(cd.col_id)
                except Exception:
                    crange = None
                arr = self._staged_put(host, size, cd.type, rng=crange)
                self.scan_cache[key] = arr
            cols.append(arr)
        return B.Batch(cols, n, list(node.types))

    # ---- Values ----
    def _exec_values(self, node: R.Values) -> B.Batch:
        n = len(node.rows)
        arrays = []
        for i, ti in enumerate(node.types):
            vals = [r[i] for r in node.rows]
            arr = np.array(
                [ti.null_sentinel() if v is None else v for v in vals],
                ti.np_dtype(),
            )
            arrays.append(arr)
        return B.from_host_columns(arrays, n, node.types)

    # ---- Union ----
    def _exec_union(self, node: R.Union, memo) -> B.Batch:
        parts = [
            self._exec(i, memo, set(range(i.arity))) for i in node.inputs
        ]
        out = B.concat_batches(parts)
        out.types = list(node.types)
        return out

    # ---- Sort ----
    def _exec_sort(self, node: R.Sort, memo) -> B.Batch:
        child = node.inputs[0]
        if not node.keys:
            # LIMIT/OFFSET without ORDER BY: pure slice in input order —
            # no permutation (a keyless 100M-row "sort" measured 13s)
            inp = self._exec(child, memo, set(range(child.arity)))
            off = node.offset or 0
            n_out = max(inp.nrows - off, 0)
            if node.limit is not None:
                n_out = min(n_out, node.limit)
            cols = inp.cols if not off else [
                None if c is None else c[off:] for c in inp.cols
            ]
            return B.Batch(list(cols), n_out, list(node.types))
        key_specs = [(asc, nf) for _, asc, nf in node.keys]
        key_idxs = [i for i, _, _ in node.keys]
        limit_total = (node.limit or 0) + (node.offset or 0)
        composite_specs = None
        if len(node.keys) > 1 and node.limit is not None:
            composite_specs = self._composite_sort_plan(node, child)
        topk_eligible = (
            node.limit is not None
            and 0 < limit_total <= 16384
            and (
                (len(node.keys) == 1
                 and not node.types[key_idxs[0]].is_dict_string)
                or composite_specs is not None
            )
        )
        # streamed top-k over fragment waves (reference StreamingTopN:
        # ORDER BY ... LIMIT without materializing the full input) — big
        # scans never exist as one batch, so tables beyond the device
        # budget stay sortable
        if topk_eligible and child.id not in memo:
            st = self._try_stream_topk(node, child, limit_total,
                                       composite_specs)
            if st is not None:
                return st
        inp = self._exec(child, memo, set(range(child.arity)))
        n = inp.nrows
        if n == 0:
            return B.Batch(inp.cols, 0, list(node.types))

        # top-k fast path: single sort key + small LIMIT → radix select
        # (reference StreamingTopN / TopKSort.cu role; full bitonic sorts of
        # large domains are very slow on TPU)
        if topk_eligible:
            return self._exec_topk(node, inp, limit_total,
                                   specs=composite_specs)

        # dict-encoded string keys sort by LEXICOGRAPHIC RANK, not id —
        # rank tables are the analogue of the reference's sorted string
        # dictionary index (StringDictionary::sortedIndex)
        rank_tables = {}
        for ki, idx in enumerate(key_idxs):
            if inp.types[idx].is_dict_string:
                ref = self._result_dict_ref(child, idx)
                if ref is not None:
                    rank_tables[ki] = self._dict_rank_table(ref)

        padded = inp.padded
        in_domain_n = jnp.asarray(n, jnp.int32)
        present = [i for i, c in enumerate(inp.cols) if c is not None]

        ck = ("sort", node.plan_key(), padded, tuple(present),
              tuple(str(inp.cols[i].dtype) for i in present),
              tuple(rank_tables))
        jitted = self.kernel_cache.get(ck)
        if jitted is None:
            def sort_kernel(nrows, ranks, *cols):
                in_domain = jax.lax.broadcasted_iota(jnp.int32, (padded,), 0) < nrows
                key_tvs = []
                for ki, idx in enumerate(key_idxs):
                    ti = inp.types[idx]
                    val = cols[present.index(idx)]
                    valid = _derive_valid(val, ti) if ti.nullable else None
                    if ki in rank_tables:
                        tbl = ranks[list(rank_tables).index(ki)]
                        safe = jnp.clip(val, 0, tbl.shape[0] - 1)
                        val = jnp.where(val >= 0, tbl[safe], -1)
                    key_tvs.append((val, valid))
                # all output columns ride the sort as payloads — a
                # per-column permutation gather costs ~480ms at 2^27
                _p, _v, sorted_cols = S.sort_permutation(
                    key_tvs, key_specs, in_domain, payloads=cols)
                return sorted_cols

            jitted = jax.jit(sort_kernel)
            self.kernel_cache[ck] = jitted
        sorted_cols_present = jitted(
            in_domain_n,
            tuple(rank_tables.values()),
            *[inp.cols[i] for i in present],
        )
        sorted_cols: List[Optional[jax.Array]] = [None] * len(inp.cols)
        for j, i in enumerate(present):
            sorted_cols[i] = sorted_cols_present[j]
        # apply offset/limit host-side
        off = node.offset or 0
        n_out = max(n - off, 0)
        if node.limit is not None:
            n_out = min(n_out, node.limit)
        if off:
            sorted_cols = [
                None if c is None else c[off : off + B.bucket(n_out)]
                for c in sorted_cols
            ]
        return B.Batch(sorted_cols, n_out, list(node.types))

    def _composite_sort_plan(self, node: R.Sort, child):
        """Multi-key ORDER BY ... LIMIT packing: per-key orderable bit
        widths — chunk-stat-narrowed ints, sign-flipped f32 — packed into
        one ≤63-bit radix-select key (reference role: multi-column
        StreamingTopN; TPU-native because ONE radix select replaces a full
        lexicographic sort).  Returns specs for ops.sort.composite_topk_key
        or None when the keys don't pack."""
        specs = []
        total = 0
        for idx, asc, nulls_first in node.keys:
            ti = node.types[idx]
            if ti.is_dict_string or ti.is_array or ti.is_geo \
                    or ti.is_string:
                return None
            if ti.is_fp:
                if np.dtype(ti.np_dtype()) != np.float32:
                    return None  # f64 never fits beside another key
                wv, lo = 32, None
            else:
                r = RNG.column_range(child, idx)
                if r is not None and r.hi >= r.lo:
                    extent = int(r.hi) - int(r.lo)
                    wv = max(extent.bit_length(), 1)
                    lo = int(r.lo)
                elif np.dtype(ti.np_dtype()).itemsize <= 4:
                    wv, lo = 32, None
                else:
                    return None  # unbounded 64-bit int beside another key
            w = wv + (1 if ti.nullable else 0)
            specs.append((wv, lo, asc, nulls_first, ti.nullable))
            total += w
        if total > 63:
            return None
        return tuple(specs), total

    def _try_stream_topk(self, node: R.Sort, child, k_total: int,
                         composite_specs=None):
        """ORDER BY <key> LIMIT k over fragment waves: per-wave radix
        select keeps k candidates, waves' winners concatenate (waves × k
        rows — tiny), and one final select picks the global top k.  The
        union of per-wave top-k is a superset of the global top-k, so
        this is exact.  Returns None when the input is small enough for
        the one-shot path (or the child shape doesn't stream)."""
        cfg = self.config
        thr = cfg.stream_threshold_bytes
        if thr < 0:
            return None
        if thr == 0:
            thr = (self.scan_cache.budget_bytes or (11 << 30)) // 2
        if isinstance(child, R.Scan):
            scan, compound = child, None
        elif (
            isinstance(child, R.Compound)
            and not child.is_aggregate
            and not child.join_levels
            and len(child.inputs) == 1
            and isinstance(child.inputs[0], R.Scan)
        ):
            scan, compound = child.inputs[0], child
        else:
            return None
        t = scan.table
        if len(t.fragments) < 2:
            return None
        if compound is None:
            scan_needed = set(range(scan.arity))
        else:
            scan_needed = set()
            for e in _iter_node_exprs(compound):
                for r in E.collect_input_refs(e):
                    scan_needed.add(r.field_idx)
        if any(_scan_field_type(t, f).is_array for f in scan_needed):
            return None
        row_bytes = max(
            sum(_scan_field_type(t, f).np_dtype().itemsize
                for f in scan_needed),
            1,
        )
        if t.num_rows * row_bytes <= thr:
            return None

        frag_ids = None
        fc = compound.filter_cond if compound is not None else None
        if fc is not None and getattr(
            self.config, "enable_fragment_skipping", True
        ):
            frag_ids = self._surviving_fragments(scan, 0, fc)
        if frag_ids is None:
            frag_ids = [f.fragment_id for f in t.fragments]

        # wave sizing: byte budget AND a row cap (radix select temporaries
        # are a few bytes/row; an uncapped 1B-row wave would OOM)
        wave_budget = max(thr // 2, 1)
        row_cap = getattr(cfg, "topk_stream_row_cap", 1 << 26)
        waves, cur, cur_bytes, cur_rows = [], [], 0, 0
        for fid in frag_ids:
            fr = t.fragments[fid].num_rows
            fb = fr * row_bytes
            if cur and (cur_bytes + fb > wave_budget
                        or cur_rows + fr > row_cap):
                waves.append(cur)
                cur, cur_bytes, cur_rows = [], 0, 0
            cur.append(fid)
            cur_bytes += fb
            cur_rows += fr
        if cur:
            waves.append(cur)
        if len(waves) < 2:
            return None

        winners: List[B.Batch] = []
        for wave in waves:
            self._checkpoint()
            batch = self._exec_scan(scan, scan_needed, frag_ids=wave)
            if compound is not None:
                plan = self._plan_compound(compound, [batch], [0])
                batch = self._run_compound(compound, [batch], plan)
            if batch.nrows == 0:
                continue
            winners.append(
                self._exec_topk(node, batch, k_total, apply_offset=False,
                                specs=composite_specs)
            )
        if not winners:
            return B.Batch(
                [jnp.empty(B.MIN_BUCKET, ti.np_dtype()) for ti in node.types],
                0, list(node.types),
            )
        cat = B.concat_batches(winners)
        cat.types = list(node.types)
        return self._exec_topk(node, cat, k_total, specs=composite_specs)

    def _exec_topk(self, node: R.Sort, inp: B.Batch, k_total: int,
                   apply_offset: bool = True, specs=None) -> B.Batch:
        """ORDER BY ... LIMIT k via radix select — single key directly,
        multi-key through a packed composite key (specs from
        _composite_sort_plan)."""
        idx, asc, nulls_first = node.keys[0]
        ti = inp.types[idx]
        padded = inp.padded
        k = min(k_total, padded)
        present = [i for i, c in enumerate(inp.cols) if c is not None]

        ck = ("topk", node.plan_key(), padded, k, tuple(present), specs,
              tuple(str(inp.cols[i].dtype) for i in present))
        jitted = self.kernel_cache.get(ck)
        if jitted is None and specs is not None:
            key_specs, total_bits = specs
            key_meta = [
                (i, inp.types[i]) for i, _, _ in node.keys
            ]

            def kernel(nrows, *cols):
                in_domain = jax.lax.broadcasted_iota(
                    jnp.int32, (padded,), 0) < nrows
                key_tvs = []
                for (kidx, kti) in key_meta:
                    val = cols[present.index(kidx)]
                    valid = (
                        _derive_valid(val, kti) if kti.nullable else None
                    )
                    key_tvs.append((val, valid))
                u, kbits = S.composite_topk_key(
                    key_tvs, key_specs, total_bits, in_domain=in_domain
                )
                top_idx = S.topk_indices_u(u, kbits, k)
                return tuple(c[top_idx] for c in cols)

            jitted = jax.jit(kernel)
            self.kernel_cache[ck] = jitted
        if jitted is None:
            def kernel(nrows, *cols):
                val = cols[present.index(idx)]
                in_domain = jax.lax.broadcasted_iota(jnp.int32, (padded,), 0) < nrows
                valid = _derive_valid(val, ti) if ti.nullable else None
                # build a DESCENDING-priority key in an order-exact dtype
                if val.dtype.kind == "f":
                    key = jnp.where(jnp.isnan(val), 0, val)
                    lo_sent = jnp.asarray(-np.inf, key.dtype)
                    hi_sent = jnp.asarray(np.inf, key.dtype)
                else:
                    # keep native width: 64-bit radix/compare ops are
                    # emulated on TPU (2x passes, each slower)
                    kdt = jnp.int64 if val.dtype.itemsize > 4 else jnp.int32
                    key = jnp.asarray(val, kdt)
                    lo_sent = jnp.asarray(jnp.iinfo(kdt).min + 1, kdt)
                    hi_sent = jnp.asarray(jnp.iinfo(kdt).max, kdt)
                if asc:
                    key = -key
                if valid is not None:
                    key = jnp.where(valid, key,
                                    hi_sent if nulls_first else lo_sent)
                key = jnp.where(in_domain, key, lo_sent)
                top_idx = S.topk_indices(key, k)
                return tuple(c[top_idx] for c in cols)

            jitted = jax.jit(kernel)
            self.kernel_cache[ck] = jitted
        out_present = jitted(
            jnp.asarray(inp.nrows, jnp.int32), *[inp.cols[i] for i in present]
        )
        out_cols: List[Optional[jax.Array]] = [None] * len(inp.cols)
        for j, i in enumerate(present):
            out_cols[i] = out_present[j]
        if not apply_offset:
            # per-wave call from the streamed path: keep ALL k_total
            # candidates; the final global select applies offset/limit
            return B.Batch(out_cols, min(inp.nrows, k), list(node.types))
        off = node.offset or 0
        n_out = max(min(inp.nrows, k) - off, 0)
        if node.limit is not None:
            n_out = min(n_out, node.limit)
        if off:
            out_cols = [None if c is None else c[off:] for c in out_cols]
        return B.Batch(out_cols, n_out, list(node.types))

    # ---- Unnest ----
    def _exec_unnest(self, node: "R.Unnest", memo) -> B.Batch:
        """One output row per array element: join-expansion machinery
        (unique-index scatters + i32 prefix sums) over the flat element
        payload.  Capacity = full flat size, so no retry is ever needed."""
        child = node.inputs[0]
        inp = self._exec(child, memo, set(range(child.arity)))
        afn = node.afn
        lengths_a, offsets_a, flat_a = self._array_aux(afn)
        cap = int(flat_a.shape[0])
        arr_idx = afn.rowid.field_idx
        present = [i for i, c in enumerate(inp.cols) if c is not None]
        padded = inp.padded

        ck = ("unnest", node.plan_key(), padded, cap, tuple(present),
              tuple(str(inp.cols[i].dtype) for i in present))
        jitted = self.kernel_cache.get(ck)
        if jitted is None:
            def kernel(nrows, lengths, offsets, flat, *cols):
                rid = jnp.asarray(cols[present.index(arr_idx)], jnp.int32)
                in_domain = (
                    jax.lax.broadcasted_iota(jnp.int32, (padded,), 0) < nrows
                )
                okr = in_domain & (rid >= 0)
                ridc = jnp.clip(rid, 0, lengths.shape[0] - 1)
                cnt = jnp.where(okr, jnp.maximum(lengths[ridc], 0), 0)
                lo = offsets[ridc]
                pidx, elem, out_mask, _, needed = J.expand_matches(
                    lo, cnt, flat, None, cap, False
                )
                pidx = jnp.where(out_mask, pidx, 0)
                return tuple(c[pidx] for c in cols) + (elem, needed)

            jitted = jax.jit(kernel)
            self.kernel_cache[ck] = jitted
        outs = jitted(
            jnp.asarray(inp.nrows, jnp.int32), lengths_a, offsets_a, flat_a,
            *[inp.cols[i] for i in present],
        )
        needed = int(jax.device_get(outs[-1]))
        out_cols: List[Optional[jax.Array]] = [None] * len(inp.cols)
        for j, i in enumerate(present):
            out_cols[i] = outs[j]
        out_cols.append(outs[-2])
        return B.Batch(out_cols, needed, list(node.types))

    # ---- Window ----
    def _exec_window(self, node: R.Window, memo) -> B.Batch:
        from heavydb_tpu.exec.window_kernel import run_window

        child = node.inputs[0]
        inp = self._exec(child, memo, set(range(child.arity)))
        # aux arrays for dictionary predicates/transforms inside window args
        aux = {}
        for w in node.wfuncs:
            for sub in E.walk(w):
                if isinstance(sub, E.StringPairConcat):
                    aux[sub.key()] = self._aux_array(("pairconcat", sub))
                if isinstance(sub, E.DictPairCompare):
                    aux[sub.key()] = self._aux_array(("pairrank", sub))
        for w in node.wfuncs:
            for sub in E.walk(w):
                if isinstance(sub, E.StringTransform):
                    aux[sub.key()] = self._aux_array(("strtransform", sub))
        for w in node.wfuncs:
            for sub in E.walk(w):
                if isinstance(sub, E.DictStrPredicate):
                    aux[sub.key()] = self._aux_array(("strpred", sub))
        # dict-encoded string ORDER BY keys must rank LEXICOGRAPHICALLY,
        # not by dictionary id (same contract as the Sort node) — ship the
        # id→rank table and have the kernel translate before sorting
        rank_info = {}
        for w in node.wfuncs:
            for e, _asc, _nf in w.order_by:
                if e.type.is_dict_string and isinstance(e, E.InputRef):
                    # the bound expr carries its dictionary identity;
                    # child-node resolution is the fallback (Compound
                    # targets built by intermediate passes may drop
                    # dict_ref — ranking by raw id would silently order
                    # strings by first-insertion, not lexicographically)
                    ref = getattr(e, "dict_ref", None) \
                        or self._result_dict_ref(child, e.field_idx)
                    if ref is not None:
                        ak = ("winrank", e.key())
                        aux[ak] = self._dict_rank_table(ref)
                        rank_info[e.key()] = (ak, self.db.dict_by_ref(ref).size)
        cols, wcols = run_window(node, inp, aux, cache=self.kernel_cache,
                                 rank_info=rank_info, config=self.config)
        return B.Batch(
            list(cols) + list(wcols), inp.nrows, list(node.types)
        )

    # ------------------------------------------------------------------
    # Compound
    # ------------------------------------------------------------------
    def _exec_compound(self, node: R.Compound, memo) -> B.Batch:
        ident = self._try_identity_projection(node, memo)
        if ident is not None:
            return ident
        sp = self._stream_plan(node)
        if sp is not None:
            return self._exec_compound_streamed(node, sp)
        batches, plan = self._prepare_compound(node, memo)
        return self._run_compound(node, batches, plan)

    def _try_identity_projection(self, node: R.Compound, memo):
        """Pure column-subset/reorder projections (every target a bare
        InputRef, no filter/join/agg) ALIAS the child's device buffers
        instead of launching a copy kernel.  Subquery wrappers around
        window/group-by results hit this constantly; at 134M rows the
        skipped kernel re-materialized ~3.4GB of (emulated-64-bit)
        columns per query (measured round 5: 1.0-1.8s of the 100M window
        bench was this copy).  Reference role: Calcite would have folded
        the trivial RelProject; our builder keeps subquery projections
        as Compounds, so the executor folds them at dispatch."""
        if len(node.inputs) != 1 or node.is_aggregate or node.aggs:
            return None
        if node.filter_cond is not None or node.having is not None:
            return None
        if node.group_exprs:
            return None
        if any(c is not None for _, c in node.join_levels):
            return None
        refs = []
        for e in node.target_exprs:
            if not isinstance(e, E.InputRef):
                return None
            refs.append(e)
        child = node.inputs[0]
        for e, tt in zip(refs, node.types):
            if child.types[e.field_idx] != tt:
                return None
        needed = {e.field_idx for e in refs}
        inp = self._exec(child, memo, needed)
        cols = [inp.cols[e.field_idx] for e in refs]
        if any(c is None for c in cols):
            return None
        return B.Batch(cols, inp.nrows, list(node.types))

    def _run_compound(self, node: R.Compound, batches, plan) -> B.Batch:
        # retry ladder
        for attempt in range(MAX_RETRIES + 1):
            self._checkpoint()
            kernel, layout = self._get_kernel(node, batches, plan)
            args = self._kernel_args(batches, plan, layout)
            try:
                outs = _retry_remote_compile(kernel, *args)
            except Exception as exc:
                # trace-time radix-tier bailout (e.g. the compiled
                # aggregate shape diverged from the static stream plan):
                # reroute this node to the sort tier and retry
                from heavydb_tpu.exec.radix_tier import RadixUnsupported

                if isinstance(exc, RadixUnsupported) and \
                        plan.group_strategy and \
                        plan.group_strategy[0] == "radix":
                    plan.group_strategy = ("sort", None)
                    continue
                raise
            result = self._postprocess(node, plan, outs)
            if result is not None:
                return result
            # capacity miss — plan.caps updated by _postprocess via plan
        raise ExecutionError("capacity retry ladder did not converge")

    # ---- fragment-streaming execution (out-of-core; reference
    # gpu_input_mem_limit punt + leaf partial-agg/aggregator-merge) ----

    def _stream_plan(self, node: R.Compound):
        """Return the byte threshold when this Compound should execute in
        fragment waves with partial-aggregate merge (tables larger than the
        device cache stay queryable); None = execute normally."""
        cfg = self.config
        thr = cfg.stream_threshold_bytes
        if thr < 0:
            return None
        if thr == 0:
            thr = (self.scan_cache.budget_bytes or (11 << 30)) // 2
        if node.join_levels or len(node.inputs) != 1:
            return None
        inp = node.inputs[0]
        if not isinstance(inp, R.Scan) or len(inp.table.fragments) < 2:
            return None
        from heavydb_tpu.exec.partial_agg import decomposable

        if not decomposable(node):
            return None
        needed = set()
        for e in list(node.group_exprs) + list(node.aggs) + (
            [node.filter_cond] if node.filter_cond is not None else []
        ):
            for r in E.collect_input_refs(e):
                needed.add(r.field_idx)
        t = inp.table
        total = 0
        for f in needed:
            ti = _scan_field_type(t, f)
            if ti.is_array:
                return None  # array aux payloads aren't fragment-local
            total += t.num_rows * ti.np_dtype().itemsize
        if total <= thr:
            return None
        return thr

    def _exec_compound_streamed(self, node: R.Compound, thr: int) -> B.Batch:
        """Execute in fragment waves: per-wave Compound with decomposed
        aggregates (AVG → SUM+COUNT), host-merge of the small per-wave
        group results, then one merge Compound re-aggregating partials
        (SUM of counts/sums, MIN of mins, ...) and applying the original
        targets/having over finalize expressions."""
        from heavydb_tpu.exec.partial_agg import make_leaf_node, make_merge_node

        scan = node.inputs[0]
        t = scan.table
        wave_node, wave_aggs, fin = make_leaf_node(node)
        wave_targets = wave_node.target_exprs
        wave_names = wave_node.fields

        # fragment waves sized to ~half the threshold
        frag_ids = None
        if node.filter_cond is not None and getattr(
            self.config, "enable_fragment_skipping", True
        ):
            frag_ids = self._surviving_fragments(scan, 0, node.filter_cond)
        if frag_ids is None:
            frag_ids = [f.fragment_id for f in t.fragments]
        needed_fields = set()
        for e in list(node.group_exprs) + list(node.aggs) + (
            [node.filter_cond] if node.filter_cond is not None else []
        ):
            for r in E.collect_input_refs(e):
                needed_fields.add(r.field_idx)
        row_bytes = max(
            sum(_scan_field_type(t, f).np_dtype().itemsize
                for f in needed_fields),
            1,
        )
        wave_budget = max(thr // 2, 1)
        waves, cur, cur_bytes = [], [], 0
        for fid in frag_ids:
            fb = t.fragments[fid].num_rows * row_bytes
            if cur and cur_bytes + fb > wave_budget:
                waves.append(cur)
                cur, cur_bytes = [], 0
            cur.append(fid)
            cur_bytes += fb
        if cur:
            waves.append(cur)

        parts: List[List[np.ndarray]] = []
        for wave in waves:
            self._checkpoint()
            batch = self._exec_scan(scan, needed_fields, frag_ids=wave)
            plan = self._plan_compound(wave_node, [batch], [0])
            out = self._run_compound(wave_node, [batch], plan)
            parts.append(out.to_numpy())

        arrays = [
            np.concatenate([p[i] for p in parts])
            for i in range(len(wave_targets))
        ]
        dict_refs = [
            getattr(wt, "dict_ref", None) for wt in wave_targets
        ]
        td = R.TableData(
            wave_names, [wt.type for wt in wave_targets], arrays, dict_refs
        )
        merge_node = make_merge_node(node, wave_aggs, fin, td)
        return self._exec(
            merge_node, {}, set(range(merge_node.arity))
        )

    def _prepare_compound(self, node: R.Compound, memo):
        # 1. input batches with column pruning
        offsets = []
        off = 0
        for i in node.inputs:
            offsets.append(off)
            off += i.arity
        total_fields = off

        needed_fields = set()
        for e in _iter_node_exprs(node):
            for r in E.collect_input_refs(e):
                needed_fields.add(r.field_idx)
        # group/filter/join refs are over the combined input domain; targets
        # over the agg domain reference agg outputs — exclude those
        if node.is_aggregate:
            needed_fields = set()
            for e in list(node.group_exprs) + list(node.aggs) + [
                c for _, c in node.join_levels if c is not None
            ] + ([node.filter_cond] if node.filter_cond is not None else []):
                for r in E.collect_input_refs(e):
                    needed_fields.add(r.field_idx)

        per_input_needed = [set() for _ in node.inputs]
        for f in needed_fields:
            for i in reversed(range(len(node.inputs))):
                if f >= offsets[i]:
                    per_input_needed[i].add(f - offsets[i])
                    break

        batches = []
        for i, inp in enumerate(node.inputs):
            frag_ids = None
            if (
                isinstance(inp, R.Scan)
                and getattr(self.config, "enable_fragment_skipping", True)
                and node.filter_cond is not None
                and len(inp.table.fragments) > 1
            ):
                frag_ids = self._surviving_fragments(
                    inp, offsets[i], node.filter_cond
                )
            if frag_ids is not None:
                batches.append(self._exec_scan(inp, per_input_needed[i], frag_ids))
            else:
                batches.append(self._exec(inp, memo, per_input_needed[i]))

        # 1b. RUNTIME join reordering: inputs are materialized, so actual
        # cardinalities are known — correct plan-time estimate mistakes
        # (intermediate results, post-filter sizes).  The reference's
        # FromTableReordering uses the same cardinality rule.
        if len(node.inputs) > 1:
            from heavydb_tpu.plan.optimizer import _reorder_joins

            sizes = [b.nrows for b in batches]
            if (
                getattr(self.config, "enable_selectivity_probe", True)
                and node.filter_cond is not None
                and all(k == "INNER" and c is not None
                        for k, c in node.join_levels)
            ):
                try:
                    sizes = self._selectivity_sizes(
                        node, batches, offsets, sizes
                    )
                except Exception:
                    pass  # probe is advisory; fall back to raw counts
            _reorder_joins(node, sizes=sizes)
            order = node.__dict__.pop("_reordered", None)
            if order:
                batches = [batches[i] for i in order]
                offsets = []
                off = 0
                for i_ in node.inputs:
                    offsets.append(off)
                    off += i_.arity

        # 2. plan the kernel (strategy, caps, aux arrays)
        plan = self._plan_compound(node, batches, offsets)
        return batches, plan

    # ---- dynamic selectivity probe (reference JoinFilterPushDown.cpp:
    # execute the filter, measure selectivity, re-plan the join order) ----
    def _selectivity_sizes(self, node, batches, offsets, sizes):
        """Post-filter effective cardinality per join input: counts the
        rows surviving each input's single-input WHERE conjuncts with a
        tiny fused count kernel.  The reference runs a selectivity probe
        and round-trips through Calcite to re-plan
        (DBHandler::execute_rel_alg_with_filter_push_down); here the
        probed counts feed the runtime join reorder directly."""
        from heavydb_tpu.plan.optimizer import _split_conjuncts

        n_in = len(node.inputs)
        per_input: Dict[int, list] = {}
        for c in _split_conjuncts(node.filter_cond):
            refs = E.collect_input_refs(c)
            if not refs:
                continue
            owner = set()
            for r in refs:
                for i in reversed(range(n_in)):
                    if r.field_idx >= offsets[i]:
                        owner.add(i)
                        break
            if len(owner) == 1:
                per_input.setdefault(next(iter(owner)), []).append(c)
        if not per_input:
            return sizes

        out = list(sizes)
        if len(self._sel_cache) > 4096:
            self._sel_cache.clear()
        for bi, conjs in per_input.items():
            if n_in == 2 and sizes[bi] <= sizes[1 - bi]:
                # two-input case: shrinking the already-smaller side cannot
                # flip the probe/build decision — skip the device round trip
                continue
            ckeys = tuple(sorted(c.key() for c in conjs))
            gens = tuple(sorted(
                (s.table.table_id, s.table.generation)
                for s in _walk_nodes(node.inputs[bi])
                if isinstance(s, R.Scan)
            ))
            rkey = ("selprobe", node.inputs[bi].plan_key(),
                    ckeys, gens, batches[bi].nrows)
            hit = self._sel_cache.get(rkey)
            if hit is not None:
                out[bi] = hit
                continue
            cnt = self._probe_count(node, batches[bi], offsets[bi], conjs)
            if cnt is None:
                continue
            self._sel_cache[rkey] = cnt
            out[bi] = cnt
        return out

    def _probe_count(self, node, batch, offset, conjs):
        """Device count of batch rows passing `conjs` (all conjuncts
        reference only this input's fields)."""
        # aux arrays the conjuncts need (dict predicates / transforms)
        aux_specs = {}
        for c in conjs:
            for sub in E.walk(c):
                if isinstance(sub, E.DictStrPredicate):
                    aux_specs[sub.key()] = ("strpred", sub)
                elif isinstance(sub, E.StringTransform):
                    aux_specs[sub.key()] = ("strtransform", sub)
                elif isinstance(sub, E.StringPairConcat):
                    aux_specs[sub.key()] = ("pairconcat", sub)
                elif isinstance(sub, E.DictPairCompare):
                    aux_specs[sub.key()] = ("pairrank", sub)
                elif isinstance(sub, E.ArrayFn) and sub.op != "UNNEST":
                    aux_specs[sub.key()] = ("array", sub)
                elif isinstance(sub, (E.SubqueryExpr, E.Agg, E.WindowFunc)):
                    return None
        needed = sorted({
            r.field_idx for c in conjs for r in E.collect_input_refs(c)
        })
        locals_ = [f - offset for f in needed]
        if any(l < 0 or l >= len(batch.cols) or batch.cols[l] is None
               for l in locals_):
            return None
        aux_order = sorted(aux_specs.keys(), key=repr)
        ckeys = tuple(sorted(c.key() for c in conjs))
        kkey = ("selprobe_kernel", ckeys, batch.padded,
                tuple(str(batch.types[l].np_dtype()) for l in locals_),
                tuple(aux_order))
        jitted = self.kernel_cache.get(kkey)
        if jitted is None:
            types = [batch.types[l] for l in locals_]
            fields = list(needed)
            padded = batch.padded
            udfs = dict(getattr(self.db, "_udfs", {}))

            def kern(nrows, aux_vals, *cols):
                cdict = {}
                for f, ti, v in zip(fields, types, cols):
                    valid = _derive_valid(v, ti) if ti.nullable else None
                    cdict[f] = (v, valid)
                comp = ExprCompiler(cdict, dict(zip(aux_order, aux_vals)),
                                    {}, udfs)
                m = jax.lax.broadcasted_iota(
                    jnp.int32, (padded,), 0) < nrows
                for c in conjs:
                    m = m & comp.compile_predicate(c)
                return m.sum(dtype=jnp.int32)

            jitted = jax.jit(kern)
            self.kernel_cache[kkey] = jitted
        # same two-stage build as _kernel_args: pair concats populate the
        # transient dictionaries that transforms/predicates over them read
        staged = {}
        for stage in ("pairconcat", "strtransform"):
            for k in aux_order:
                if aux_specs[k][0] == stage:
                    staged[k] = self._aux_array(aux_specs[k])
        aux_vals = tuple(
            staged[k] if k in staged else self._aux_array(aux_specs[k])
            for k in aux_order
        )
        cnt = jitted(jnp.asarray(batch.nrows, jnp.int32), aux_vals,
                     *[batch.cols[l] for l in locals_])
        return int(jax.device_get(cnt))

    # ---- fragment skipping (reference Executor::skipFragment,
    # Execute.cpp:4776: compare simple quals against chunk min/max) ----
    def _surviving_fragments(self, scan: R.Scan, offset: int, filter_cond):
        from heavydb_tpu.plan.optimizer import _split_conjuncts

        t = scan.table
        quals = []  # (col_id, op, physical value)
        for c in _split_conjuncts(filter_cond):
            q = self._simple_qual(c, scan, offset)
            if q is not None:
                quals.append(q)
        if not quals:
            return None
        keep = []
        for frag in t.fragments:
            ok = True
            for col_id, op, v in quals:
                st = frag.stats.get(col_id)
                if st is None or st.min is None:
                    continue
                mn, mx = st.min, st.max
                if op == "=" and not (mn <= v <= mx):
                    ok = False
                elif op == "<" and not (mn < v):
                    ok = False
                elif op == "<=" and not (mn <= v):
                    ok = False
                elif op == ">" and not (mx > v):
                    ok = False
                elif op == ">=" and not (mx >= v):
                    ok = False
                if not ok:
                    break
            if ok:
                keep.append(frag.fragment_id)
        if len(keep) == len(t.fragments):
            return None
        return keep

    def _simple_qual(self, c, scan: R.Scan, offset: int):
        """col <cmp> const over this scan's columns → (col_id, op, value)."""
        _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}
        if isinstance(c, E.DictStrPredicate) and c.kind == "CMP" \
                and c.cmp_op == "=" and not c.negated \
                and isinstance(c.arg, E.InputRef):
            local = c.arg.field_idx - offset
            if 0 <= local < len(scan.table.columns) \
                    and c.dict_ref is not None:
                d = self.db.dict_by_ref(c.dict_ref)
                sid = d.get_id(c.pattern)
                cd = scan.table.columns[local]
                if (scan.table.table_id, cd.col_id) == c.dict_ref:
                    return (cd.col_id, "=", sid)
            return None
        if not isinstance(c, E.BinOp) or c.op not in E.COMPARISON_OPS \
                or c.op == E.BinOpKind.NE:
            return None
        lhs, rhs, op = c.left, c.right, c.op.value
        if isinstance(rhs, E.InputRef) and isinstance(lhs, E.Constant):
            lhs, rhs = rhs, lhs
            op = _FLIP.get(op, op)
        if not (isinstance(lhs, E.InputRef) and isinstance(rhs, E.Constant)):
            return None
        if rhs.value is None:
            return None
        local = lhs.field_idx - offset
        if not (0 <= local < len(scan.table.columns)):
            return None
        cd = scan.table.columns[local]
        if not (cd.type.is_integer or cd.type.is_time or cd.type.is_decimal
                or cd.type.is_boolean):
            return None
        try:
            v = int(rhs.value)
        except (TypeError, ValueError):
            return None
        return (cd.col_id, op, v)

    # ---- compound planning ----
    def _plan_compound(self, node: R.Compound, batches, offsets):
        cfg = self.config
        plan = _CompoundPlan(node=node, offsets=offsets)
        plan.udfs = dict(getattr(self.db, '_udfs', {}))
        probe = batches[0]

        # static watchdog (reference g_enable_watchdog pre-execution
        # heuristics, Execute.cpp:75): reject unbounded huge projections
        hints = getattr(self, "exec_hints", {}) or {}
        watchdog = cfg.enable_watchdog or hints.get("watchdog")
        if hints.get("no_watchdog"):
            watchdog = False
        if watchdog and not node.is_aggregate:
            if probe.nrows > cfg.watchdog_max_projected_rows:
                raise WatchdogException(
                    f"projection over {probe.nrows:,} rows exceeds the "
                    f"watchdog limit ({cfg.watchdog_max_projected_rows:,})"
                )

        # ---- filter push-down into the join pipeline (reference
        # FILTER_PROJECT_TRANSPOSE rules + JoinFilterPushDown): conjuncts
        # of the post-join WHERE that reference a single input move to
        # (a) the probe mask BEFORE any join expansion (input 0) or
        # (b) the build-side validity of an INNER level (build rows that
        # fail never enter the hash table, shrinking expansion caps).
        # The reference needs a selectivity probe + Calcite re-plan to do
        # this; here the pushed conjunct runs inside the same fused
        # kernel over a strictly smaller domain, so pushing never loses.
        # FULL levels disable the split (their appended null-extended
        # rows must see the post-join filter); DIV/MOD conjuncts stay put
        # (error flags must not fire for rows a join would have dropped).
        if node.filter_cond is not None and node.join_levels \
                and not any(k == "FULL" for k, _ in node.join_levels):
            from heavydb_tpu.plan.optimizer import _split_conjuncts

            rest = []
            for c in _split_conjuncts(node.filter_cond):
                refs = E.collect_input_refs(c)
                pushable = bool(refs) and not any(
                    isinstance(s, E.BinOp)
                    and s.op in (E.BinOpKind.DIV, E.BinOpKind.MOD)
                    for s in E.walk(c)
                )
                owner = set()
                for r in refs:
                    for i in reversed(range(len(node.inputs))):
                        if r.field_idx >= offsets[i]:
                            owner.add(i)
                            break
                if pushable and owner == {0}:
                    plan.pre_mask.append(c)
                elif pushable and len(owner) == 1 and \
                        node.join_levels[next(iter(owner)) - 1][0] == "INNER":
                    bi = next(iter(owner))
                    plan.build_filters.setdefault(bi, []).append(c)
                else:
                    rest.append(c)
            plan.filter_rest = rest

        # join levels
        for li, (kind, cond) in enumerate(node.join_levels):
            build_input = li + 1
            boundary = offsets[build_input]
            b_arity = node.inputs[build_input].arity
            equis, residual = _split_join_condition(cond, boundary, boundary + b_arity)
            if kind == "CROSS" and cond is None:
                build_rows = batches[build_input].nrows
                if build_rows * max(probe.nrows, 1) > cfg.watchdog_max_projected_rows:
                    raise WatchdogException("cross join too large")
                plan.joins.append(_JoinPlan(kind="CROSS", residual=None))
                plan.caps.append(B.bucket(max(probe.nrows * max(build_rows, 1), 1)))
                continue
            if not equis:
                # spatial predicates: grid-bucket candidate join (reference
                # BoundingBoxIntersectJoinHashTable) — the geo conjunct
                # stays in the residual as the exact test
                gj = GEO.plan_geo_join(residual, boundary, boundary + b_arity)
                if gj is None or kind != "INNER":
                    raise NotSupported(
                        "non-equi join conditions require ≥1 equality"
                    )
                probe_keys, build_keys, spec, extra_aux = gj
                for k_, s_ in extra_aux:
                    plan.aux_specs.setdefault(k_, s_)
                jp = _JoinPlan(kind="INNER", probe_keys=probe_keys,
                               build_keys=build_keys, residual=residual,
                               pack="geo", geo=spec)
                plan.joins.append(jp)
                est = max(probe.nrows, batches[build_input].nrows, 1) * 4
                jp.fallback_cap = B.bucket(est)
                plan.caps.append(jp.fallback_cap)
                continue
            if kind == "FULL" and residual:
                # build-side matched flags don't see residual kills yet
                raise NotSupported(
                    "FULL JOIN with non-equi residual conditions"
                )
            jp = self._plan_join_keys(node, equis, residual, kind, batches, build_input)
            if (
                jp.key_min is not None
                and kind in ("INNER", "LEFT")
                and not jp.residual
                and jp.key_range >= batches[build_input].nrows
            ):
                # PK-side heuristic: dense range at least as wide as the row
                # count → likely unique keys; runtime dup check corrects
                jp.unique_build = True
            plan.joins.append(jp)
            est = max(probe.nrows, batches[build_input].nrows, 1)
            jp.fallback_cap = B.bucket(est)
            if jp.unique_build:
                plan.caps.append(0)  # identity domain, no expansion
            else:
                plan.caps.append(jp.fallback_cap)

        # group-by strategy
        if node.is_aggregate and node.group_exprs:
            ranges = [RNG.expr_range(g, node.inputs) for g in node.group_exprs]
            # chunk-stat ranges don't know about outer-join null extension:
            # LEFT makes the build side nullable, FULL makes both sides
            # nullable — group keys over those fields need a null slot
            outer_nullable = set()
            acc = 0
            offs = []
            for i_ in node.inputs:
                offs.append(acc)
                acc += i_.arity
            for li, (kind_, _) in enumerate(node.join_levels):
                bi_ = li + 1
                if kind_ == "LEFT":
                    outer_nullable |= set(
                        range(offs[bi_], offs[bi_] + node.inputs[bi_].arity)
                    )
                elif kind_ == "FULL":
                    outer_nullable |= set(
                        range(0, offs[bi_] + node.inputs[bi_].arity)
                    )
            if outer_nullable:
                for gi, g in enumerate(node.group_exprs):
                    if ranges[gi] is not None and not ranges[gi].has_nulls \
                            and any(r.field_idx in outer_nullable
                                    for r in E.collect_input_refs(g)):
                        ranges[gi] = RNG.IntRange(
                            ranges[gi].lo, ranges[gi].hi, True,
                            bucket=ranges[gi].bucket,
                        )
            slots = 1
            ok = True
            for r in ranges:
                if r is None or r.extent <= 0 or r.extent > cfg.baseline_groupby_threshold:
                    ok = False
                    break
                slots *= r.extent + (1 if r.has_nulls else 0)
                if slots > cfg.baseline_groupby_threshold:
                    ok = False
                    break
            if ok and slots > cfg.sortagg_min_slots:
                # huge-but-dense key spaces: the radix-partition Pallas
                # tier (kernels/radix_groupby — 59.6ms at 20M rows x 10M
                # slots) when the aggregates fit its stream budget, else
                # the sorted-segment tier (190ms same shape): both beat
                # per-slot scatters and never materialize [slots]-sized
                # buffers for near-empty domains
                from heavydb_tpu.exec import radix_tier as RT
                from heavydb_tpu.ops.groupby import _pallas_available

                cap0 = B.bucket(min(slots, max(batches[0].padded, 8)))
                if RT.eligible(node, ranges, slots, cfg,
                               _pallas_available()):
                    plan.group_strategy = ("radix", tuple(
                        (r.lo, r.extent, r.has_nulls, r.bucket)
                        for r in ranges
                    ))
                else:
                    plan.group_strategy = ("sort", None)
                plan.group_cap = cap0
            elif ok:
                plan.group_strategy = ("perfect", tuple(
                    (r.lo, r.extent, r.has_nulls, r.bucket) for r in ranges
                ))
                plan.group_cap = slots
            else:
                pack = _hash_pack_spec(node.group_exprs, ranges)
                ndv = self._estimate_group_ndv(node)
                n_rows = max(batches[0].nrows, 1)
                # hash claiming needs BOTH low collision depth (rows/NDV)
                # and VMEM-sized claim tables; on this runtime colliding
                # scatters cost ~4.6us/slot past VMEM, so it's opt-in
                # (reference: CardinalityEstimator drives the same choice)
                hash_ok = (
                    cfg.enable_hash_groupby
                    and pack is not _NO_PACK
                    and ndv is not None
                    and n_rows // max(ndv, 1) <= 32
                    and ndv <= (1 << 19)
                )
                if hash_ok:
                    plan.group_strategy = ("hash", pack)
                    cap = batches[0].padded // 4
                    if ndv is not None:
                        cap = min(cap, 4 * ndv)
                    plan.group_cap = B.bucket(
                        min(max(cap, 4096), 1 << 21)
                    )
                else:
                    plan.group_strategy = ("sort", None)
                    plan.group_cap = B.bucket(
                        min(cfg.baseline_groupby_initial_entries,
                            max(batches[0].padded, 8))
                    )
        elif node.is_aggregate:
            plan.group_strategy = ("keyless", None)
            plan.group_cap = 1

        # aux arrays (dictionary predicates + join translations + agg ranks)
        for e in _iter_node_exprs(node):
            for sub in E.walk(e):
                if isinstance(sub, E.DictStrPredicate):
                    plan.aux_specs.setdefault(sub.key(), ("strpred", sub))
                if isinstance(sub, E.StringTransform):
                    plan.aux_specs.setdefault(sub.key(), ("strtransform", sub))
                if isinstance(sub, E.StringPairConcat):
                    plan.aux_specs.setdefault(sub.key(), ("pairconcat", sub))
                if isinstance(sub, E.DictPairCompare):
                    plan.aux_specs.setdefault(sub.key(), ("pairrank", sub))
                if isinstance(sub, E.ArrayFn) and sub.op != "UNNEST":
                    plan.aux_specs.setdefault(sub.key(), ("array", sub))
                if isinstance(sub, E.Agg) and sub.kind in (
                    E.AggKind.MIN, E.AggKind.MAX
                ) and sub.arg is not None and sub.arg.type.is_dict_string:
                    ref = getattr(sub.arg, "dict_ref", None)
                    if ref is not None:
                        plan.aux_specs.setdefault(
                            ("dictrank", ref), ("dictrank", ref)
                        )
                        plan.aux_specs.setdefault(
                            ("dictorder", ref), ("dictorder", ref)
                        )
        for jp in plan.joins:
            if jp.translate is not None:
                plan.aux_specs.setdefault(jp.translate, ("translate", jp.translate))
        return plan

    def _plan_join_keys(self, node, equis, residual, kind, batches, build_input):
        """Choose key packing for (possibly multi-column) equi keys."""
        probe_exprs = [l for l, r in equis]
        build_exprs = [r for l, r in equis]
        translate = None
        if len(equis) == 1:
            pe, be = probe_exprs[0], build_exprs[0]
            if pe.type.is_dict_string or be.type.is_dict_string:
                pref = getattr(pe, "dict_ref", None)
                bref = getattr(be, "dict_ref", None)
                if pref is None or bref is None:
                    raise NotSupported("join on computed string keys")
                if pref != bref:
                    translate = (bref, pref)
            if pe.type.is_fp or be.type.is_fp:
                raise NotSupported("float join keys")
            # perfect (dense positional) build when the build key range is
            # known and modest — probe becomes pure gathers (reference
            # PerfectJoinHashTable); avoids device sorts entirely
            key_min = key_range = None
            if translate is None:
                br = RNG.expr_range(be, node.inputs)
                if br is not None and 0 < br.extent <= min(
                    self.config.perfect_join_max_range,
                    max(batches[build_input].padded * 4, 1 << 16),
                ):
                    key_min, key_range = br.lo, br.extent
            return _JoinPlan(kind=kind, probe_keys=probe_exprs,
                             build_keys=build_exprs, residual=residual,
                             translate=translate, pack="single",
                             key_min=key_min, key_range=key_range)
        # multi-key: exact range packing if possible, else hash + recheck.
        # Dictionary-encoded string keys are only id-comparable within ONE
        # dictionary; cross-dict multi-key joins would range/hash-pack raw
        # ids from different dictionaries (silently wrong), so refuse.
        for pe, be in zip(probe_exprs, build_exprs):
            if pe.type.is_dict_string or be.type.is_dict_string:
                pref = getattr(pe, "dict_ref", None)
                bref = getattr(be, "dict_ref", None)
                if pref is None or bref is None or pref != bref:
                    raise NotSupported(
                        "multi-column join with cross-dictionary string keys"
                    )
        ranges = [RNG.expr_range(b, node.inputs) for b in build_exprs]
        pranges = [RNG.expr_range(p, node.inputs) for p in probe_exprs]
        spans = []
        ok = True
        for rb, rp in zip(ranges, pranges):
            if rb is None or rp is None:
                ok = False
                break
            lo = min(rb.lo, rp.lo)
            hi = max(rb.hi, rp.hi)
            spans.append((lo, hi - lo + 1))
        total = 1
        if ok:
            for _, ext in spans:
                total *= ext
                if total > (1 << 62):
                    ok = False
                    break
        if ok:
            return _JoinPlan(kind=kind, probe_keys=probe_exprs,
                             build_keys=build_exprs, residual=residual,
                             pack="range", pack_spans=tuple(spans))
        if kind in ("LEFT", "FULL"):
            raise NotSupported(
                f"{kind} JOIN with unpackable multi-column keys"
            )
        # hash pack: append equality recheck to residual
        eq_conds = []
        for l, r in zip(probe_exprs, build_exprs):
            eq_conds.append(E.BinOp(E.BinOpKind.EQ, l, r, T.boolean(True)))
        residual = list(residual) + eq_conds
        return _JoinPlan(kind=kind, probe_keys=probe_exprs,
                         build_keys=build_exprs, residual=residual,
                         pack="hash")

    # ---- kernel build & cache ----
    def _get_kernel(self, node, batches, plan):
        shapes = tuple(
            (b.padded,) + tuple(
                (i, str(c.dtype)) for i, c in enumerate(b.cols) if c is not None
            )
            for b in batches
        )
        key = (
            node.plan_key(),
            shapes,
            tuple(plan.caps),
            plan.group_strategy,
            plan.group_cap,
            getattr(plan, "distinct_force_sort", False),
            tuple(
                (jp.kind, jp.pack, jp.pack_spans, jp.key_min, jp.key_range,
                 jp.translate, jp.unique_build,
                 getattr(jp, "hash_fallback", False), jp.geo)
                for jp in plan.joins
            ),
            tuple(sorted(plan.aux_specs.keys(), key=repr)),
        )
        hit = self.kernel_cache.get(key)
        if hit is not None:
            return hit
        kernel, layout = _build_compound_kernel(node, batches, plan, self.config)
        jitted = jax.jit(kernel)
        wrapped = _ArtifactKernel.wrap(key, jitted, self.config)
        self.kernel_cache[key] = (wrapped, layout)
        return wrapped, layout

    def _kernel_args(self, batches, plan, layout):
        args = []
        for bi, cols in layout.batch_cols:
            for ci in cols:
                args.append(batches[bi].cols[ci])
        for bi in layout.nrows_batches:
            args.append(jnp.asarray(batches[bi].nrows, jnp.int32))
        # string transforms FIRST: they populate the transient dictionaries
        # that predicates/rank tables over transformed strings read
        # (pair concats before single-column chains — a chain may read a
        # pair's output dictionary)
        aux_vals = {}
        for stage in ("pairconcat", "strtransform"):
            for aux_key in layout.aux_order:
                spec = plan.aux_specs[aux_key]
                if spec[0] == stage:
                    aux_vals[aux_key] = self._aux_array(spec)
        for aux_key in layout.aux_order:
            if aux_key not in aux_vals:
                aux_vals[aux_key] = self._aux_array(plan.aux_specs[aux_key])
        args.extend(aux_vals[k] for k in layout.aux_order)
        return args

    # ---- aux arrays ----
    def _aux_array(self, spec) -> jax.Array:
        kind, payload = spec
        if kind == "strpred":
            pred: E.DictStrPredicate = payload
            d = self.db.dict_by_ref(pred.dict_ref)
            cache_key = ("strpred", pred.dict_ref, d.size, pred.key())
            hit = self.aux_cache.get(cache_key)
            if hit is not None:
                return hit
            size = max(d.size, 1)
            padded = B.bucket(size)
            if pred.kind == "LENGTH":
                host = np.zeros(padded, np.int32)
                for i, s in enumerate(d.entries()):
                    host[i] = len(s)
            elif pred.kind == "TRYCAST":
                import json as _json

                kind_name, scale = _json.loads(pred.pattern)
                ti = pred.type
                dt = ti.np_dtype()
                sent = ti.null_sentinel()
                host = np.full(padded, sent, dt)
                if ti.kind in (T.SQLTypeKind.DATE, T.SQLTypeKind.TIMESTAMP,
                               T.SQLTypeKind.TIME):
                    # TRY_CAST(text AS DATE/TIMESTAMP/TIME): ISO parse per
                    # entry, NULL on failure (reference TryStringCast →
                    # StringToDatum, StringOps.cpp:98)
                    from heavydb_tpu.plan.builder import _const_cast

                    from heavydb_tpu.types import text_none as _tn

                    for i, entry in enumerate(d.entries()):
                        try:
                            v = _const_cast(entry, _tn(), ti)
                        except Exception:
                            continue
                        if v is not None:
                            host[i] = v
                    arr = jax.device_put(host)
                    self.aux_cache[cache_key] = arr
                    return arr
                for i, entry in enumerate(d.entries()):
                    try:
                        v = float(entry.strip())
                    except ValueError:
                        continue
                    if dt.kind == "f":
                        host[i] = v
                    else:
                        if ti.is_decimal:
                            v = round(v * 10**scale)
                        if abs(v - round(v)) < 1e-9 or ti.is_decimal:
                            iv = int(round(v))
                            if np.iinfo(dt).min < iv <= np.iinfo(dt).max:
                                host[i] = iv
            elif pred.kind == "INTFN":
                import json as _json

                from heavydb_tpu.storage.string_ops import int_string_fn

                args = tuple(_json.loads(pred.pattern))
                dt = pred.type.np_dtype()
                sentinel = pred.type.null_sentinel()
                host = np.zeros(padded, dt)
                for i, s in enumerate(d.entries()):
                    v = int_string_fn(s, pred.cmp_op, args)
                    host[i] = sentinel if v is None else v
            else:
                host = np.zeros(padded, bool)
                if pred.kind in ("LIKE", "ILIKE"):
                    ids = d.like_ids(pred.pattern, pred.escape, pred.kind == "ILIKE")
                elif pred.kind == "REGEXP":
                    ids = d.regexp_ids(pred.pattern)
                elif pred.kind == "CMP":
                    ids = d.compare_ids(pred.cmp_op, pred.pattern)
                elif pred.kind == "IN":
                    pats = pred.pattern.split("\x00") if pred.pattern else []
                    ids = np.array(
                        [d.get_id(p) for p in pats if d.get_id(p) >= 0], np.int32
                    )
                else:
                    raise NotSupported(f"dict predicate {pred.kind}")
                host[ids] = True
            arr = jax.device_put(host)
            self.aux_cache[cache_key] = arr
            return arr
        if kind == "strtransform":
            tr: E.StringTransform = payload
            src = self.db.dict_by_ref(tr.src_dict_ref)
            dst = self.db.dict_by_ref(tr.dict_ref)
            cache_key = ("strtransform", tr.src_dict_ref, src.size, tr.ops,
                         tr.dict_ref)
            hit = self.aux_cache.get(cache_key)
            if hit is not None:
                return hit
            from heavydb_tpu.storage.string_ops import apply_chain

            entries = src.entries()
            transformed = [apply_chain(s, tr.ops) for s in entries]
            ids = dst.get_or_add_bulk(transformed)
            padded = B.bucket(max(len(entries), 1))
            host = np.full(padded, np.iinfo(np.int32).min, np.int32)
            host[: len(ids)] = ids
            arr = jax.device_put(host)
            self.aux_cache[cache_key] = arr
            return arr
        if kind == "pairconcat":
            e: E.StringPairConcat = payload
            # a side that is itself a pair concat reads ITS transient
            # output dict — populate inner tables first
            for s in (e.left, e.right):
                if isinstance(s, E.StringPairConcat):
                    self._aux_array(("pairconcat", s))
            ld = self.db.dict_by_ref(e.left_ref)
            rd = self.db.dict_by_ref(e.right_ref)
            cache_key = ("pairconcat", e.left_ref, ld.size, e.left_ops,
                         e.right_ref, rd.size, e.right_ops, e.dict_ref)
            hit = self.aux_cache.get(cache_key)
            if hit is not None:
                return hit
            from heavydb_tpu.storage.string_ops import apply_chain

            cap = getattr(self.db.config, "pair_concat_max_entries",
                          1 << 22)
            if ld.size * rd.size > cap:
                raise NotSupported(
                    f"|| between dictionary columns with "
                    f"{ld.size}x{rd.size} entries (dense pairwise "
                    f"translation table cap {cap})")
            les = [apply_chain(s, e.left_ops) for s in ld.entries()]
            res_ = [apply_chain(s, e.right_ops) for s in rd.entries()]
            dst = self.db.dict_by_ref(e.dict_ref)
            sent = np.iinfo(np.int32).min
            host = np.full((B.bucket(max(len(les), 1)),
                            B.bucket(max(len(res_), 1))), sent, np.int32)
            strs, pos = [], []
            for i, a in enumerate(les):
                if a is None:
                    continue
                for j, b in enumerate(res_):
                    if b is not None:
                        strs.append(a + b)
                        pos.append(i * len(res_) + j)
            if strs:
                flat = np.full(len(les) * len(res_), sent, np.int32)
                flat[np.asarray(pos)] = dst.get_or_add_bulk(strs)
                host[: len(les), : len(res_)] = flat.reshape(
                    len(les), len(res_))
            arr = jax.device_put(host)
            self.aux_cache[cache_key] = arr
            return arr
        if kind == "pairrank":
            e: E.DictPairCompare = payload
            ld = self.db.dict_by_ref(e.left_ref)
            rd = self.db.dict_by_ref(e.right_ref)
            cache_key = ("pairrank", e.left_ref, ld.size, e.left_ops,
                         e.right_ref, rd.size, e.right_ops)
            hit = self.aux_cache.get(cache_key)
            if hit is not None:
                return hit
            from heavydb_tpu.storage.string_ops import apply_chain

            les = [apply_chain(s, e.left_ops) for s in ld.entries()]
            res_ = [apply_chain(s, e.right_ops) for s in rd.entries()]
            sent = np.iinfo(np.int32).min
            both = [s for s in les + res_ if s is not None]
            uniq = sorted(set(both))
            rank_of = {s: i for i, s in enumerate(uniq)}
            rl = np.full(B.bucket(max(len(les), 1)), sent, np.int32)
            rr = np.full(B.bucket(max(len(res_), 1)), sent, np.int32)
            for i, s in enumerate(les):
                if s is not None:
                    rl[i] = rank_of[s]
            for i, s in enumerate(res_):
                if s is not None:
                    rr[i] = rank_of[s]
            out = (jax.device_put(rl), jax.device_put(rr))
            self.aux_cache[cache_key] = out
            return out
        if kind == "dictrank":
            return self._dict_rank_table(payload)
        if kind == "dictorder":
            d = self.db.dict_by_ref(payload)
            key = ("order", payload, d.size)
            hit = self.aux_cache.get(key)
            if hit is not None:
                return hit
            size = max(d.size, 1)
            host = np.zeros(B.bucket(size), np.int32)
            order = np.argsort(np.array(d.entries(), dtype=object))
            host[: len(order)] = order.astype(np.int32)
            arr = jax.device_put(host)
            self.aux_cache[key] = arr
            return arr
        if kind == "translate":
            from_ref, to_ref = payload
            fd = self.db.dict_by_ref(from_ref)
            td = self.db.dict_by_ref(to_ref)
            cache_key = ("translate", from_ref, to_ref, fd.size, td.size)
            hit = self.aux_cache.get(cache_key)
            if hit is not None:
                return hit
            size = max(fd.size, 1)
            padded = B.bucket(size)
            host = np.full(padded, -1, np.int32)
            host[: fd.size] = fd.translation_to(td)
            arr = jax.device_put(host)
            self.aux_cache[cache_key] = arr
            return arr
        if kind == "array":
            return self._array_aux(payload)
        if kind == "geobbox":
            return self._geobbox_aux(payload)
        raise NotSupported(f"aux {kind}")

    def _geo_xform_rows(self, t, cid, arr_ref):
        """Column payload rows, with the dict_ref[2] geometry-transform
        chain applied (GEOS-runtime role, ops/geo_construct.py)."""
        rows = t.column_values(cid)
        if len(arr_ref) > 2 and arr_ref[2]:
            from heavydb_tpu.ops.geo_construct import apply_steps

            kind = t.column_by_id(cid).type.kind
            rows = apply_steps(
                rows, kind, arr_ref[2],
                lambda rt, rc:
                    self.db.catalog.get_table_by_id(rt).column_values(rc),
            )
        return rows

    def _geobbox_aux(self, arr_ref):
        """Per-row bounding-box min corner + grid cell size for geo joins
        (reference BoundingBoxIntersectJoinHashTable bucket sizing: cell =
        the largest bbox extent, so every bbox spans ≤ 2 cells/axis)."""
        from heavydb_tpu.storage.table import geo_rings

        tid, cid = arr_ref[:2]
        t = self.db.catalog.get_table_by_id(tid)
        cache_key = ("geobbox", tid, cid, t.generation,
                     arr_ref[2] if len(arr_ref) > 2 else None)
        hit = self.aux_cache.get(cache_key)
        if hit is not None:
            return hit
        kind = t.column_by_id(cid).type.kind
        if len(arr_ref) > 2 and arr_ref[2]:
            from heavydb_tpu.ops.geo_construct import result_kind

            kind = result_kind(kind, arr_ref[2])
        rows = self._geo_xform_rows(t, cid, arr_ref)
        n = len(rows)
        xmin = np.full(n, np.nan)
        ymin = np.full(n, np.nan)
        cell = 0.0
        for i, r in enumerate(rows):
            if r is None:
                continue
            xs, ys = [], []
            for c, _ in geo_rings(r, kind):
                if len(c) >= 2:
                    xs.append(c[0::2])
                    ys.append(c[1::2])
            if not xs:
                continue
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            xmin[i], ymin[i] = x.min(), y.min()
            cell = max(cell, float(x.max() - x.min()),
                       float(y.max() - y.min()))
        cell = max(cell, 1e-9)
        pad = B.bucket(max(n, 1))
        res = (
            jax.device_put(B.pad_to(xmin, pad, T.double(True))),
            jax.device_put(B.pad_to(ymin, pad, T.double(True))),
            jax.device_put(np.asarray([cell], np.float64)),
        )
        self.aux_cache[cache_key] = res
        return res

    def _array_aux(self, afn):
        """Aux device arrays for an ArrayFn over a base-table array column.

        CARDINALITY/SUBSCRIPT → (lengths[n] int32 (-1 = NULL array),
        offsets[n+1] int32, flat elem values); ANY/ALL → (res[n] int8:
        1 true / 0 false / -1 NULL) precomputed per table row with
        three-valued semantics (reference ArrayIR.cpp codegenArrayAt /
        Analyzer::BinOper kANY-kALL lowering)."""
        tid, cid = afn.arr_ref[:2]
        t = self.db.catalog.get_table_by_id(tid)
        cache_key = ("array", afn.op, afn.key(), tid, cid, t.generation)
        hit = self.aux_cache.get(cache_key)
        if hit is not None:
            return hit
        eti = afn.elem
        rows = self._geo_xform_rows(t, cid, afn.arr_ref)
        n = len(rows)
        lengths = np.array(
            [-1 if r is None else len(r) for r in rows], np.int32
        )
        clamped = np.maximum(lengths, 0)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(clamped, out=offsets[1:])
        parts = [r for r in rows if r is not None and r.size]
        flat = (
            np.concatenate(parts) if parts
            else np.empty(0, eti.np_dtype())
        )
        cd_t = t.column_by_id(cid).type
        if cd_t.is_geo_compressed and flat.dtype.kind in "iu" \
                and cd_t.kind in (T.SQLTypeKind.GEO_POINT,
                                  T.SQLTypeKind.GEO_LINESTRING):
            # headerless GEOINT32 payload: decompress for the flat-elem
            # ops (SUBSCRIPT → ST_X/ST_Y); ring payloads decode via
            # geo_rings which decompresses inline
            from heavydb_tpu.storage.table import geoint_decompress

            flat = geoint_decompress(flat, cd_t.kind)
        if flat.dtype.kind == "f":
            validf = ~np.isnan(flat)
        else:
            validf = flat != eti.null_sentinel()

        if afn.op in ("AREA", "PERIMETER", "CONTAINS", "CONTAINS_LITPOLY",
                      "NPOINTS", "INTERSECTS_LIT", "CONTAINS_SEG",
                      "XMIN", "XMAX", "YMIN", "YMAX",
                      "NRINGS", "CENTROID_X", "CENTROID_Y"):
            res = self._geo_aux(afn, t, cid, rows, lengths, flat)
            self.aux_cache[cache_key] = res
            return res
        if afn.op == "ARR_EQ":
            # whole-array equality per table row (1/0/-1 = true/false/NULL);
            # TEXT[] columns carry per-column dictionary ids — translate to
            # strings before comparing
            other = afn.args[0]
            other_cid = other.dict_ref[1]
            rows_b = t.column_values(other_cid)
            da = t.dicts.get(cid)
            db_ = t.dicts.get(other_cid)
            n = len(rows)
            out = np.full(n, -1, np.int8)
            for i in range(n):
                ra, rb = rows[i], rows_b[i]
                if ra is None or rb is None:
                    continue
                if len(ra) != len(rb):
                    out[i] = 0
                    continue
                if da is not None and db_ is not None and da is not db_:
                    sa = [da.get_string(int(x)) if x >= 0 else None
                          for x in ra]
                    sb = [db_.get_string(int(x)) if x >= 0 else None
                          for x in rb]
                    out[i] = 1 if sa == sb else 0
                else:
                    out[i] = 1 if bool(
                        (np.asarray(ra) == np.asarray(rb)).all()
                    ) else 0
            res = (
                jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                        T.tinyint(False))),
            )
            self.aux_cache[cache_key] = res
            return res
        if afn.op in ("CARDINALITY", "SUBSCRIPT", "UNNEST"):
            res = (
                jax.device_put(B.pad_to(lengths, B.bucket(max(n, 1)),
                                        T.integer(False))),
                jax.device_put(
                    np.concatenate([
                        offsets.astype(np.int32),
                        np.full(B.bucket(n + 1) - (n + 1), offsets[-1],
                                np.int32),
                    ])
                ),
                jax.device_put(
                    B.pad_to(flat, B.bucket(max(len(flat), 1)), eti)
                ),
            )
            self.aux_cache[cache_key] = res
            return res

        # ANY / ALL with a constant lhs
        lit = afn.args[0]
        litval = lit.value
        flat_rowid = np.repeat(np.arange(n), clamped)
        if litval is None:
            out = np.where(
                clamped == 0,
                np.int8(0 if afn.op == "ANY" else 1),
                np.int8(-1),
            ).astype(np.int8)
        else:
            if eti.is_dict_string:
                d = t.dict_for(cid)
                # compare_ids evaluates `entry <op> pattern`; the quantified
                # comparison is `lit <op> elem`, so flip the operator
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
                        "=": "=", "<>": "<>"}
                match_ids = d.compare_ids(flip[afn.cmp_op], str(litval))
                table = np.zeros(max(d.size, 1) + 1, bool)
                table[match_ids] = True
                safe = np.where(validf, flat, d.size)
                cmpf = table[safe]
            else:
                if lit.type.is_decimal:
                    litv = litval / 10**lit.type.scale
                else:
                    litv = litval
                ops = {
                    "=": np.equal, "<>": np.not_equal, "<": np.less,
                    "<=": np.less_equal, ">": np.greater,
                    ">=": np.greater_equal,
                }
                vals = flat
                if eti.is_decimal:
                    vals = flat / 10**eti.scale
                # quantified comparison is `lit <op> elem`
                with np.errstate(invalid="ignore"):
                    cmpf = ops[afn.cmp_op](litv, vals)
            n_true = np.bincount(
                flat_rowid, weights=(cmpf & validf), minlength=n
            )[:n] if n else np.zeros(0)
            n_nullel = np.bincount(
                flat_rowid, weights=~validf, minlength=n
            )[:n] if n else np.zeros(0)
            n_false = np.bincount(
                flat_rowid, weights=(~cmpf & validf), minlength=n
            )[:n] if n else np.zeros(0)
            if afn.op == "ANY":
                out = np.where(
                    n_true > 0, 1, np.where(n_nullel > 0, -1, 0)
                ).astype(np.int8)
            else:
                out = np.where(
                    n_false > 0, 0, np.where(n_nullel > 0, -1, 1)
                ).astype(np.int8)
            out = np.where(lengths < 0, np.int8(-1), out)
        res = (
            jax.device_put(
                B.pad_to(out, B.bucket(max(n, 1)), T.tinyint(False))
            ),
        )
        self.aux_cache[cache_key] = res
        return res

    def _estimate_group_ndv(self, node) -> Optional[int]:
        """Chao1 distinct estimate from a host sample of the group key
        columns (reference: CardinalityEstimator / NDV sketch before
        choosing the group-by scheme).  Only for plain column keys over a
        single Scan; None = unknown."""
        if len(node.inputs) != 1 or not isinstance(node.inputs[0], R.Scan):
            return None
        t = node.inputs[0].table
        idxs = []
        for g in node.group_exprs:
            e = g
            while isinstance(e, E.Cast):
                e = e.operand
            if not isinstance(e, E.InputRef):
                return None
            idxs.append(e.field_idx)
        cols = []
        for i in idxs:
            if i >= len(t.columns):  # virtual rowid field: no chunk stats
                return None
            cd = t.columns[i]
            if cd.type.is_array:
                return None
            frag = next((f for f in t.fragments if f.num_rows), None)
            if frag is None:
                return 1
            raw = frag.chunks[cd.col_id]
            # device-backed lazy chunks: sample WITHOUT materializing the
            # fragment (a full D2H costs seconds per 20M rows)
            if hasattr(raw, "head"):
                chunk = raw.head(65536)
            else:
                chunk = np.asarray(raw[:65536])
            if cd.type.is_none_string:
                # object array with None holes — not sortable; estimate
                # over a NULL-sentineled unicode copy
                chunk = np.array(
                    ["\x00\x00<null>" if v is None else v for v in chunk]
                )
            cols.append(chunk)
        if not cols:
            return None
        m = len(cols[0])
        if m == 0:
            return 1
        if len(cols) == 1:
            sample = cols[0]
        else:
            sample = np.rec.fromarrays(cols)
        _, counts = np.unique(sample, return_counts=True)
        u = len(counts)
        f1 = int((counts == 1).sum())
        f2 = int((counts == 2).sum())
        # Chao1 for saturated samples; it explodes as f2→0 (all
        # singletons), where the linear unseen-mass extrapolation is the
        # right model — take the smaller of the two
        chao = u + (f1 * f1) / (2.0 * (f2 + 1))
        frac_unique = f1 / m
        linear = u + frac_unique * max(t.num_rows - m, 0)
        est = min(chao + frac_unique * max(t.num_rows - m, 0), linear * 1.5)
        return max(int(est), 1)

    def _geo_aux(self, afn, t, cid, rows, lengths, flat):
        """Per-table-row geo scalars precomputed at aux-build time
        (reference QueryEngine/GeoOps; ST_Contains uses even-odd ray
        casting like the reference's point-in-polygon runtime function).
        AREA/PERIMETER → f64[n]; CONTAINS* → int8[n] (1/0/-1)."""
        from heavydb_tpu.storage.table import geo_rings, wkt_to_coords

        n = len(rows)
        K = T.SQLTypeKind
        kind = afn.elem.kind

        def shoelace(c):
            x, y = c[0::2], c[1::2]
            return 0.5 * abs(
                np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
            )

        if afn.op in ("XMIN", "XMAX", "YMIN", "YMAX"):
            # bbox corner per geometry (reference ST_XMin/... —
            # ExtensionFunctionsGeo.hpp over the coord stream)
            out = np.full(n, np.nan)
            off = 0 if afn.op[0] == "X" else 1
            red = np.min if afn.op.endswith("MIN") else np.max
            for i, r in enumerate(rows):
                if r is None:
                    continue
                vals = [red(c[off::2]) for c, _ in geo_rings(r, kind)
                        if len(c) >= 2]
                if vals:
                    out[i] = red(vals)
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.double(True))),)
        if afn.op == "AREA":
            out = np.full(n, np.nan)
            for i, r in enumerate(rows):
                if r is None:
                    continue
                a = 0.0
                for c, outer in geo_rings(r, kind):
                    if len(c) >= 6:
                        a += shoelace(c) if outer else -shoelace(c)
                out[i] = max(a, 0.0)
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.double(True))),)
        if afn.op == "CONTAINS_SEG":
            # per-row segment CSR for the IN-KERNEL even-odd ray cast
            # (cross-table geo joins can't precompute per-row results —
            # candidate pairs are data-dependent).  Same ring filter as
            # point_in below: rings with ≥ 3 points, wrap edge included.
            seg_cnt = np.full(n, -1, np.int32)
            xs1, ys1, xs2, ys2 = [], [], [], []
            for i, r in enumerate(rows):
                if r is None:
                    continue
                cnt = 0
                for c, _ in geo_rings(r, kind):
                    if len(c) < 6:
                        continue
                    x, y = c[0::2], c[1::2]
                    xs1.append(x)
                    ys1.append(y)
                    xs2.append(np.roll(x, -1))
                    ys2.append(np.roll(y, -1))
                    cnt += len(x)
                seg_cnt[i] = cnt
            total = int(np.maximum(seg_cnt, 0).sum())
            seg_off = np.zeros(n + 1, np.int32)
            np.cumsum(np.maximum(seg_cnt, 0), out=seg_off[1:])
            maxseg = int(np.maximum(seg_cnt, 0).max()) if n else 0

            def flat_f64(parts):
                return (np.concatenate(parts) if parts
                        else np.empty(0, np.float64)).astype(np.float64)

            padn = B.bucket(max(n, 1))
            padnn = B.bucket(n + 1)
            padt = B.bucket(max(total, 1))
            res = (
                jax.device_put(np.concatenate([
                    seg_off, np.full(padnn - (n + 1), total, np.int32)
                ])),
                jax.device_put(B.pad_to(seg_cnt, padn, T.integer(False))),
                jax.device_put(B.pad_to(flat_f64(xs1), padt, T.double(False))),
                jax.device_put(B.pad_to(flat_f64(ys1), padt, T.double(False))),
                jax.device_put(B.pad_to(flat_f64(xs2), padt, T.double(False))),
                jax.device_put(B.pad_to(flat_f64(ys2), padt, T.double(False))),
                # shape carries the STATIC ray-cast trip count
                jax.device_put(np.zeros(maxseg, np.int8)),
            )
            return res
        if afn.op == "PERIMETER":
            out = np.full(n, np.nan)
            closed = kind != K.GEO_LINESTRING
            for i, r in enumerate(rows):
                if r is None:
                    continue
                p = 0.0
                any_ring = False
                for c, _ in geo_rings(r, kind):
                    if len(c) < 4:
                        continue
                    any_ring = True
                    x, y = c[0::2], c[1::2]
                    if closed:
                        x = np.append(x, x[0])
                        y = np.append(y, y[0])
                    p += np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2).sum()
                if any_ring:
                    out[i] = p
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.double(True))),)
        if afn.op == "NPOINTS":
            out = np.full(n, -1, np.int32)
            for i, r in enumerate(rows):
                if r is None:
                    continue
                out[i] = sum(
                    len(c) // 2 for c, _ in geo_rings(r, kind)
                )
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.integer(False))),)
        if afn.op == "NRINGS":
            # reference ST_NRings: ring count incl. holes
            out = np.full(n, -1, np.int32)
            for i, r in enumerate(rows):
                if r is None:
                    continue
                out[i] = sum(1 for _c, _ in geo_rings(r, kind))
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.integer(False))),)
        if afn.op in ("CENTROID_X", "CENTROID_Y"):
            # reference ST_Centroid: polygons area-weighted over rings
            # (holes subtract), linestrings vertex mean, points identity
            out = np.full(n, np.nan)
            off = 0 if afn.op.endswith("X") else 1
            poly = kind in (K.GEO_POLYGON, K.GEO_MULTIPOLYGON)
            for i, r in enumerate(rows):
                if r is None:
                    continue
                if poly:
                    num = 0.0
                    den = 0.0
                    for c, outer in geo_rings(r, kind):
                        if len(c) < 6:
                            continue
                        x, y = c[0::2], c[1::2]
                        x2, y2 = np.roll(x, -1), np.roll(y, -1)
                        cross = x * y2 - x2 * y
                        a = cross.sum() / 2.0
                        coord = (x + x2) if off == 0 else (y + y2)
                        cm = (coord * cross).sum() / 6.0
                        sgn = 1.0 if outer else -1.0
                        num += sgn * abs(a) * (cm / a if a != 0 else 0.0)
                        den += sgn * abs(a)
                    if den != 0:
                        out[i] = num / den
                else:
                    vals = [c[off::2] for c, _ in geo_rings(r, kind)
                            if len(c) >= 2]
                    if vals:
                        allv = np.concatenate(vals)
                        out[i] = float(allv.mean())
            return (jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                            T.double(True))),)

        def point_in(px, py, rings):
            """Even-odd point-in-polygon across ALL rings (outer rings and
            holes alike — parity handles holes; reference point-in-poly
            runtime function semantics)."""
            crossings = 0
            for c, _ in rings:
                if len(c) < 6:
                    continue
                x, y = c[0::2], c[1::2]
                x2, y2 = np.roll(x, -1), np.roll(y, -1)
                cr = ((y > py) != (y2 > py)) & (
                    px < (x2 - x) * (py - y)
                    / np.where(y2 == y, 1e-300, y2 - y) + x
                )
                crossings += int(cr.sum())
            return crossings % 2 == 1

        def segs(rings, close=True):
            for c, _ in rings:
                if len(c) < 4:
                    continue
                x, y = c[0::2], c[1::2]
                x2 = np.roll(x, -1) if close else x[1:]
                y2 = np.roll(y, -1) if close else y[1:]
                if not close:
                    x, y = x[:-1], y[:-1]
                yield x, y, x2, y2

        def seg_intersect(a, b):
            """Any segment of ring-set a intersects any segment of b."""
            B_ = list(segs(b))
            for ax, ay, ax2, ay2 in segs(a):
                for bx, by, bx2, by2 in B_:
                    d1x, d1y = ax2 - ax, ay2 - ay
                    # orientation cross products, vectorized over a-segs
                    for j in range(len(bx)):
                        o1 = d1x * (by[j] - ay) - d1y * (bx[j] - ax)
                        o2 = d1x * (by2[j] - ay) - d1y * (bx2[j] - ax)
                        d2x, d2y = bx2[j] - bx[j], by2[j] - by[j]
                        o3 = d2x * (ay - by[j]) - d2y * (ax - bx[j])
                        o4 = d2x * (ay2 - by[j]) - d2y * (ax2 - bx[j])
                        hit = ((np.sign(o1) != np.sign(o2))
                               & (np.sign(o3) != np.sign(o4)))
                        if bool(hit.any()):
                            return True
            return False

        def geoms_intersect(ra, ka, rb, kb):
            """Exact-ish intersection: bbox prefilter, then segment
            crossing or containment either way."""
            poly_kinds = (K.GEO_POLYGON, K.GEO_MULTIPOLYGON)
            flat_a = np.concatenate([c for c, _ in ra]) if ra else np.empty(0)
            flat_b = np.concatenate([c for c, _ in rb]) if rb else np.empty(0)
            if flat_a.size < 2 or flat_b.size < 2:
                return False
            if (flat_a[0::2].min() > flat_b[0::2].max()
                    or flat_a[0::2].max() < flat_b[0::2].min()
                    or flat_a[1::2].min() > flat_b[1::2].max()
                    or flat_a[1::2].max() < flat_b[1::2].min()):
                return False
            if ka == K.GEO_POINT:
                if kb in poly_kinds:
                    return point_in(flat_a[0], flat_a[1], rb)
                if kb == K.GEO_POINT:
                    return bool(flat_a[0] == flat_b[0]
                                and flat_a[1] == flat_b[1])
            if kb == K.GEO_POINT:
                return geoms_intersect(rb, kb, ra, ka)
            if seg_intersect(ra, rb):
                return True
            if ka in poly_kinds and point_in(flat_b[0], flat_b[1], ra):
                return True
            if kb in poly_kinds and point_in(flat_a[0], flat_a[1], rb):
                return True
            return False

        out = np.full(n, -1, np.int8)
        if afn.op == "CONTAINS_LITPOLY":
            lit_rings = geo_rings(
                wkt_to_coords(afn.args[0].value, K.GEO_POLYGON),
                K.GEO_POLYGON,
            )
            for i, r in enumerate(rows):
                if r is None or len(r) < 2:
                    continue
                out[i] = 1 if point_in(r[0], r[1], lit_rings) else 0
        elif afn.op == "INTERSECTS_LIT":
            wkt = str(afn.args[0].value)
            tag = wkt.strip().split("(")[0].strip().upper()
            lk = {
                "POINT": K.GEO_POINT, "LINESTRING": K.GEO_LINESTRING,
                "POLYGON": K.GEO_POLYGON,
                "MULTIPOLYGON": K.GEO_MULTIPOLYGON,
            }[tag]
            lit_rings = geo_rings(wkt_to_coords(wkt, lk), lk)
            for i, r in enumerate(rows):
                if r is None:
                    continue
                out[i] = 1 if geoms_intersect(
                    geo_rings(r, kind), kind, lit_rings, lk
                ) else 0
        else:  # CONTAINS: per-row polygon, point column or literal point
            pt = afn.args[0]
            if isinstance(pt, E.Constant):
                c = wkt_to_coords(pt.value, K.GEO_POINT)
                pxs = np.full(n, c[0])
                pys = np.full(n, c[1])
                pok = np.ones(n, bool)
            else:
                prows = t.column_values(pt.dict_ref[1])
                pxs = np.full(n, np.nan)
                pys = np.full(n, np.nan)
                for i, pr in enumerate(prows):
                    if pr is not None and len(pr) >= 2:
                        pxs[i], pys[i] = pr[0], pr[1]
                pok = ~np.isnan(pxs)
            for i, r in enumerate(rows):
                if r is None or not pok[i]:
                    continue
                out[i] = 1 if point_in(
                    pxs[i], pys[i], geo_rings(r, kind)
                ) else 0
        return (
            jax.device_put(B.pad_to(out, B.bucket(max(n, 1)),
                                    T.tinyint(False))),
        )

    # ---- postprocess & retry ----
    def _postprocess(self, node, plan, outs) -> Optional[B.Batch]:
        d = outs  # dict from kernel
        # fast path: keyless aggregate with no joins and no error flags has
        # a STATIC output (1 row) — no control sync needed at all
        if (
            not plan.joins
            and plan.group_strategy
            and plan.group_strategy[0] == "keyless"
            and not any(k.startswith("err_") for k in d)
        ):
            return B.Batch(list(d["cols"]), 1, list(node.types))
        # batch ALL control scalars into ONE device→host transfer —
        # genuinely one: device_get of a LIST fetches leaves
        # SEQUENTIALLY, each a full relay round trip (~150ms); the
        # kernel packs them into one int32 vector instead
        from heavydb_tpu.exec.compound_kernel import ctrl_keys

        scalar_keys = ctrl_keys(d)
        if "ctrl_vec" in d:
            host = dict(zip(
                scalar_keys, jax.device_get(d["ctrl_vec"]).tolist()
            ))
        else:
            host = dict(zip(
                scalar_keys, jax.device_get([d[k] for k in scalar_keys])
            ))
        if bool(host.get("err_count_distinct_overflow", False)):
            # hash claim table overflowed → redo with the sorted formulation
            plan.distinct_force_sort = True
            return None
        if bool(host.get("err_div_by_zero", False)):
            raise DivisionByZero("division by zero")
        # capacity checks
        retry = False
        for li, jp0 in enumerate(plan.joins):
            if int(host.get(f"join_hash_miss_{li}", 0)) > 0:
                # pathological hash collisions in the join claim table →
                # redo this level with the sorted/searchsorted formulation
                jp0.hash_fallback = True
                retry = True
        if retry:
            return None
        for li, cap in enumerate(plan.caps):
            jp = plan.joins[li] if li < len(plan.joins) else None
            if jp is not None and jp.unique_build and bool(
                host.get(f"join_dup_{li}", False)
            ):
                # duplicate build keys detected → fall back to expansion
                jp.unique_build = False
                plan.caps[li] = jp.fallback_cap
                retry = True
                continue
            needed = int(host[f"join_needed_{li}"])
            if needed > cap:
                plan.caps[li] = B.bucket(needed)
                retry = True
        if plan.group_strategy and plan.group_strategy[0] == "sort":
            ng = int(host["num_groups"])
            if ng > plan.group_cap:
                plan.group_cap = B.bucket(ng)
                retry = True
        if plan.group_strategy and plan.group_strategy[0] == "radix":
            ng = int(host["num_groups"])
            ovf = int(host.get("radix_overflow", 0))
            if ovf & 1:
                # hard failure: a skewed partition overflowed its region
                # (rows dropped) or an int-limb sum passed the exactness
                # bound — rerun on the sort tier
                plan.group_strategy = ("sort", None)
                plan.group_cap = B.bucket(max(ng, 8))
                retry = True
            elif (ovf & 2) or ng > plan.group_cap:
                # output cap exceeded; num_groups is exact — one retry
                plan.group_cap = B.bucket(ng)
                retry = True
        if plan.group_strategy and plan.group_strategy[0] == "hash":
            if int(host["hash_unresolved"]) > 0:
                plan.group_cap = plan.group_cap * 4
                retry = True
        if retry:
            return None
        n_out = int(host["n_out"])
        cols = list(d["cols"])
        # slice to bucket(n_out) — cheap device-side narrowing
        size = B.bucket(n_out)
        if cols and cols[0].shape[0] > size:
            cols = [c[:size] for c in cols]
        return B.Batch(cols, n_out, list(node.types))


_NO_PACK = object()


def _hash_pack_spec(group_exprs, ranges):
    """Packing spec for hash grouping: None = single-key identity packing
    (any scalar key type); ((lo, span), ...) = range packing for
    multi-key tuples with known ranges fitting 63 bits; _NO_PACK = not
    hashable (fall back to sort grouping)."""
    for g in group_exprs:
        if g.type.is_array or g.type.is_string and not g.type.is_dict_string:
            return _NO_PACK
    if len(group_exprs) == 1:
        return None
    spec = []
    total = 1
    for r in ranges:
        if r is None or r.extent <= 0:
            return _NO_PACK
        spec.append((r.lo, r.extent))
        total *= r.extent + 2
        if total >= (1 << 62):
            return _NO_PACK
    return tuple(spec)


def _is_null_value(v, ti: T.TypeInfo) -> bool:
    if v is None:
        return True
    if isinstance(v, float):
        return v != v
    try:
        return v == ti.null_sentinel()
    except Exception:
        return False


def _const_to(v, src: T.TypeInfo, dst: T.TypeInfo):
    from heavydb_tpu.plan.builder import _const_cast

    return _const_cast(v, src, dst)


# ---------------------------------------------------------------------------
# compound plan containers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _JoinPlan:
    kind: str = "INNER"
    probe_keys: list = None
    build_keys: list = None
    residual: list = None
    translate: Optional[tuple] = None  # (from_dict_ref, to_dict_ref)
    pack: str = "single"  # single | range | hash | CROSS
    pack_spans: tuple = ()
    # dense-range perfect build (reference PerfectJoinHashTable)
    key_min: Optional[int] = None
    key_range: Optional[int] = None
    # build keys believed unique (PK side) → identity-domain probe, no
    # expansion; verified at runtime (dup flag → retry with expansion)
    unique_build: bool = False
    fallback_cap: int = 0
    # grid-bucket spatial join spec (exec/geo_join.py GeoJoinSpec)
    geo: Optional[object] = None


@dataclasses.dataclass
class _CompoundPlan:
    node: object = None
    offsets: list = None
    joins: List[_JoinPlan] = dataclasses.field(default_factory=list)
    caps: List[int] = dataclasses.field(default_factory=list)
    group_strategy: Optional[tuple] = None
    group_cap: int = 0
    aux_specs: dict = dataclasses.field(default_factory=dict)
    udfs: dict = dataclasses.field(default_factory=dict)
    # filter push-down split (None filter_rest = no split performed)
    pre_mask: list = dataclasses.field(default_factory=list)
    build_filters: dict = dataclasses.field(default_factory=dict)
    filter_rest: Optional[list] = None


@dataclasses.dataclass
class _KernelLayout:
    batch_cols: list = None  # [(batch_idx, [col_idx...])...]
    nrows_batches: list = None
    aux_order: list = None


class _ArtifactKernel:
    """Disk-backed plan-artifact cache: jax.export-serialized StableHLO
    keyed by (plan structure, arg avals, jaxlib, backend).  The reference
    persists compiled query code in its CodeCache (NativeCodegen.cpp) so
    repeat queries compile in ms; our analogue skips jax RE-TRACING in
    fresh processes — the dominant first-query cost once the XLA
    persistent compile cache is warm (measured: 4.7-9.5s → 0.4s for the
    20M-row radix sparse group-by).  Export runs on a daemon thread
    AFTER the first call returns, so the artifact is written off the
    query path.  Best-effort: any failure falls back to the plain jitted
    kernel."""

    _export_gate = None  # class-level: serialize background exports
    _pending_exports = []  # live export threads (drain_exports joins)

    def __init__(self, disk_key_base: str, jitted):
        self._base = disk_key_base
        self._jitted = jitted
        self._fn = None          # resolved callable (artifact or jitted)
        self._exported = False

    @staticmethod
    def cache_dir():
        import os

        d = os.environ.get(
            "HEAVYDB_TPU_PLAN_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "heavydb_tpu_xla", "plans"),
        )
        return d

    @classmethod
    def wrap(cls, key, jitted, config):
        if not getattr(config, "enable_plan_artifact_cache", True):
            return jitted
        try:
            if jax.default_backend() == "cpu":
                # match the compile-cache policy: CPU AOT artifacts embed
                # machine features; cross-host reuse risks SIGILL
                return jitted
            import hashlib

            base = hashlib.sha256(repr(key).encode()).hexdigest()
            return cls(base, jitted)
        except Exception:
            return jitted

    # passthroughs so probes/tools can still inspect the jitted fn
    def trace(self, *a, **k):
        return self._jitted.trace(*a, **k)

    def lower(self, *a, **k):
        return self._jitted.lower(*a, **k)

    _code_fp = None

    @classmethod
    def code_fingerprint(cls) -> bytes:
        """Content hash over the package's compute-path sources: a code
        change MUST invalidate artifacts, or stale kernels silently pin
        performance (the traced program isn't part of the plan key)."""
        if cls._code_fp is None:
            import hashlib
            import os

            import heavydb_tpu

            root = os.path.dirname(heavydb_tpu.__file__)
            h = hashlib.sha256()
            for sub in ("exec", "ops", "kernels"):
                d = os.path.join(root, sub)
                for name in sorted(os.listdir(d)):
                    if name.endswith(".py"):
                        with open(os.path.join(d, name), "rb") as f:
                            h.update(f.read())
            cls._code_fp = h.digest()
        return cls._code_fp

    def _disk_path(self, args):
        import hashlib
        import os

        import jaxlib

        h = hashlib.sha256(self._base.encode())
        for a in jax.tree_util.tree_leaves(args):
            h.update(str(jnp.shape(a)).encode())
            h.update(str(getattr(a, "dtype", type(a))).encode())
        h.update(getattr(jaxlib, "__version__", "?").encode())
        h.update(jax.default_backend().encode())
        h.update(self.code_fingerprint())
        h.update(b"v2")
        return os.path.join(self.cache_dir(), h.hexdigest() + ".jexp")

    def _try_load(self, path):
        import os

        if not os.path.exists(path):
            return None
        try:
            from jax import export as jexport

            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            self._exported = True
            return jax.jit(exp.call)
        except Exception:
            try:
                os.unlink(path)  # stale/incompatible artifact
            except OSError:
                pass
            return None

    def _export_async(self, path, args):
        import os
        import threading

        if _ArtifactKernel._export_gate is None:
            _ArtifactKernel._export_gate = threading.Semaphore(1)
        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                jnp.shape(a), jnp.asarray(a).dtype
            ),
            tuple(args),
        )

        def work():
            with _ArtifactKernel._export_gate:
                try:
                    from jax import export as jexport

                    blob = jexport.export(self._jitted)(*specs).serialize()
                    # seed the XLA persistent compile cache with the
                    # artifact-wrapped program BEFORE publishing the
                    # artifact: its computation key differs from the
                    # original kernel's, and a reader that finds the
                    # artifact without the cached executable pays a full
                    # remote compile (worse than re-tracing)
                    exp = jexport.deserialize(bytearray(blob))
                    jax.jit(exp.call).lower(*specs).compile()
                    os.makedirs(self.cache_dir(), exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                    # prune: code-fingerprint changes orphan old
                    # artifacts; keep the newest 512
                    d = self.cache_dir()
                    names = [n for n in os.listdir(d)
                             if n.endswith(".jexp")]
                    if len(names) > 512:
                        names.sort(key=lambda n: os.path.getmtime(
                            os.path.join(d, n)))
                        for n in names[:len(names) - 512]:
                            try:
                                os.unlink(os.path.join(d, n))
                            except OSError:
                                pass
                except Exception:
                    pass

        self._exported = True
        t = threading.Thread(target=work, daemon=True)
        _ArtifactKernel._pending_exports.append(t)
        t.start()

    @classmethod
    def drain_exports(cls, timeout_s: float = 600.0):
        """Join outstanding background artifact exports (bench/seed runs
        call this before exiting — the exports run on daemon threads and
        a short-lived process otherwise dies before writing anything,
        leaving every 'first query' metric paying a full re-trace)."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        for t in list(cls._pending_exports):
            t.join(max(0.0, deadline - _time.monotonic()))
        cls._pending_exports = [
            t for t in cls._pending_exports if t.is_alive()
        ]

    def __call__(self, *args):
        fn = self._fn
        if fn is None:
            path = self._disk_path(args)
            fn = self._try_load(path)
            if fn is None:
                fn = self._jitted
            self._fn = fn
        out = fn(*args)
        if not self._exported:
            try:
                self._export_async(self._disk_path(args), args)
            except Exception:
                self._exported = True
        return out


# ---------------------------------------------------------------------------
# helpers shared with the kernel builder
# ---------------------------------------------------------------------------


def _derive_valid(arr, ti: T.TypeInfo):
    if arr.dtype.kind == "f":
        return ~jnp.isnan(arr)
    return arr != jnp.asarray(ti.null_sentinel(), arr.dtype)


def _retry_remote_compile(fn, *args, attempts: int = 2):
    """Dispatch with ONE retry on remote-compile service failures.  The
    axon relay load-balances compiles across helper endpoints of varying
    health — a 500/SIGSEGV from one endpoint often succeeds verbatim on
    the next (observed: the same 100M-row window program failing alone
    and compiling fine inside a larger group).  Deterministic compile
    errors fail twice and propagate."""
    last = None
    for i in range(attempts):
        try:
            return fn(*args)
        except Exception as e:  # jax.errors.JaxRuntimeError
            msg = str(e)
            if "remote_compile" not in msg or i + 1 >= attempts:
                raise
            last = e
    raise last


def _split_join_condition(cond, lo: int, hi: int):
    """Split a join condition into equi pairs (probe_expr, build_expr) and
    residual conjuncts.  Build side = fields in [lo, hi)."""
    if cond is None:
        return [], []
    from heavydb_tpu.plan.optimizer import _split_conjuncts

    equis, residual = [], []
    for c in _split_conjuncts(cond):
        if (isinstance(c, E.DictPairCompare) and c.op == "="
                and not c.left_ops and not c.right_ops):
            # chain-free dict=dict: unwrap to a raw-id equi key ONLY when
            # it's a genuine cross-side pair — the join planner's dict
            # translation machinery then remaps ids.  A same-side
            # conjunct (e.g. ON f1.k=f2.k AND f1.s=f1.s2) must stay a
            # DictPairCompare in the residual (its pairrank aux compiles
            # correctly); a raw-id compare across different dictionaries
            # would be silently wrong.
            lrefs = E.collect_input_refs(c.left)
            rrefs = E.collect_input_refs(c.right)
            l_probe = bool(lrefs) and all(r.field_idx < lo for r in lrefs)
            l_build = bool(lrefs) and all(
                lo <= r.field_idx < hi for r in lrefs)
            r_probe = bool(rrefs) and all(r.field_idx < lo for r in rrefs)
            r_build = bool(rrefs) and all(
                lo <= r.field_idx < hi for r in rrefs)
            if (l_probe and r_build) or (l_build and r_probe):
                c = E.BinOp(E.BinOpKind.EQ, c.left, c.right, c.type)
            else:
                residual.append(c)
                continue
        if isinstance(c, E.BinOp) and c.op == E.BinOpKind.EQ:
            lrefs = E.collect_input_refs(c.left)
            rrefs = E.collect_input_refs(c.right)
            l_probe = all(r.field_idx < lo for r in lrefs) and lrefs
            l_build = all(lo <= r.field_idx < hi for r in lrefs) and lrefs
            r_probe = all(r.field_idx < lo for r in rrefs) and rrefs
            r_build = all(lo <= r.field_idx < hi for r in rrefs) and rrefs
            if l_probe and r_build:
                equis.append((c.left, c.right))
                continue
            if l_build and r_probe:
                equis.append((c.right, c.left))
                continue
        residual.append(c)
    return equis, residual


from heavydb_tpu.exec.compound_kernel import _build_compound_kernel  # noqa: E402
