"""Public in-process engine API — the analogue of the reference's Embedded
DBEngine (Embedded/DBEngine.h:39: executeDML without a server) and the DDL/DML
routing half of DBHandler::sql_execute_impl (ThriftHandler/DBHandler.cpp:6626).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax

# SQL needs exact 64-bit ints and doubles; enable before any jnp use.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache — the analogue of the reference's CodeCache
# (QueryEngine/CodeCacheAccessor.h:38): a query shape compiled once is
# near-free in every later process.  Verified working on the axon TPU
# runtime (round-2 probe).  Opt out with HEAVYDB_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("HEAVYDB_TPU_NO_COMPILE_CACHE"):
    # read the configured platform WITHOUT initializing the backend (a
    # default_backend() probe here would break later
    # jax.distributed.initialize calls in multi-host processes)
    _platforms = (jax.config.jax_platforms or "").lower()
    if _platforms.split(",")[0] not in ("cpu", ""):
        # TPU only: CPU AOT artifacts embed machine features and reloading
        # them on a different host risks SIGILL
        _cache_dir = os.environ.get(
            "HEAVYDB_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "heavydb_tpu_xla"),
        )
        try:
            os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception:  # pragma: no cover - cache is best-effort
            pass

from heavydb_tpu import types as T
from heavydb_tpu.config import Config
from heavydb_tpu.errors import (
    BinderError,
    CatalogError,
    NotSupported,
    SqlError,
    StorageError,
)
from heavydb_tpu.exec.executor import Executor
from heavydb_tpu.exec.result_set import ResultSet, from_batch
from heavydb_tpu.plan import exprs as E
from heavydb_tpu.plan import rel_alg as R
from heavydb_tpu.plan.builder import ExprBinder, Scope, resolve_type_name, _const_cast
from heavydb_tpu.plan.optimizer import optimize
from heavydb_tpu.plan.select_planner import SelectPlanner, _node_dict_ref
from heavydb_tpu.sql import ast as A
from heavydb_tpu.sql.parser import parse, parse_many
from heavydb_tpu.storage.catalog import Catalog
from heavydb_tpu.storage.table import Table, to_physical


def connect(path: Optional[str] = None, config: Optional[Config] = None) -> "Database":
    """connect() → in-memory engine; connect('/data/dir') → persistent
    storage with epoch checkpointing (reference FileMgr)."""
    return Database(config or Config(), path)


class Database:
    def __init__(self, config: Config, path: Optional[str] = None):
        self.config = config
        self.catalog = Catalog(config)
        self.executor = Executor(self)
        # current statement's user, per serving thread (drives row-level
        # security injection; reference passes the session down to the
        # Calcite planner's InjectFilterRule)
        import threading as _threading

        self._user_tls = _threading.local()
        # warm the Pallas availability probe off the query path (TPU
        # only): it costs ~1.5s (pallas import + a tiny Mosaic compile)
        # and otherwise lands inside the FIRST query's trace
        try:
            if jax.default_backend() == "tpu":
                from heavydb_tpu.ops.groupby import warm_pallas_probe_async

                warm_pallas_probe_async()
        except Exception:
            pass
        self._views: Dict[str, A.Select] = {}
        self._transient_dicts: Dict[int, object] = {}
        self._next_transient = 0
        # scalar UDFs: name -> (fn, arg_types, ret_type) — the TPU-idiomatic
        # replacement for the reference's clang-compiled runtime UDFs
        # (UdfCompiler/): fns are jnp-traceable and fuse into query kernels
        self._udfs: Dict[str, tuple] = {}
        self._result_cache: Dict[tuple, ResultSet] = {}
        from heavydb_tpu.storage.syscatalog import SysCatalog

        self.syscatalog = SysCatalog()
        # table functions: name -> fn(*args, **kw) → dict of numpy columns
        # (reference TableFunctionsFactory UDTFs)
        self._table_functions: Dict[str, object] = {}
        self._ml_models: Dict[str, object] = {}
        _register_system_tfs(self._table_functions, self)
        # FSI foreign servers (reference Catalog/ForeignServer.h; default
        # servers created at InitDB, Catalog.cpp createDefaultServers)
        self._servers: Dict[str, dict] = {
            "default_local_delimited": {
                "wrapper": "delimited_file", "options": {}
            },
            "default_local_parquet": {
                "wrapper": "parquet_file", "options": {}
            },
            "default_local_regex_parsed": {
                "wrapper": "regex_parser", "options": {}
            },
        }
        self.path = path
        self._catalog_store = None
        self._table_stores: Dict[int, object] = {}
        self._persisted_gen: Dict[int, int] = {}
        if path is not None:
            from heavydb_tpu.storage.persist import (
                PersistentCatalogStore,
                TableStore,
            )

            self._catalog_store = PersistentCatalogStore(path)
            sc_data = self._catalog_store.load_syscatalog()
            if sc_data:
                from heavydb_tpu.storage.syscatalog import SysCatalog

                self.syscatalog = SysCatalog.from_json(sc_data)
            saved_servers = self._catalog_store.load_servers()
            if saved_servers:
                for n, s in saved_servers.items():
                    self._servers.setdefault(n, {
                        "wrapper": s["wrapper"],
                        "options": dict(s.get("options", {})),
                    })
            for t in self._catalog_store.load(self.catalog):
                store = TableStore(path, getattr(t, "disk_table_id", t.table_id))
                self._table_stores[t.table_id] = store
                store.load_into(t)
                self._persisted_gen[t.table_id] = t.generation

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def _persist_after_statement(self):
        if self._catalog_store is None:
            return
        from heavydb_tpu.storage.persist import TableStore

        self._catalog_store.save(
            self.catalog, self.syscatalog, servers=self._servers
        )
        live_ids = set()
        for name in self.catalog.list_tables():
            t = self.catalog.get_table(name)
            live_ids.add(t.table_id)
            if getattr(t, "foreign", None) is not None:
                continue  # FSI data lives in the source file, not FileMgr
            store = self._table_stores.get(t.table_id)
            if store is None:
                store = TableStore(
                    self.path, getattr(t, "disk_table_id", t.table_id)
                )
                self._table_stores[t.table_id] = store
            if self._persisted_gen.get(t.table_id) != t.generation:
                store.checkpoint(t)
                self._persisted_gen[t.table_id] = t.generation
        # dropped tables: remove their stores
        for tid in list(self._table_stores):
            if tid not in live_ids:
                self._table_stores.pop(tid).destroy()
                self._persisted_gen.pop(tid, None)

    def checkpoint(self):
        """Explicit checkpoint of all tables (reference DataMgr::checkpoint)."""
        self._persist_after_statement()

    def get_table_epoch(self, name: str) -> int:
        t = self.catalog.get_table(name)
        store = self._table_stores.get(t.table_id)
        return store.committed_epoch() if store else 0

    def set_table_epoch(self, name: str, epoch: int):
        """Rollback a table to an earlier committed epoch (reference Thrift
        set_table_epoch, heavy.thrift:710)."""
        t = self.catalog.get_table(name)
        store = self._table_stores.get(t.table_id)
        if store is None:
            raise CatalogError(f"table {name!r} is not persistent")
        store.set_epoch(epoch)
        store.load_into(t)
        self._persisted_gen[t.table_id] = t.generation

    # ------------------------------------------------------------------
    # public
    # ------------------------------------------------------------------
    def sql(self, text: str, user: Optional[str] = None) -> Optional[ResultSet]:
        """Execute one SQL statement (the last result is returned if the text
        contains several).  `user` enables privilege checks (reference
        SysCatalog object privileges); None = embedded superuser."""
        stmts = parse_many(text)
        out = None
        self._user_tls.user = user
        try:
            for st in stmts:
                if user is not None:
                    self.syscatalog.check_statement(
                        user, st, _stmt_tables(st)
                    )
                out = self._execute_statement(st)
                if not isinstance(st, (A.Select, A.Explain)):
                    self._persist_after_statement()
        finally:
            self._user_tls.user = None
        return out

    def register_udf(self, name: str, fn, arg_types, ret_type):
        """Register a scalar UDF.  `fn` takes jnp arrays (one per argument,
        already cast to `arg_types`) and returns a jnp array; it is traced
        into the query kernel and fused by XLA — the TPU-native analogue of
        the reference's LLVM-compiled runtime UDFs (heavy.thrift:790
        register_runtime_extension_functions)."""
        self._udfs[name.upper()] = (fn, list(arg_types), ret_type)

    def register_llm_transform(self, fn) -> None:
        """Backend for the LLM_TRANSFORM(text, prompt) string op (reference
        StringOps.h LLM_TRANSFORM hits an external model endpoint; this
        build has no egress).  `fn(text, prompt) -> str` is applied once
        per distinct dictionary entry."""
        from heavydb_tpu.storage import string_ops as SO

        SO.set_llm_transform(fn)

    def register_table_function(self, name: str, fn):
        """Register a table function: fn(*scalar_args, cursor=<dict of numpy
        columns>) → dict[str, numpy array].  Invoked as
        SELECT * FROM TABLE(name(CURSOR(SELECT ...), arg, ...)) —
        reference QueryEngine/TableFunctions/."""
        self._table_functions[name.lower()] = fn

    def sql_device(self, text: str):
        """Execute a SELECT and return the device-resident result Batch plus
        a decode callback — lets callers separate device compute (block on
        the batch) from result egress (the decode D2H).  Used by benchmarks
        to measure kernel throughput independent of client transfer, like
        the reference's server-side execution_time_ms."""
        stmts = parse_many(text)
        assert len(stmts) == 1 and isinstance(stmts[0], A.Select)
        plan = optimize(self._plan_select(stmts[0]))
        self.executor.exec_hints = stmts[0].hints or {}
        batch = self.executor.execute(plan)

        def decode() -> ResultSet:
            dicts = []
            for i in range(plan.arity):
                ref = _node_dict_ref(plan, i)
                dicts.append(
                    self.dict_by_ref(ref)
                    if ref and not plan.types[i].is_array else None
                )
            rs = from_batch(batch, plan.fields, plan.types, dicts)
            return self._fix_array_cols(rs, plan)

        return batch, decode

    def load_table(self, name: str, data, create: bool = False):
        """Bulk-load a pandas DataFrame / dict of arrays / pyarrow Table
        (reference Thrift load_table_binary_columnar)."""
        cols = _normalize_tabular(data)
        if create and self.catalog.get_table_opt(name) is None:
            defs = [(cname, _infer_type(arr)) for cname, arr in cols.items()]
            self.catalog.create_table(name, defs)
        t = self.catalog.get_table(name)
        self._insert_columns(t, cols)

    def load_table_device(self, name: str, data, create: bool = False,
                          dicts=None):
        """Ingest DEVICE-RESIDENT jax arrays as a table with NO
        host→device copy: the device scan cache is seeded directly and
        the host master materializes lazily (one D2H) only if a host
        path needs it (checkpoint, UPDATE, COPY TO).  The reference
        analogue is GPU-resident columnar ingest (load_table_binary_
        columnar over Arrow device buffers / CUDA IPC, heavy.thrift:736).
        TEXT columns pass device-resident dictionary IDS plus a host-side
        vocabulary: dicts={"col": ["a", "b", ...]} (id i ↔ vocab[i]);
        the target table must be empty."""
        import jax.numpy as jnp

        from heavydb_tpu.exec import batch as B
        from heavydb_tpu.storage.table import ChunkStats, LazyDeviceChunk

        cols = {k: v for k, v in data.items()}
        dicts = {k.lower(): v for k, v in (dicts or {}).items()}
        if not cols:
            raise SqlError("load_table_device: no columns")

        def ti_of(cname, a):
            if cname.lower() in dicts:
                return T.text_dict()
            dt = np.dtype(a.dtype)
            if dt == np.bool_ or dt == np.int8:
                return T.smallint()
            if dt.kind == "i":
                return {2: T.smallint, 4: T.integer, 8: T.bigint}[dt.itemsize]()
            if dt == np.float32:
                return T.float_()
            if dt == np.float64:
                return T.double()
            raise SqlError(
                f"load_table_device: unsupported dtype {dt} "
                "(TEXT needs a dicts={{col: vocab}} entry or load_table)"
            )

        if create and self.catalog.get_table_opt(name) is None:
            self.catalog.create_table(
                name, [(k, ti_of(k, a)) for k, a in cols.items()]
            )
        t = self.catalog.get_table(name)
        _reject_foreign_write(t)
        if t.num_rows:
            raise NotSupported(
                "load_table_device appends only into an empty table (the "
                "scan cache seed covers the whole table)"
            )
        arrays = {}
        for cd in t.columns:
            key = next(
                (k for k in cols if k.lower() == cd.name.lower()), None
            )
            if key is None:
                raise StorageError(f"missing column {cd.name}")
            if cd.type.is_dict_string:
                vocab = dicts.get(cd.name.lower())
                if vocab is None:
                    raise NotSupported(
                        f"load_table_device: TEXT column {cd.name} needs "
                        "a dicts={col: vocab} entry (ids on device, "
                        "vocabulary on host)"
                    )
                d = t.dicts[cd.col_id]
                for s in vocab:
                    d.get_or_add(str(s))
            elif cd.type.is_array:
                raise NotSupported(
                    f"load_table_device: column {cd.name} is "
                    f"{cd.type} — use load_table"
                )
            a = cols[key]
            want = cd.type.np_dtype()
            if np.dtype(a.dtype) != want:
                a = jnp.asarray(a, want)
            arrays[cd.col_id] = a
        ns = {int(a.shape[0]) for a in arrays.values()}
        if len(ns) != 1:
            raise StorageError(f"ragged insert: lengths {ns}")
        (n,) = ns
        size = B.bucket(n)
        order = sorted(arrays)
        types = [t.column_by_id(cid).type for cid in order]

        # fragment boundaries: bulk device ingest splits at fragment_rows so
        # fragment-wave streaming (out-of-core sort/agg) and chunk-stat
        # pruning work — fragments are VIEWS over the whole array, no copy
        fr = max(int(t.fragment_rows), 1)
        bounds = [(s, min(s + fr, n)) for s in range(0, max(n, 1), fr)]

        # ONE compiled program: per-column sentinel-padding to the scan
        # bucket + per-FRAGMENT min/max/null-count stats (scalars D2H)
        # stats jit returns ONLY scalars (returning the arrays themselves
        # would copy the full ingest — 2× HBM at 1B rows); padding, when
        # the bucket exceeds n, runs per column with donated inputs
        def _stats(*arrs):
            outs = []
            for a, ti in zip(arrs, types):
                dt = a.dtype
                if dt.kind == "f":
                    lo = jnp.asarray(-np.inf, dt)
                    hi = jnp.asarray(np.inf, dt)
                else:
                    lo = jnp.asarray(np.iinfo(dt).min, dt)
                    hi = jnp.asarray(np.iinfo(dt).max, dt)
                # slice FIRST: whole-array valid/min/max temporaries would
                # multiply the resident footprint (OOM at 1B rows)
                fstats = []
                for s, e in bounds:
                    af = a[s:e]
                    if dt.kind == "f":
                        vf = ~jnp.isnan(af)
                    else:
                        vf = af != jnp.asarray(ti.null_sentinel(), dt)
                    fstats.append((
                        jnp.min(jnp.where(vf, af, hi)),
                        jnp.max(jnp.where(vf, af, lo)),
                        jnp.sum(~vf),
                    ))
                outs.append(tuple(fstats))
            return tuple(outs)

        import jax

        frag_stats_host = jax.device_get(
            jax.jit(_stats)(*[arrays[cid] for cid in order])
        )
        seeds = {}
        for cid, ti in zip(order, types):
            if size > n:
                sent = ti.null_sentinel()

                def _pad(a, _s=sent):
                    return jnp.concatenate(
                        [a, jnp.full(size - n, jnp.asarray(_s, a.dtype))]
                    )

                seeds[cid] = jax.jit(_pad)(arrays[cid])
            else:
                seeds[cid] = arrays[cid]
        frags = []
        for fi, (s, e) in enumerate(bounds):
            chunks, stats = {}, {}
            for ci, (cid, ti) in enumerate(zip(order, types)):
                mn, mx, nulls = frag_stats_host[ci][fi]
                n_null = int(nulls)
                st = ChunkStats(has_nulls=n_null > 0)
                if n_null < e - s:
                    st.min = np.asarray(mn).item()
                    st.max = np.asarray(mx).item()
                chunks[cid] = LazyDeviceChunk(arrays[cid], s, e)
                stats[cid] = st
            frags.append((chunks, stats))
        t.insert_device_fragments(frags)
        # seed the scan cache under the post-insert generation
        for cid in order:
            key = (t.table_id, t.generation, cid, size, None)
            self.executor.scan_cache[key] = seeds[cid]
    def warmup(self, queries):
        """Run warmup queries to populate the kernel/compile caches
        before serving (reference: --warmup-queries-file,
        HeavyDB.cpp run_warmup_queries at startup).  Results are
        discarded; errors are swallowed (a warmup must never block
        readiness)."""
        for q in queries:
            try:
                rs = self.sql(q)
                if rs is not None:
                    rs.row_count  # force execution, not egress
            except Exception:
                pass

    def table_rows(self, name: str) -> int:
        return self.catalog.get_table(name).num_rows

    # -- dashboards (reference Catalog dashboards + TDashboard CRUD) --
    @property
    def dashboards(self) -> Dict[int, dict]:
        if getattr(self, "_dashboards", None) is None:
            self._dashboards = {}
            self._next_dashboard_id = 1
        return self._dashboards

    def create_dashboard(self, name: str, state: str = "",
                         metadata: str = "", owner: str = "admin") -> int:
        import time as _time

        ds = self.dashboards
        did = self._next_dashboard_id
        self._next_dashboard_id += 1
        ds[did] = {
            "id": did, "name": name, "state": state,
            "metadata": metadata, "owner": owner,
            "update_time": _time.time(),
        }
        return did

    def replace_dashboard(self, did: int, name: str, state: str,
                          metadata: str, owner: str):
        import time as _time

        if did not in self.dashboards:
            raise SqlError(f"no dashboard {did}")
        self.dashboards[did].update(
            name=name, state=state, metadata=metadata, owner=owner,
            update_time=_time.time(),
        )

    def delete_dashboard(self, did: int):
        if self.dashboards.pop(did, None) is None:
            raise SqlError(f"no dashboard {did}")

    @property
    def refresh_scheduler(self):
        """Scheduled foreign-table refresh (reference
        RefreshTimeCalculator + scheduled REFRESH): poll() in embedded
        use, start() for the background thread (the server does)."""
        if getattr(self, "_refresh_scheduler", None) is None:
            from heavydb_tpu.storage.refresh import RefreshScheduler

            self._refresh_scheduler = RefreshScheduler(self)
        return self._refresh_scheduler

    def stream_importer(self, table_name: str, **kw):
        """Batched streaming ingest into a table (reference KafkaImporter /
        StreamImporter: ImportExport/KafkaImporter.cpp).  Returns a
        StreamImporter; feed it rows/lines or run() it over a source
        (io/stream.py: FileTailSource, KafkaSource adapter)."""
        from heavydb_tpu.io.stream import StreamImporter

        return StreamImporter(self, table_name, **kw)

    # ------------------------------------------------------------------
    # planning helpers (used by binder for subqueries)
    # ------------------------------------------------------------------
    def _plan_select(self, sel: A.Select) -> R.RelNode:
        return SelectPlanner(self).plan(sel)

    def _get_view(self, name: str) -> Optional[A.Select]:
        return self._views.get(name.lower())

    # ------------------------------------------------------------------
    # FSI foreign tables (reference DataMgr/ForeignStorage/ wrappers:
    # CsvDataWrapper, ParquetDataWrapper, RegexParserDataWrapper; lazy
    # chunk population + REFRESH FOREIGN TABLES)
    # ------------------------------------------------------------------
    # runtime-settable flags (reference ALTER SYSTEM/SESSION SET +
    # CommandLineOptions g_* bindings)
    _SETTABLE = {
        "enable_watchdog", "watchdog_max_projected_rows",
        "enable_dynamic_watchdog", "dynamic_watchdog_time_limit_ms",
        "enable_debug_timer", "enable_fragment_skipping",
        "enable_executor_resource_mgr", "max_concurrent_queries",
        "max_exec_bytes", "admission_queue_timeout_s",
        "baseline_groupby_threshold", "perfect_join_max_range",
    }

    def _alter_setting(self, st: A.AlterSetting):
        key = st.key
        if key not in self._SETTABLE or not hasattr(self.config, key):
            raise SqlError(f"unknown or non-settable parameter {key!r}")
        cur = getattr(self.config, key)
        val = st.value
        if isinstance(cur, bool):
            val = bool(val)
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        setattr(self.config, key, val)
        rm = self.executor.resource_mgr
        if key == "max_concurrent_queries" and rm is not None:
            rm.max_concurrent = int(val)
        if key == "max_exec_bytes" and rm is not None:
            rm.max_bytes = int(val) or None
        if key == "admission_queue_timeout_s" and rm is not None:
            rm.queue_timeout_s = float(val)
        return _string_result("result", [f"{key} = {val}"])

    def _create_foreign_table(self, st: A.CreateForeignTable):
        if self.catalog.get_table_opt(st.name) is not None:
            if st.if_not_exists:
                return None
            raise SqlError(f"table {st.name!r} already exists")
        server = self._servers.get(st.server)
        if server is None:
            raise SqlError(f"no server {st.server!r}")
        if server["wrapper"] == "sql_select":
            # DB-API (ODBC-role) source: no file path; schema comes from
            # declared columns or the cursor description + a row sample
            if st.columns:
                defs = [
                    (cd.name, resolve_type_name(cd.type_name))
                    for cd in st.columns
                ]
            else:
                from heavydb_tpu.io.remote import dbapi_query

                names, rows = dbapi_query(
                    server["options"], dict(st.options)
                )
                defs = [
                    (nm, _infer_type_values([r[i] for r in rows]))
                    for i, nm in enumerate(names)
                ]
            t = self.catalog.create_table(st.name, defs, 32_000_000)
            t.foreign = {
                "server": st.server,
                "options": dict(st.options),
                "loaded": False,
            }
            return None
        path = self._foreign_path(server, st.options)
        if st.columns:
            defs = [
                (cd.name, resolve_type_name(cd.type_name))
                for cd in st.columns
            ]
        else:
            # schema inference from the file (reference: parquet wrappers
            # derive the schema; delimited requires detect)
            if server["wrapper"] == "parquet_file":
                import pandas as pd

                df = pd.read_parquet(path)
                defs = [(c, _infer_type(df[c].to_numpy())) for c in df.columns]
            else:
                from heavydb_tpu.io.csv_import import detect_column_types

                defs = detect_column_types(path, st.options)
        t = self.catalog.create_table(st.name, defs, 32_000_000)
        t.foreign = {
            "server": st.server,
            "options": dict(st.options),
            "loaded": False,
        }
        return None

    def _foreign_path(self, server: dict, options: dict) -> str:
        path = options.get("file_path")
        if path is None:
            raise SqlError("foreign table requires file_path option")
        base = server["options"].get("base_path")
        from heavydb_tpu.io import remote as _remote

        if base and not os.path.isabs(path) and not _remote.is_s3_uri(path):
            path = os.path.join(base, path)
        if base and _remote.is_s3_uri(base) and not _remote.is_s3_uri(path):
            path = base.rstrip("/") + "/" + path
        if _remote.is_s3_uri(path):
            # S3-backed foreign file: spool the object locally, then the
            # delimited/parquet/regex wrapper parses the spool file
            # (reference: S3 FSI downloads into the foreign-storage cache)
            opts = {**server["options"], **options}
            return _remote.spool_s3(path, self._fsi_spool_dir(), opts)
        return path

    def _fsi_spool_dir(self) -> str:
        if self.path:
            return os.path.join(self.path, "fsi_spool")
        d = getattr(self, "_tmp_spool", None)
        if d is None:
            import tempfile

            d = self._tmp_spool = tempfile.mkdtemp(prefix="hdt_fsi_spool_")
        return d

    def ensure_foreign_loaded(self, t: Table):
        if getattr(t, "foreign", None) is not None and not t.foreign["loaded"]:
            self._load_foreign(t)

    def _foreign_cache_file(self, t: Table, path: str):
        """Disk-cache location + source fingerprint for a foreign table
        (reference CachingFileMgr: FSI chunks cached on local disk so the
        source isn't re-parsed on every cold load).  None when the db is
        in-memory."""
        if not self.path:
            return None, None
        try:
            st = os.stat(path)
            fp = f"{st.st_mtime_ns}:{st.st_size}"
        except OSError:
            fp = None  # source gone → cache (if any) still serves reads
        d = os.path.join(self.path, "fsi_cache")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"t{t.table_id}.npz"), fp

    def _load_foreign(self, t: Table):
        """(Re)populate a foreign table from its source file."""
        import time as _time

        fo = t.foreign
        # the refresh schedule anchors at the last (initial) load, not at
        # the scheduler's first poll (reference: createdAt/last_refresh)
        fo.setdefault("last_refresh", _time.time())
        server = self._servers.get(fo["server"])
        if server is None:
            raise SqlError(f"no server {fo['server']!r}")
        if server["wrapper"] == "sql_select":
            # DB-API (ODBC-role) import: run the SELECT, columnarize
            from heavydb_tpu.io.remote import dbapi_query

            names, rows = dbapi_query(server["options"], fo["options"])
            t.delete_all()
            by_name = {
                nm.lower(): np.array([r[i] for r in rows], object)
                for i, nm in enumerate(names)
            }
            arrays = {}
            for cd in t.columns:
                v = by_name.get(cd.name.lower())
                if v is None:
                    v = [None] * len(rows)
                arrays[cd.col_id] = to_physical(
                    v, cd.type, t.dicts.get(cd.col_id)
                )
            if arrays and len(next(iter(arrays.values()))):
                t.insert_columns(arrays)
            fo["loaded"] = True
            return
        path = self._foreign_path(server, fo["options"])
        cache_file, fp = self._foreign_cache_file(t, path)
        if cache_file and os.path.exists(cache_file):
            try:
                z = np.load(cache_file, allow_pickle=True)
                if fp is None or str(z["__fingerprint__"]) == fp:
                    t.delete_all()
                    arrays = {
                        int(k[1:]): z[k] for k in z.files if k.startswith("c")
                    }
                    # dictionary payloads restore alongside
                    for cid in list(arrays):
                        dk = f"d{cid}"
                        if dk in z.files and cid in t.dicts:
                            t.dicts[cid].get_or_add_bulk(
                                [str(s) for s in z[dk]]
                            )
                    if arrays and len(next(iter(arrays.values()))):
                        t.insert_columns(arrays)
                    fo["loaded"] = True
                    return
            except Exception:
                pass  # stale/corrupt cache → re-parse the source
        wrapper = server["wrapper"]
        import pandas as pd

        if wrapper == "parquet_file":
            df = pd.read_parquet(path)
            cols = {c: df[c].to_numpy() for c in df.columns}
        elif wrapper == "regex_parser":
            import re as _re

            regex = fo["options"].get("line_regex")
            if not regex:
                raise SqlError("regex_parser requires line_regex option")
            pat = _re.compile(regex)
            rows = []
            with open(path) as f:
                if fo["options"].get("header", True):
                    next(f, None)
                for line in f:
                    m = pat.match(line.rstrip("\n"))
                    rows.append(
                        m.groups() if m
                        else (None,) * len(t.columns)
                    )
            cols = {
                cd.name: np.array(
                    [r[i] if i < len(r) else None for r in rows], object
                )
                for i, cd in enumerate(t.columns)
            }
        else:  # delimited
            delim = fo["options"].get("delimiter", ",")
            df = pd.read_csv(path, delimiter=delim)
            cols = {c: df[c].to_numpy() for c in df.columns}
        t.delete_all()
        by_name = {k.lower(): v for k, v in cols.items()}
        arrays = {}
        for cd in t.columns:
            v = by_name.get(cd.name.lower())
            if v is None:
                v = [None] * max(
                    (len(x) for x in by_name.values()), default=0
                )
            arrays[cd.col_id] = to_physical(
                v, cd.type, t.dicts.get(cd.col_id)
            )
        if arrays and len(next(iter(arrays.values()))):
            t.insert_columns(arrays)
        fo["loaded"] = True
        if cache_file and fp is not None:
            try:
                payload = {"__fingerprint__": np.array(fp)}
                for cid, arr in arrays.items():
                    payload[f"c{cid}"] = arr
                    if cid in t.dicts:
                        payload[f"d{cid}"] = np.array(
                            t.dicts[cid].entries(), object
                        )
                np.savez_compressed(cache_file, **payload)
            except Exception:
                pass  # cache write is best-effort

    def _array_col_for_insert(self, plan, i, rowids, t, cd):
        """Array column flowing into a (possibly different) table: decode
        rowids to payload rows; TEXT[] re-interns into the target dict."""
        ref = _node_dict_ref(plan, i)
        if ref is None:
            raise NotSupported("INSERT of computed arrays")
        objs, sd = self._rowids_to_object(ref, rowids)
        eti = cd.type.elem_type()
        if eti.is_dict_string and ref != (t.table_id, cd.col_id):
            from heavydb_tpu.storage.table import from_physical

            lists = from_physical(objs, cd.type, sd)
            return to_physical(lists, cd.type, t.dicts.get(cd.col_id))
        return objs

    def _rowids_to_object(self, ref, rowids: np.ndarray):
        """Array-column result decode: device rowids → object ndarray of
        per-row element arrays (None = NULL / out of range)."""
        tid, cid = ref[:2]
        t = self.catalog.get_table_by_id(tid)
        payload = self.executor._geo_xform_rows(t, cid, ref)
        out = np.empty(len(rowids), object)
        np_len = len(payload)
        for j, rid in enumerate(rowids.tolist()):
            out[j] = payload[rid] if 0 <= rid < np_len else None
        return out, t.dicts.get(cid)

    def _fix_array_cols(self, rs: ResultSet, plan) -> ResultSet:
        """Replace array-column rowid handles with host payloads before the
        ResultSet is handed to the client."""
        if not any(ti.is_array for ti in plan.types):
            return rs  # keep scalar results lazy (device-resident)
        cols = rs._materialize()
        for i, ti in enumerate(plan.types):
            if not ti.is_array:
                continue
            ref = _node_dict_ref(plan, i)
            if ref is None:
                raise NotSupported("SELECT of computed arrays")
            objs, sd = self._rowids_to_object(ref, cols[i])
            cols[i] = objs
            rs._dicts[i] = sd
        return rs

    def dict_by_ref(self, ref):
        table_id, col_id = ref[:2]
        if table_id == "$transient":
            return self._transient_dicts[col_id]
        t = self.catalog.get_table_by_id(table_id)
        return t.dict_for(col_id)

    def register_transient_dict(self):
        """Per-query literal-string dictionary (reference
        StringDictionaryProxy transient ids)."""
        from heavydb_tpu.storage.string_dict import StringDictionary

        i = self._next_transient
        self._next_transient += 1
        d = StringDictionary(dict_id=-i - 1)
        self._transient_dicts[i] = d
        return ("$transient", i), d

    # ------------------------------------------------------------------
    # statement dispatch
    # ------------------------------------------------------------------
    def _execute_statement(self, st: A.Statement) -> Optional[ResultSet]:
        if isinstance(st, A.Select):
            return self._run_select(st)
        if isinstance(st, A.Explain):
            return self._explain(st)
        if isinstance(st, A.CreateTable):
            return self._create_table(st)
        if isinstance(st, A.AlterSetting):
            return self._alter_setting(st)
        if isinstance(st, A.CreateServer):
            if st.name in self._servers and not st.if_not_exists:
                raise SqlError(f"server {st.name!r} already exists")
            self._servers.setdefault(
                st.name, {"wrapper": st.wrapper.lower(),
                          "options": dict(st.options)}
            )
            return None
        if isinstance(st, A.DropServer):
            if st.name not in self._servers:
                if st.if_exists:
                    return None
                raise SqlError(f"no server {st.name!r}")
            del self._servers[st.name]
            return None
        if isinstance(st, A.ShowFunctions):
            if st.table_functions:
                return _string_result(
                    "table_function", sorted(self._table_functions)
                )
            from heavydb_tpu.plan.builder import (
                _INT_STRING_FNS, _MATH_FNS, _STRING_FNS,
            )

            names = sorted(
                _MATH_FNS | _STRING_FNS | set(_INT_STRING_FNS)
                | set(self._udfs)
            )
            return _string_result("function", names)
        if isinstance(st, A.ShowServers):
            return _string_result(
                "server_name",
                [f"{n} ({s['wrapper']})" for n, s in self._servers.items()],
            )
        if isinstance(st, A.CreateForeignTable):
            return self._create_foreign_table(st)
        if isinstance(st, A.RefreshForeignTables):
            import time as _time

            for name in st.tables:
                t = self.catalog.get_table(name)
                if getattr(t, "foreign", None) is None:
                    raise SqlError(f"{name!r} is not a foreign table")
                # S3 sources: drop the spool so REFRESH re-fetches the
                # object (reference: refresh invalidates the FSI cache)
                fp = t.foreign["options"].get("file_path", "")
                from heavydb_tpu.io import remote as _remote

                if _remote.is_s3_uri(fp):
                    _remote.evict_spool(fp, self._fsi_spool_dir())
                self._load_foreign(t)
                t.foreign["last_refresh"] = _time.time()
                t.foreign.pop("next_refresh", None)  # recompute on poll
            return None
        if isinstance(st, A.DropTable):
            self.catalog.drop_table(st.name, st.if_exists)
            return None
        if isinstance(st, A.RenameTable):
            self.catalog.rename_table(st.old, st.new)
            return None
        if isinstance(st, A.AddColumn):
            t = self.catalog.get_table(st.table)
            ti = resolve_type_name(st.column.type_name)
            default = None
            if st.column.default is not None:
                scope = Scope()
                e = ExprBinder(scope, self, allow_aggs=False).bind(
                    st.column.default
                )
                if ti.is_dict_string:
                    default = str(e.value) if e.value is not None else None
                else:
                    default = _const_value(e, ti)
                    # add_column backfills through to_physical, which expects
                    # RAW values — undo decimal scaling
                    if ti.is_decimal and default is not None:
                        default = default / 10**ti.scale
            t.add_column(st.column.name, ti, default)
            return None
        if isinstance(st, A.DropColumn):
            self.catalog.get_table(st.table).drop_column(st.column)
            return None
        if isinstance(st, A.RenameColumn):
            self.catalog.get_table(st.table).rename_column(st.old, st.new)
            return None
        if isinstance(st, A.OptimizeTable):
            self.catalog.get_table(st.name).recompute_metadata()
            return None
        if isinstance(st, A.TruncateTable):
            self.catalog.get_table(st.name).delete_all()
            return None
        if isinstance(st, A.InsertValues):
            return self._insert_values(st)
        if isinstance(st, A.InsertSelect):
            return self._insert_select(st)
        if isinstance(st, A.Update):
            return self._update(st)
        if isinstance(st, A.Delete):
            return self._delete(st)
        if isinstance(st, A.CopyFrom):
            return self._copy_from(st)
        if isinstance(st, A.CopyTo):
            return self._copy_to(st)
        if isinstance(st, A.ShowTables):
            return _string_result("table_name", self.catalog.list_tables())
        if isinstance(st, A.DescribeTable):
            t = self.catalog.get_table(st.name)
            return ResultSet(
                ["name", "type"],
                [T.TypeInfo(T.SQLTypeKind.TEXT, False)] * 2,
                [
                    np.array([cd.name for cd in t.columns], object),
                    np.array([str(cd.type) for cd in t.columns], object),
                ],
                [None, None],
            )
        if isinstance(st, A.ShowCreateTable):
            t = self.catalog.get_table(st.name)
            cols = ",\n  ".join(f"{cd.name} {cd.type}" for cd in t.columns)
            return _string_result(
                "create_table", [f"CREATE TABLE {t.name} (\n  {cols});"]
            )
        if isinstance(st, A.ShowTableDetails):
            # reference SHOW TABLE DETAILS (heavysql): per-table
            # row/fragment/column counts and storage footprint
            names = list(st.names) or self.catalog.list_tables()
            rows = []
            for nm in names:
                t = self.catalog.get_table(nm)
                nbytes = 0
                for f in t.fragments:
                    for arr in f.chunks.values():
                        nbytes += int(getattr(arr, "nbytes", 0) or 0)
                rows.append((nm, t.num_rows, len(t.fragments),
                             len(t.columns), t.fragment_rows, nbytes))
            txt = T.TypeInfo(T.SQLTypeKind.TEXT, False)
            i64 = T.bigint(False)
            return ResultSet(
                ["table_name", "num_rows", "num_fragments", "num_columns",
                 "max_fragment_rows", "host_bytes"],
                [txt, i64, i64, i64, i64, i64],
                [np.array([r[0] for r in rows], object)] + [
                    np.array([r[i] for r in rows], np.int64)
                    for i in range(1, 6)
                ],
                [None] * 6,
            )
        if isinstance(st, A.ShowQueries):
            # reference SHOW QUERIES (QueryInfo / get_queries_info):
            # in-flight statements with session + elapsed time
            provider = getattr(self, "queries_provider", None)
            rows = list(provider()) if provider is not None else []
            txt = T.TypeInfo(T.SQLTypeKind.TEXT, False)
            return ResultSet(
                ["query_session_id", "current_status", "query_str",
                 "elapsed_ms"],
                [txt, txt, txt, T.bigint(False)],
                [
                    np.array([r[0] for r in rows], object),
                    np.array([r[1] for r in rows], object),
                    np.array([r[2] for r in rows], object),
                    np.array([int(r[3]) for r in rows], np.int64),
                ],
                [None] * 4,
            )
        if isinstance(st, A.KillQuery):
            # reference KILL QUERY 'session-id' → interrupt that session
            killer = getattr(self, "kill_provider", None)
            if killer is None:
                raise SqlError(
                    "KILL QUERY requires a live server (no embedded "
                    "query registry)"
                )
            ok = bool(killer(st.session_id))
            return _string_result(
                "result", ["interrupted" if ok else "no such query"]
            )
        if isinstance(st, A.ShowUserSessions):
            # reference SHOW USER SESSIONS: live server sessions.  The
            # server installs a provider; embedded databases have none.
            provider = getattr(self, "session_provider", None)
            rows = list(provider()) if provider is not None else []
            txt = T.TypeInfo(T.SQLTypeKind.TEXT, False)
            return ResultSet(
                ["session_id", "login_name", "client_address",
                 "idle_seconds"],
                [txt, txt, txt, T.bigint(False)],
                [
                    np.array([r[0] for r in rows], object),
                    np.array([r[1] for r in rows], object),
                    np.array([r[2] for r in rows], object),
                    np.array([int(r[3]) for r in rows], np.int64),
                ],
                [None] * 4,
            )
        if isinstance(st, A.CreateView):
            key = st.name.lower()
            if key in self._views and not st.if_not_exists:
                raise CatalogError(f"view {st.name!r} already exists")
            self._views[key] = st.select
            return None
        if isinstance(st, A.DropView):
            if st.name.lower() not in self._views and not st.if_exists:
                raise CatalogError(f"view {st.name!r} does not exist")
            self._views.pop(st.name.lower(), None)
            return None
        if isinstance(st, A.ValidateStmt):
            return _string_result("status", ["OK"])
        if isinstance(st, A.CreateUser):
            self.syscatalog.create_user(
                st.name, str(st.options.get("password", "")),
                bool(st.options.get("is_super", False)),
            )
            return None
        if isinstance(st, A.DropUser):
            self.syscatalog.drop_user(st.name)
            return None
        if isinstance(st, A.AlterUser):
            self.syscatalog.alter_user(
                st.name,
                password=(str(st.options["password"])
                          if "password" in st.options else None),
                is_super=(bool(st.options["is_super"])
                          if "is_super" in st.options else None),
            )
            return None
        if isinstance(st, A.CreateRole):
            self.syscatalog.create_role(st.name)
            return None
        if isinstance(st, A.DropRole):
            self.syscatalog.drop_role(st.name)
            return None
        if isinstance(st, A.GrantStmt):
            if st.privileges is not None:
                for g in st.grantees:
                    if st.revoke:
                        self.syscatalog.revoke(st.privileges, st.object, g)
                    else:
                        self.syscatalog.grant(st.privileges, st.object, g)
            else:
                for r in st.roles:
                    for g in st.grantees:
                        if st.revoke:
                            self.syscatalog.revoke_role(r, g)
                        else:
                            self.syscatalog.grant_role(r, g)
            return None
        if isinstance(st, A.CreatePolicy):
            t = self.catalog.get_table(st.table)
            cd = t.column_by_name(st.column)
            if cd is None:
                raise SqlError(f"no column {st.column!r} in {st.table!r}")
            if not (cd.type.is_string or cd.type.is_integer):
                raise NotSupported(
                    "policies supported on TEXT and integer columns"
                )
            self.syscatalog.create_policy(
                st.table, st.column, st.grantee, st.values
            )
            return None
        if isinstance(st, A.DropPolicy):
            self.syscatalog.drop_policy(st.table, st.column, st.grantee)
            return None
        if isinstance(st, A.ShowPolicies):
            rows = [
                f"{tb}.{col} TO {g} VALUES "
                f"({', '.join(repr(v) for v in vals)})"
                for tb, col, g, vals in self.syscatalog.list_policies(
                    st.grantee, st.effective
                )
            ]
            return _string_result("policy", rows)
        if isinstance(st, A.CommentOn):
            t = self.catalog.get_table(st.table)
            if st.kind == "COLUMN":
                cd = t.column_by_name(st.column)
                if cd is None:
                    raise SqlError(f"no column {st.column!r}")
                cd.comment = st.text
            else:
                t.comment = st.text
            return None
        if isinstance(st, A.AlterColumnType):
            t = self.catalog.get_table(st.table)
            ti = resolve_type_name(st.type_name)
            t.alter_column_type(st.column, ti)
            return None
        if isinstance(st, A.ShowUsers):
            return _string_result(
                "user_name", [u.name for u in self.syscatalog.users.values()]
            )
        if isinstance(st, A.ShowRoles):
            return _string_result("role_name", sorted(self.syscatalog.roles))
        if isinstance(st, A.DumpTable):
            self._dump_table(st.name, st.path)
            return _string_result("result", ["OK"])
        if isinstance(st, A.RestoreTable):
            self._restore_table(st.name, st.path)
            return _string_result("result", ["OK"])
        raise NotSupported(f"statement {type(st).__name__}")

    # ------------------------------------------------------------------
    # DUMP / RESTORE (reference TableArchiver/TableArchiver.h:32)
    # ------------------------------------------------------------------
    def _dump_table(self, name: str, path: str):
        import json as _json
        import tarfile
        import tempfile

        from heavydb_tpu.storage.persist import TableStore, _type_to_json

        t = self.catalog.get_table(name)
        with tempfile.TemporaryDirectory() as tmp:
            store = TableStore(tmp, 0)
            store.checkpoint(t)
            schema = {
                "name": t.name,
                "fragment_rows": t.fragment_rows,
                "columns": [
                    {"name": cd.name, "col_id": cd.col_id,
                     "type": _type_to_json(cd.type)}
                    for cd in t.columns
                ],
            }
            with open(os.path.join(store.dir, "schema.json"), "w") as f:
                _json.dump(schema, f)
            with tarfile.open(path, "w:gz") as tar:
                tar.add(store.dir, arcname="table")

    def _restore_table(self, name: str, path: str):
        import json as _json
        import tarfile
        import tempfile

        from heavydb_tpu.storage.persist import TableStore, _type_from_json
        from heavydb_tpu.storage.table import ColumnDescriptor

        with tempfile.TemporaryDirectory() as tmp:
            with tarfile.open(path, "r:gz") as tar:
                tar.extractall(tmp, filter="data")
            tdir = os.path.join(tmp, "table")
            with open(os.path.join(tdir, "schema.json")) as f:
                schema = _json.load(f)
            existing = self.catalog.get_table_opt(name)
            if existing is not None:
                self.catalog.drop_table(name)
            cols = [
                ColumnDescriptor(c["name"], _type_from_json(c["type"]), c["col_id"])
                for c in sorted(schema["columns"], key=lambda c: c["col_id"])
            ]
            t = self.catalog.create_table(name, cols, schema["fragment_rows"])
            store = TableStore.__new__(TableStore)
            store.dir = tdir
            store.load_into(t)
            t.generation += 1
            self._persist_after_statement()

    # ------------------------------------------------------------------
    def _run_select(self, sel: A.Select) -> ResultSet:
        from heavydb_tpu.utils.timer import NullTimer, QueryTimer

        timer = (
            QueryTimer() if self.config.enable_debug_timer else NullTimer()
        )
        self.executor.timer = timer
        self.executor.exec_hints = sel.hints or {}
        with timer.scope("query"):
            with timer.scope("plan"):
                plan = self._plan_select(sel)
                user = getattr(self._user_tls, "user", None)
                if user is not None and self.syscatalog.policies:
                    plan = self._inject_rls(plan, user)
                plan = optimize(plan)
            # result-set recycler (reference ResultSetRecycler, enabled by
            # the keep_result hint): reuse decoded results while the source
            # tables' generations are unchanged
            cache_key = None
            if "keep_result" in (sel.hints or {}):
                cache_key = self._result_cache_key(plan)
                if cache_key is not None:
                    hit = self._result_cache.get(cache_key)
                    if hit is not None:
                        self.last_query_timings = None
                        return hit
            with timer.scope("execute"):
                batch = self.executor.execute(plan)
            with timer.scope("fetch"):
                dicts = []
                for i in range(plan.arity):
                    ref = _node_dict_ref(plan, i)
                    dicts.append(
                        self.dict_by_ref(ref)
                        if ref and not plan.types[i].is_array else None
                    )
                rs = from_batch(batch, plan.fields, plan.types, dicts)
                rs = self._fix_array_cols(rs, plan)
        if cache_key is not None:
            self._result_cache[cache_key] = rs
        self.last_query_timings = timer.to_dict()
        return rs

    def _inject_rls(self, plan, user: str):
        """Row-level security: wrap every Scan of a policy-restricted
        table in a Filter `col IN (values)` before optimization — the
        filter then fuses/pushes down like any user predicate.
        (Reference: HeavyDBPlanner.java applyInjectFilterRule over the
        session's Restrictions.)  Subquery plans are injected too."""
        from heavydb_tpu.plan.select_planner import _node_dict_ref

        sysc = self.syscatalog

        def cond_for(scan):
            pols = sysc.policies_for(user, scan.table.name)
            conjs = []
            for col, vals in pols:
                cd = scan.table.column_by_name(col)
                if cd is None:
                    continue
                idx = next(
                    i for i, c in enumerate(scan.table.columns)
                    if c.col_id == cd.col_id
                )
                ti = scan.types[idx]
                ref = E.InputRef(0, idx, ti, _node_dict_ref(scan, idx))
                if ti.is_dict_string:
                    pats = "\x00".join(str(v) for v in vals)
                    conjs.append(E.DictStrPredicate(
                        arg=ref, kind="IN", pattern=pats,
                        dict_ref=ref.dict_ref,
                        type=T.boolean(ti.nullable),
                    ))
                else:
                    phys = tuple(
                        int(v) if ti.is_integer else float(v) for v in vals
                    )
                    conjs.append(E.InValues(
                        arg=ref, values=phys, type=T.boolean(ti.nullable),
                    ))
            if not conjs:
                return None
            cond = conjs[0]
            for c in conjs[1:]:
                cond = E.BinOp(E.BinOpKind.AND, cond, c, T.boolean(False))
            return cond

        def node_exprs(n):
            if isinstance(n, R.Filter):
                return [n.condition]
            if isinstance(n, R.Project):
                return list(n.exprs)
            if isinstance(n, R.Join):
                return [n.condition] if n.condition is not None else []
            if isinstance(n, R.Aggregate):
                return list(n.group_exprs) + list(n.agg_exprs)
            if isinstance(n, R.Window):
                return list(n.wfuncs)
            if isinstance(n, R.Compound):
                out = [c for _, c in n.join_levels if c is not None]
                out += [n.filter_cond] if n.filter_cond is not None else []
                out += list(n.group_exprs) + list(n.aggs)
                out += list(n.target_exprs)
                return out
            return []

        seen = {}

        def walk(node):
            if id(node) in seen:
                return seen[id(node)]
            node.inputs[:] = [walk(i) for i in node.inputs]
            for e in node_exprs(node):
                for sub in E.walk(e):
                    if isinstance(sub, E.SubqueryExpr) \
                            and sub.plan is not None:
                        object.__setattr__(sub, "plan", walk(sub.plan))
            out = node
            if isinstance(node, R.Scan):
                c = cond_for(node)
                if c is not None:
                    out = R.Filter(node, c)
            seen[id(node)] = out
            return out

        return walk(plan)

    def _result_cache_key(self, plan: R.RelNode):
        from heavydb_tpu.plan.rel_alg import Scan, topo_order

        gens = []
        for n in topo_order(plan):
            for e in _iter_all_exprs(n):
                for sub in E.walk(e):
                    if isinstance(sub, E.SubqueryExpr):
                        return None  # subquery results not tracked
            if isinstance(n, Scan):
                gens.append((n.table.table_id, n.table.generation))
        return (plan.plan_key(), tuple(gens))

    def _explain(self, st: A.Explain) -> ResultSet:
        if not isinstance(st.stmt, A.Select):
            raise NotSupported("EXPLAIN of non-SELECT")
        plan = self._plan_select(st.stmt)
        if st.kind == "CALCITE":
            # pre-optimization DAG (analogue of EXPLAIN CALCITE's RA dump)
            return _string_result("explanation", plan.explain().split("\n"))
        plan = optimize(plan)
        if st.kind == "OPTIMIZED":
            # compiled-kernel dump — the analogue of the reference's IR/PTX
            # log channels (EXPLAIN OPTIMIZED → LLVM IR): emit the jaxpr of
            # the root compound kernel
            text = self._dump_kernel_ir(plan)
            return _string_result("explanation", text.split("\n"))
        return _string_result("explanation", plan.explain().split("\n"))

    def _dump_kernel_ir(self, plan: R.RelNode) -> str:
        import jax

        ex = self.executor
        node = plan
        # find the topmost Compound (root may be Sort/Project wrappers)
        from heavydb_tpu.plan.rel_alg import Compound, topo_order

        compounds = [n for n in topo_order(node) if isinstance(n, Compound)]
        if not compounds:
            return plan.explain()
        target = compounds[-1]
        ex._substitute_subqueries(node, set())
        batches, cplan = ex._prepare_compound(target, {})
        kernel, layout = ex._get_kernel(target, batches, cplan)
        args = ex._kernel_args(batches, cplan, layout)
        jaxpr = jax.make_jaxpr(kernel)(*args)
        return plan.explain() + "\n\n--- kernel jaxpr ---\n" + str(jaxpr)

    # ------------------------------------------------------------------
    def _create_table(self, st: A.CreateTable) -> Optional[ResultSet]:
        frag_rows = st.options.get("fragment_size")
        if st.as_select is not None:
            rs_plan = optimize(self._plan_select(st.as_select))
            batch = self.executor.execute(rs_plan)
            defs = []
            for f, ti in zip(rs_plan.fields, rs_plan.types):
                defs.append((f, ti))
            if st.columns:
                if len(st.columns) != len(defs):
                    raise BinderError("CTAS column count mismatch")
                defs = [
                    (cd.name, ti) for cd, (_, ti) in zip(st.columns, defs)
                ]
            t = self.catalog.create_table(
                st.name, defs, frag_rows, st.if_not_exists, st.temporary
            )
            host = batch.to_numpy()
            cols = {}
            for cd, (i, ti) in zip(t.columns, enumerate(rs_plan.types)):
                arr = host[i]
                if ti.is_array:
                    arr = self._array_col_for_insert(rs_plan, i, arr, t, cd)
                elif ti.is_dict_string:
                    src_ref = _node_dict_ref(rs_plan, i)
                    src = self.dict_by_ref(src_ref) if src_ref else None
                    strings = (
                        src.get_strings(arr) if src is not None else [None] * len(arr)
                    )
                    arr = t.dict_for(cd.col_id).get_or_add_bulk(strings)
                cols[cd.col_id] = arr
            if batch.nrows:
                t.insert_columns(cols)
            return None
        defs = []
        for cd in st.columns:
            ti = resolve_type_name(cd.type_name)
            defs.append((cd.name, ti))
        t = self.catalog.create_table(
            st.name, defs, frag_rows, st.if_not_exists, st.temporary
        )
        if st.shard_key is not None:
            # reference TableDescriptor SHARD_KEY + nShards
            # (Catalog/TableDescriptor.h:59-66): drives co-located
            # distributed loads (parallel/dist_engine.py)
            if t.column_by_name(st.shard_key) is None:
                raise BinderError(
                    f"SHARD KEY column {st.shard_key!r} not in table"
                )
            t.shard_key = st.shard_key.lower()
            t.shard_count = int(st.options.get("shard_count", 0))
        sc = st.options.get("sort_column")
        if sc:
            sc = str(sc).strip("'\"")
            if t.column_by_name(sc) is None:
                raise BinderError(f"sort_column {sc!r} not in table")
            t.sort_column = sc.lower()
        return None

    # ------------------------------------------------------------------
    def _insert_values(self, st: A.InsertValues) -> None:
        t = self.catalog.get_table(st.table)
        _reject_foreign_write(t)
        target_cols = (
            [self._col_of(t, c) for c in st.columns]
            if st.columns
            else list(t.columns)
        )
        n = len(st.rows)
        scope = Scope()
        binder = ExprBinder(scope, self, allow_aggs=False)
        by_col: Dict[int, list] = {cd.col_id: [] for cd in t.columns}
        for row in st.rows:
            if len(row) != len(target_cols):
                raise SqlError("INSERT value count mismatch")
            provided = {}
            for cd, expr_ast in zip(target_cols, row):
                if cd.type.is_array:
                    provided[cd.col_id] = self._array_literal_value(
                        expr_ast, cd, binder
                    )
                    continue
                e = binder.bind(expr_ast)
                v = _const_value(e, cd.type)
                provided[cd.col_id] = v
            for cd in t.columns:
                if cd.col_id in provided:
                    by_col[cd.col_id].append(provided[cd.col_id])
                elif cd.default is not None:
                    by_col[cd.col_id].append(cd.default)
                elif cd.type.nullable:
                    by_col[cd.col_id].append(None)
                else:
                    raise SqlError(f"column {cd.name} has no default and is NOT NULL")
        arrays = {}
        for cd in t.columns:
            vals = by_col[cd.col_id]
            if cd.type.is_array:
                from heavydb_tpu.storage.table import to_physical

                arrays[cd.col_id] = to_physical(
                    vals, cd.type, t.dicts.get(cd.col_id)
                )
            elif cd.type.is_dict_string:
                arrays[cd.col_id] = t.dict_for(cd.col_id).get_or_add_bulk(vals)
            elif cd.type.is_none_string:
                from heavydb_tpu.storage.table import to_physical

                arrays[cd.col_id] = to_physical(vals, cd.type, None)
            else:
                # _const_value already produced PHYSICAL values
                dt = cd.type.np_dtype()
                sent = cd.type.null_sentinel()
                arrays[cd.col_id] = np.array(
                    [sent if v is None else v for v in vals], dt
                )
        t.insert_columns(arrays)

    def _array_literal_value(self, expr_ast, cd, binder):
        """{...} / ARRAY[...] / NULL in INSERT VALUES → python list of
        element values (reference Importer TypedImportBuffer addArray)."""
        from heavydb_tpu.sql import ast as A

        if isinstance(expr_ast, A.Literal) and expr_ast.kind == "null":
            return None
        if cd.type.is_geo:
            if isinstance(expr_ast, A.FuncCall) and expr_ast.name in (
                "ST_GEOMFROMTEXT", "ST_GEOGFROMTEXT"
            ):
                expr_ast = expr_ast.args[0]
            if isinstance(expr_ast, A.Literal) and expr_ast.kind == "string":
                return expr_ast.value  # WKT; to_physical parses
            raise SqlError(f"column {cd.name} expects a WKT literal")
        if not isinstance(expr_ast, A.ArrayLiteral):
            raise SqlError(
                f"column {cd.name} expects an array literal"
            )
        eti = cd.type.elem_type()
        out = []
        for item in expr_ast.items:
            e = binder.bind(item)
            if eti.is_dict_string:
                from heavydb_tpu.plan import exprs as E

                if isinstance(e, E.Constant):
                    out.append(None if e.value is None else str(e.value))
                else:
                    raise SqlError("array literal elements must be constant")
            else:
                out.append(_const_value(e, eti))
        return out
        return None

    def _insert_select(self, st: A.InsertSelect) -> None:
        t = self.catalog.get_table(st.table)
        _reject_foreign_write(t)
        plan = optimize(self._plan_select(st.select))
        batch = self.executor.execute(plan)
        host = batch.to_numpy()
        target_cols = (
            [self._col_of(t, c) for c in st.columns]
            if st.columns
            else list(t.columns)
        )
        if len(target_cols) != plan.arity:
            raise SqlError("INSERT SELECT column count mismatch")
        cols = {}
        for cd, i in zip(target_cols, range(plan.arity)):
            src_ti = plan.types[i]
            arr = host[i]
            if cd.type.is_array:
                if not src_ti.is_array:
                    raise SqlError(f"cannot insert {src_ti} into array column")
                arr = self._array_col_for_insert(plan, i, arr, t, cd)
            elif cd.type.is_dict_string:
                src_ref = _node_dict_ref(plan, i)
                if src_ref is None:
                    raise NotSupported("INSERT of computed strings")
                src = self.dict_by_ref(src_ref)
                strings = src.get_strings(arr)
                arr = t.dict_for(cd.col_id).get_or_add_bulk(strings)
            elif src_ti.kind != cd.type.kind or (
                cd.type.is_decimal and src_ti.scale != cd.type.scale
            ):
                arr = _host_cast_array(arr, src_ti, cd.type)
            cols[cd.col_id] = arr
        for cd in t.columns:
            if cd.col_id not in cols:
                if not cd.type.nullable:
                    raise SqlError(f"column {cd.name} is NOT NULL")
                cols[cd.col_id] = to_physical(
                    [None] * batch.nrows, cd.type, t.dicts.get(cd.col_id)
                )
        if batch.nrows:
            t.insert_columns(cols)
        return None

    @staticmethod
    def _col_of(t: Table, name: str):
        cd = t.column_by_name(name)
        if cd is None:
            raise CatalogError(f"no column {name!r} in {t.name}")
        return cd

    # ------------------------------------------------------------------
    # UPDATE / DELETE — executed as full-table projections + rebuild
    # (reference compiles these as projection kernels through
    # StorageIOFacility, QueryEngine/ExecuteUpdate.cpp; our round-1 storage
    # rebuild keeps semantics identical while the fragment-level in-place
    # update path arrives with the storage shell)
    # ------------------------------------------------------------------
    def _matched_rows_and_values(self, t: Table, where, value_exprs):
        """Evaluate `SELECT rowid, values... WHERE cond` — the
        predicate/expression half of fragment-level UPDATE/DELETE
        (reference UpdelStorage: the update kernel yields row offsets +
        values, the fragmenter applies them in place).  Running the
        predicate as a real FILTER (not a projected mask) keeps
        chunk-stat fragment skipping live and transfers only the
        MATCHED rows to host."""
        proj = [(A.Identifier(("rowid",)), "$r")] + [
            (e, f"$v{i}") for i, e in enumerate(value_exprs)
        ]
        sel = A.Select(projections=proj, from_=A.NamedTable(t.name),
                       where=where)
        plan = optimize(self._plan_select(sel))
        batch = self.executor.execute(plan)
        host = batch.to_numpy()
        rowids = np.asarray(host[0], np.int64)
        return rowids, host[1:], plan

    def _update(self, st: A.Update) -> None:
        t = self.catalog.get_table(st.table)
        _reject_foreign_write(t)
        assigned = [(self._col_of(t, name), expr)
                    for name, expr in st.assignments]
        if any(cd.type.is_array for cd, _ in assigned):
            raise NotSupported("UPDATE of array/geo columns")
        rowids, vals, plan = self._matched_rows_and_values(
            t, st.where, [e for _, e in assigned]
        )
        if rowids.shape[0] == 0:
            return None
        new_cols = {}
        for (cd, _), arr, i in zip(assigned, vals, range(1, len(vals) + 1)):
            src_ti = plan.types[i]
            if cd.type.is_dict_string:
                src_ref = _node_dict_ref(plan, i)
                arr = arr.astype(np.int32)
                if src_ref != (t.table_id, cd.col_id):
                    # re-intern values coming from another dictionary
                    # (literals land in per-query transient dicts)
                    src = self.dict_by_ref(src_ref) if src_ref else None
                    if src is None:
                        raise NotSupported("UPDATE from computed strings")
                    strings = src.get_strings(arr)
                    arr = t.dict_for(cd.col_id).get_or_add_bulk(strings)
            elif cd.type.is_none_string:
                # planner executed the column as lazy-dict ids; store
                # RAW strings back into the object chunk
                src_ref = _node_dict_ref(plan, i)
                src = self.dict_by_ref(src_ref) if src_ref else None
                if src is None:
                    raise NotSupported("UPDATE from computed strings")
                strings = src.get_strings(np.asarray(arr).astype(np.int64))
                out = np.empty(len(strings), object)
                for j, s in enumerate(strings):
                    out[j] = s
                arr = out
            elif src_ti.kind != cd.type.kind or (
                cd.type.is_decimal and src_ti.scale != cd.type.scale
            ):
                arr = _host_cast_array(arr, src_ti, cd.type)
            new_cols[cd.col_id] = arr
        old_gen = t.generation
        t.update_rows_at(rowids, new_cols)
        # migrate resident device arrays (scatter patch) instead of
        # letting the generation bump force an O(table) re-upload
        self.executor.patch_cache_update(t, old_gen, rowids, new_cols)
        return None

    def _delete(self, st: A.Delete) -> None:
        t = self.catalog.get_table(st.table)
        _reject_foreign_write(t)
        if st.where is None:
            t.delete_all()
            return None
        rowids, _, _ = self._matched_rows_and_values(t, st.where, [])
        if rowids.shape[0]:
            old_gen = t.generation
            old_n = t.num_rows
            t.delete_rows_at(rowids)
            self.executor.patch_cache_delete(t, old_gen, old_n, rowids)
        return None

    def _replace_table_data(self, t: Table, sel: A.Select):
        plan = optimize(self._plan_select(sel))
        batch = self.executor.execute(plan)
        host = batch.to_numpy()
        cols = {}
        for cd, i in zip(t.columns, range(plan.arity)):
            arr = host[i]
            src_ti = plan.types[i]
            if cd.type.is_array:
                ref = _node_dict_ref(plan, i)
                if ref is None:
                    raise NotSupported("UPDATE of array columns")
                arr, _ = self._rowids_to_object(ref, arr)
            elif cd.type.is_dict_string:
                # ids are already in this table's dictionary (identity or CASE
                # over the same column); CASE over dict strings keeps ids
                arr = arr.astype(np.int32)
            elif src_ti.kind != cd.type.kind or (
                cd.type.is_decimal and src_ti.scale != cd.type.scale
            ):
                arr = _host_cast_array(arr, src_ti, cd.type)
            cols[cd.col_id] = arr
        t.delete_all()
        if batch.nrows:
            t.insert_columns(cols)

    # ------------------------------------------------------------------
    # COPY
    # ------------------------------------------------------------------
    def _copy_from(self, st: A.CopyFrom) -> ResultSet:
        from heavydb_tpu.io.csv_import import detect_column_types, import_csv

        src_type = str(st.options.get("source_type", "")).lower()
        if src_type in ("geo_file", "geojson") or (
            not src_type and st.path.lower().endswith(".geojson")
        ):
            # reference GDAL geo import (source_type='geo_file')
            from heavydb_tpu.io.geo_import import import_geo

            n = import_geo(self, st.table, st.path, st.options)
            return _string_result("result", [f"Loaded: {n} recs"])
        if src_type == "raster_file" or (
            not src_type
            and st.path.lower().endswith((".tif", ".tiff", ".asc", ".xyz"))
        ):
            # reference GDAL raster import (RasterImporter.cpp)
            from heavydb_tpu.io.raster_import import import_raster

            n = import_raster(self, st.table, st.path, st.options)
            return _string_result("result", [f"Loaded: {n} recs"])
        t = self.catalog.get_table_opt(st.table)
        if t is None:
            # auto-create with detected schema (reference detect_column_types)
            schema = detect_column_types(st.path, st.options)
            t = self.catalog.create_table(st.table, schema)
        n = import_csv(t, st.path, st.options)
        return _string_result("result", [f"Loaded: {n} recs"])

    def _copy_to(self, st: A.CopyTo) -> ResultSet:
        rs = self._run_select(st.select)
        from heavydb_tpu.io.csv_export import export_result

        n = export_result(rs, st.path, st.options)
        return _string_result("result", [f"Exported: {n} recs"])

    def _insert_columns(self, t: Table, cols: Dict[str, np.ndarray]):
        _reject_foreign_write(t)
        arrays = {}
        for cd in t.columns:
            key = None
            for k in cols:
                if k.lower() == cd.name.lower():
                    key = k
                    break
            if key is None:
                raise StorageError(f"missing column {cd.name}")
            arrays[cd.col_id] = to_physical(
                cols[key], cd.type, t.dicts.get(cd.col_id)
            )
        t.insert_columns(arrays)
        self._maybe_prestage(t)

    def _maybe_prestage(self, t):
        cfg = self.config
        on = cfg.eager_device_staging
        if on is None:
            try:
                import jax

                on = jax.default_backend() == "tpu"
            except Exception:
                on = False
        if on and t.num_rows >= cfg.eager_staging_min_rows:
            with self.executor.timer.scope("eager_stage"):
                self.executor.prestage_table(t)


# ---------------------------------------------------------------------------


def _reject_foreign_write(t):
    if getattr(t, "foreign", None) is not None:
        raise SqlError(
            f"foreign table {t.name!r} is read-only (REFRESH FOREIGN "
            "TABLES to re-import)"
        )


def _const_value(e: E.Expr, target: T.TypeInfo):
    if isinstance(e, E.Constant):
        if e.value is None:
            return None
        if target.is_dict_string or target.is_none_string:
            if not e.type.is_string:
                raise SqlError(f"cannot insert {e.type} into TEXT column")
            return str(e.value)
        return _const_cast(e.value, e.type, target)
    raise NotSupported("INSERT VALUES requires constant expressions")


def _host_cast_array(arr: np.ndarray, src: T.TypeInfo, dst: T.TypeInfo) -> np.ndarray:
    """Numpy-side cast between physical representations, preserving nulls."""
    s_sent = src.null_sentinel()
    if arr.dtype.kind == "f":
        nulls = np.isnan(arr)
    else:
        nulls = arr == s_sent
    real = arr.astype(np.float64)
    if src.is_decimal:
        real = real / 10**src.scale
    dt = dst.np_dtype()
    if dst.is_decimal:
        out = np.round(real * 10**dst.scale).astype(np.int64)
    elif dt.kind == "f":
        out = real.astype(dt)
    else:
        out = np.trunc(real).astype(dt)
    if dt.kind == "f":
        out[nulls] = np.nan
    else:
        out[nulls] = dst.null_sentinel()
    return out


def _stmt_tables(st) -> list:
    """Table names a statement touches, for privilege checks."""
    out = []

    def from_ref(r):
        if r is None:
            return
        if isinstance(r, A.NamedTable):
            out.append(r.name)
        elif isinstance(r, A.JoinRef):
            from_ref(r.left)
            from_ref(r.right)
        elif isinstance(r, A.SubqueryRef):
            from_select(r.select)

    def from_select(sel):
        from_ref(sel.from_)
        for _, cte in sel.ctes:
            from_select(cte)
        for _, rhs in sel.set_ops:
            from_select(rhs)

    if isinstance(st, A.Select):
        from_select(st)
    elif isinstance(st, (A.InsertValues, A.Update, A.Delete, A.CopyFrom,
                         A.TruncateTable)):
        out.append(getattr(st, "table", getattr(st, "name", "")))
    elif isinstance(st, A.InsertSelect):
        out.append(st.table)
        from_select(st.select)
    elif isinstance(st, (A.CreateTable,)):
        out.append(st.name)
        if st.as_select is not None:
            from_select(st.as_select)
    elif isinstance(st, A.DropTable):
        out.append(st.name)
    return [t for t in out if t]


def _iter_all_exprs(node):
    from heavydb_tpu.exec.executor import _iter_node_exprs

    yield from _iter_node_exprs(node)
    if isinstance(node, R.Window):
        yield from node.wfuncs
    if isinstance(node, R.Project):
        yield from node.exprs
    if isinstance(node, R.Filter):
        yield node.condition
    if isinstance(node, R.Aggregate):
        yield from node.group_exprs
        yield from node.agg_exprs


def _register_system_tfs(registry, db=None):
    """Built-in table functions (reference SystemFunctions/os/ subset)."""

    def generate_series(*args, cursor=None):
        start = int(args[0])
        stop = int(args[1])
        step = int(args[2]) if len(args) > 2 else 1
        return {"generate_series": np.arange(start, stop + (1 if step > 0 else -1), step, dtype=np.int64)}

    def tf_mandelbrot(*args, cursor=None):  # parity playground TF
        x_pixels = int(args[0])
        y_pixels = int(args[1])
        xs = np.linspace(-2.0, 1.0, x_pixels)
        ys = np.linspace(-1.5, 1.5, y_pixels)
        c = xs[None, :] + 1j * ys[:, None]
        z = np.zeros_like(c)
        it = np.zeros(c.shape, np.int32)
        for i in range(64):
            m = np.abs(z) <= 2
            z = np.where(m, z * z + c, z)
            it += m
        yy, xx = np.meshgrid(range(y_pixels), range(x_pixels), indexing="ij")
        return {
            "x": xx.ravel().astype(np.int32),
            "y": yy.ravel().astype(np.int32),
            "num_iterations": it.ravel(),
        }

    # ---- ML table functions (reference TableFunctions/SystemFunctions/
    # os/ML: LINEAR_REG_FIT/PREDICT, KMEANS, PCA via oneDAL — here as
    # closed-form / Lloyd's numpy implementations over CURSOR inputs) ----
    def linear_reg_fit(*args, cursor=None):
        """CURSOR(SELECT y, x1 [, x2 ...]) → one coefficient per row
        (intercept first), least squares."""
        cols = list(cursor.values())
        y = np.asarray(cols[0], np.float64)
        X = np.column_stack(
            [np.ones_like(y)] + [np.asarray(c, np.float64) for c in cols[1:]]
        )
        ok = np.isfinite(y)
        for j in range(1, X.shape[1]):
            ok &= np.isfinite(X[:, j])
        coef, *_ = np.linalg.lstsq(X[ok], y[ok], rcond=None)
        return {
            "coef_idx": np.arange(len(coef), dtype=np.int32),
            "coef": coef,
        }

    def linear_reg_predict(*args, cursor=None):
        """CURSOR(SELECT id, x1 [, x2 ...]) + coef args → predictions."""
        cols = list(cursor.values())
        ids = np.asarray(cols[0])
        X = np.column_stack(
            [np.ones(len(ids))]
            + [np.asarray(c, np.float64) for c in cols[1:]]
        )
        coef = np.asarray([float(a) for a in args], np.float64)
        return {"id": ids, "prediction": X @ coef}

    def kmeans(*args, cursor=None):
        """CURSOR(SELECT id, f1 [, f2 ...]), k[, iters] → cluster per row
        (Lloyd's algorithm, k-means++ style farthest-point seeding)."""
        cols = list(cursor.values())
        ids = np.asarray(cols[0])
        X = np.column_stack([np.asarray(c, np.float64) for c in cols[1:]])
        k = int(args[0])
        iters = int(args[1]) if len(args) > 1 else 20
        rng = np.random.default_rng(0)
        cent = X[rng.choice(len(X), 1)]
        while len(cent) < k:
            d = ((X[:, None, :] - cent[None]) ** 2).sum(-1).min(1)
            cent = np.vstack([cent, X[d.argmax()][None]])
        for _ in range(iters):
            a = ((X[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
            for j in range(k):
                if (a == j).any():
                    cent[j] = X[a == j].mean(0)
        return {"id": ids, "cluster_id": a.astype(np.int32)}

    def pca_project(*args, cursor=None):
        """CURSOR(SELECT id, f1, f2, ...), n_components → projections onto
        the top principal components."""
        cols = list(cursor.values())
        ids = np.asarray(cols[0])
        X = np.column_stack([np.asarray(c, np.float64) for c in cols[1:]])
        nc = int(args[0]) if args else min(2, X.shape[1])
        Xc = X - X.mean(0)
        _, _, vt = np.linalg.svd(Xc, full_matrices=False)
        proj = Xc @ vt[:nc].T
        out = {"id": ids}
        for j in range(nc):
            out[f"pc{j + 1}"] = proj[:, j]
        return out

    def tf_compute_dwell_times(*args, cursor=None):
        """CURSOR(SELECT entity_id, site_id, ts) → per-visit dwell times
        (reference SystemFunctions tf_compute_dwell_times: sessionize by
        entity, dwell = next-ts - ts within entity)."""
        cols = list(cursor.values())
        ent = np.asarray(cols[0])
        site = np.asarray(cols[1])
        ts = np.asarray(cols[2], np.int64)
        order = np.lexsort((ts, ent))
        ent_s, site_s, ts_s = ent[order], site[order], ts[order]
        same_next = np.zeros(len(ent), bool)
        if len(ent):
            same_next[:-1] = ent_s[:-1] == ent_s[1:]
        dwell = np.where(
            same_next, np.roll(ts_s, -1) - ts_s, -1
        ).astype(np.int64)
        keep = dwell >= 0
        return {
            "entity_id": ent_s[keep],
            "site_id": site_s[keep],
            "ts": ts_s[keep],
            "dwell_time_sec": dwell[keep],
        }

    # ---- tree-model regression (reference DECISION_TREE_REG_FIT /
    # RANDOM_FOREST_REG_FIT / GBT_REG_FIT / ML_REG_PREDICT / R2_SCORE,
    # TableFunctions/SystemFunctions/os/ML + MLPredictCodegen.cpp).
    # Fitted models live in a per-connection named registry the way the
    # reference's MLModelMap does; prediction is the branch-free gather
    # ladder in ops/ml.py. ----
    def _cursor_xy(cursor):
        cols = list(cursor.values())
        if len(cols) < 2:
            raise NotSupported(
                "ML fit cursor needs a target column followed by at least "
                "one feature column"
            )
        y = np.asarray(cols[0], np.float64)
        X = np.column_stack([np.asarray(c, np.float64) for c in cols[1:]])
        ok = np.isfinite(y)
        for j in range(X.shape[1]):
            ok &= np.isfinite(X[:, j])
        return X[ok], y[ok]

    def _fit_summary(name, model):
        if db is not None:
            db._ml_models[str(name).lower()] = model
        return {
            "model_name": np.array([str(name)], object),
            "kind": np.array([model.kind], object),
            "n_trees": np.array([len(model.trees)], np.int32),
            "n_features": np.array([model.n_features], np.int32),
        }

    def decision_tree_reg_fit(*args, cursor=None):
        """(model_name [, max_depth [, min_leaf]], CURSOR(y, x1..xk))"""
        from heavydb_tpu.ops import ml

        X, y = _cursor_xy(cursor)
        depth = int(args[1]) if len(args) > 1 else 8
        leaf = int(args[2]) if len(args) > 2 else 4
        return _fit_summary(args[0], ml.fit_single(X, y, depth, leaf))

    def random_forest_reg_fit(*args, cursor=None):
        """(model_name [, n_trees [, max_depth]], CURSOR(y, x1..xk))"""
        from heavydb_tpu.ops import ml

        X, y = _cursor_xy(cursor)
        n_trees = int(args[1]) if len(args) > 1 else 16
        depth = int(args[2]) if len(args) > 2 else 8
        return _fit_summary(
            args[0], ml.fit_forest(X, y, n_trees=n_trees, max_depth=depth))

    def gbt_reg_fit(*args, cursor=None):
        """(model_name [, n_trees [, max_depth [, learning_rate]]],
        CURSOR(y, x1..xk))"""
        from heavydb_tpu.ops import ml

        X, y = _cursor_xy(cursor)
        n_trees = int(args[1]) if len(args) > 1 else 32
        depth = int(args[2]) if len(args) > 2 else 3
        lr = float(args[3]) if len(args) > 3 else 0.2
        return _fit_summary(
            args[0], ml.fit_gbt(X, y, n_trees=n_trees, max_depth=depth,
                                learning_rate=lr))

    def _get_model(name):
        m = (db._ml_models if db is not None else {}).get(
            str(name).lower())
        if m is None:
            raise ValueError(f"unknown ML model {name!r}")
        return m

    def ml_reg_predict(*args, cursor=None):
        """(model_name, CURSOR(id, x1..xk)) → id, prediction"""
        m = _get_model(args[0])
        cols = list(cursor.values())
        ids = np.asarray(cols[0])
        X = np.column_stack([np.asarray(c, np.float64) for c in cols[1:]])
        pred = m.predict(X)
        # rows with non-finite features were dropped at fit time; at
        # predict time they must yield NULL, not an arbitrary tree path
        bad = ~np.isfinite(X).all(axis=1)
        if bad.any():
            pred = np.where(bad, np.nan, pred)
        return {"id": ids, "prediction": pred}

    def r2_score(*args, cursor=None):
        """(model_name, CURSOR(y, x1..xk)) → coefficient of determination"""
        m = _get_model(args[0])
        X, y = _cursor_xy(cursor)
        pred = m.predict(X)
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        if ss_tot:
            r2 = 1.0 - ss_res / ss_tot
        else:
            # constant y: a perfect fit scores 1.0 (sklearn convention)
            r2 = 1.0 if ss_res == 0.0 else 0.0
        return {"r2": np.array([r2], np.float64)}

    def ml_models(*args, cursor=None):
        names = sorted(db._ml_models) if db is not None else []
        return {
            "model_name": np.array(names, object),
            "kind": np.array(
                [db._ml_models[n].kind for n in names], object),
        }

    registry["decision_tree_reg_fit"] = decision_tree_reg_fit
    registry["random_forest_reg_fit"] = random_forest_reg_fit
    registry["gbt_reg_fit"] = gbt_reg_fit
    registry["ml_reg_predict"] = ml_reg_predict
    registry["r2_score"] = r2_score
    registry["ml_models"] = ml_models

    registry["generate_series"] = generate_series
    registry["tf_mandelbrot"] = tf_mandelbrot
    registry["linear_reg_fit"] = linear_reg_fit
    registry["linear_reg_predict"] = linear_reg_predict
    registry["kmeans"] = kmeans
    registry["pca_project"] = pca_project
    registry["tf_compute_dwell_times"] = tf_compute_dwell_times


def _string_result(name: str, values: List[str]) -> ResultSet:
    return ResultSet(
        [name],
        [T.TypeInfo(T.SQLTypeKind.TEXT, False)],
        [np.array(values, object)],
        [None],
    )


def _normalize_tabular(data) -> Dict[str, np.ndarray]:
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return {c: data[c].to_numpy() for c in data.columns}
    except ImportError:
        pass
    try:
        import pyarrow as pa

        if isinstance(data, pa.Table):
            return {c: data[c].to_numpy(zero_copy_only=False) for c in data.column_names}
    except ImportError:
        pass
    if isinstance(data, dict):
        out = {}
        for k, v in data.items():
            if isinstance(v, list) and any(
                isinstance(x, (list, tuple, np.ndarray)) for x in v
            ):
                # ragged list-of-lists (array column): keep as object rows
                a = np.empty(len(v), object)
                for i, x in enumerate(v):
                    a[i] = x
                out[k] = a
            else:
                out[k] = np.asarray(v)
        return out
    raise StorageError(f"cannot load {type(data)}")


def _infer_type_values(vals) -> T.TypeInfo:
    """SQL type from a sample of python values (DB-API cursor rows —
    reference: the ODBC wrapper maps SQL_* column types; DB-API erases
    them, so we type from the data)."""
    seen = {type(v) for v in vals if v is not None}
    if not seen:
        return T.text_dict()
    if seen <= {bool}:
        return T.boolean()
    if seen <= {int, bool}:
        return T.bigint()
    if seen <= {int, float, bool}:
        return T.double()
    return T.text_dict()


def _infer_type(arr: np.ndarray) -> T.TypeInfo:
    k = arr.dtype.kind
    if k == "b":
        return T.boolean()
    if k == "i":
        return T.bigint() if arr.dtype.itemsize > 4 else T.integer()
    if k == "f":
        return T.double()
    if k in ("U", "O"):
        return T.text_dict()
    if k == "M":
        return T.timestamp()
    raise StorageError(f"cannot infer SQL type for dtype {arr.dtype}")
