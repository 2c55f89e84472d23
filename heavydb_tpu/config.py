"""Engine configuration / flag system.

Analogue of the reference's `SystemParameters` + the `g_*` globals bound by
CommandLineOptions (ThriftHandler/CommandLineOptions.cpp, 281 flags).  We keep
one dataclass; server/CLI layers map CLI/INI options onto it, and a runtime-
settable subset is exposed via ALTER SYSTEM/SESSION (reference
Catalog/DdlCommandExecutor).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Config:
    # ---- storage / fragmentation ----
    # Rows per fragment (reference default 32M, Fragmenter/FragmentDefaultValues.h:19).
    # We keep fragments smaller by default so fragment-level metadata pruning has
    # granularity on typical test data; benchmarks override.
    default_fragment_rows: int = 1 << 22  # 4M
    # Device scan-cache byte budget for LRU eviction (reference BufferMgr
    # slab LRU).  0 = auto (~70% of device memory).  -1 = unbounded.
    device_cache_bytes: int = 0
    # Eagerly stage bulk-loaded columns into the device scan cache (and
    # force one tiny D2H sync) at LOAD time: the axon relay's first
    # device->host fetch after a heavy host->device burst can stall for
    # minutes (measured 60-1400s), which would otherwise land on the
    # first QUERY.  None = auto (on for TPU backends, off elsewhere).
    eager_device_staging: "Optional[bool]" = None
    # Minimum rows before eager staging bothers (tiny tables stage
    # on-demand at negligible cost)
    eager_staging_min_rows: int = 1 << 20
    # Fragment-streaming threshold: single-table aggregates whose needed
    # scan bytes exceed this execute in fragment waves with partial-agg
    # merge, so tables larger than HBM stay queryable (reference
    # gpu_input_mem_limit punt-to-CPU / out-of-core).  0 = auto (cache
    # budget / 2); -1 disables streaming.
    stream_threshold_bytes: int = 0
    # Row cap per fragment wave in streamed ORDER BY ... LIMIT (radix
    # select temporaries are a few bytes/row; an uncapped 1B-row wave
    # would exhaust HBM).
    topk_stream_row_cap: int = 1 << 26
    # Device row-block size: fragments are padded to a multiple of this so one
    # compiled XLA program serves all fragments (the multifrag-kernel trick).
    row_block: int = 1 << 13  # 8192

    # ---- group-by ----
    # Dense-range ceiling for the positional perfect-hash path.  Round-2
    # measurements (chained-loop protocol): colliding scatters are
    # slot-count independent — 267ms @64k..1M slots, 450ms @10M slots for
    # 20M-row COUNT+SUM — so dense scatters stay profitable to ~16M slots
    # (beyond that the partial buffers start costing real HBM); the sort
    # path (629ms @10M sparse) covers wider/sparser key spaces.
    baseline_groupby_threshold: int = 1 << 24
    # Above this many perfect-hash slots, route to the sorted-segment
    # tier instead of per-slot scatters: lax.sort at 20M rows measures
    # 57-93ms on v5e while a 10M-slot scatter-count costs 226ms plus
    # slot compaction (bench groupby_10m_sparse 655ms → ~250ms sorted).
    sortagg_min_slots: int = 1 << 20
    # multi-round hash slot claiming for sparse keys: claims + compacted
    # accumulation are several colliding scatters over claim-table-sized
    # buffers, which loses to the sort path under the per-slot scatter
    # cost above.  Off by default on this runtime; flip on to re-evaluate
    # on runtimes with native scatter performance.
    enable_hash_groupby: bool = False
    # col || col between two dict-encoded strings builds a DENSE |L|x|R|
    # pairwise translation table at launch; this caps the cross-product
    # size (4M pairs intern in ~0.2s via the native dictionary).
    pair_concat_max_entries: int = 1 << 22
    # Radix-partition Pallas sparse group-by tier (kernels/radix_groupby,
    # the TPU-native counterpart of the reference's baseline-hash group-by
    # GroupByRuntime.cpp:25): dense-gid key spaces past sortagg_min_slots
    # route through the in-VMEM partition pipeline (measured 59.6ms vs the
    # sort tier's 190ms at 20M rows x 10M slots) when the aggregate set
    # maps onto the kernel's stream budget.  Hard overflow (a skewed
    # partition or the int-limb exactness bound) falls back to the sort
    # tier via the retry ladder.
    enable_radix_groupby: bool = True
    # Force the radix tier on non-TPU backends (interpret-mode Pallas):
    # CI differential coverage of the engine-side routing.
    force_radix_groupby: bool = False
    # Initial entry-count guess for baseline (sort-based) group-by when no
    # estimate is available; retry ladder doubles on OutOfSlots.
    baseline_groupby_initial_entries: int = 1 << 14
    # Fill-factor headroom applied to NDV estimates (reference uses 50% fill,
    # 2x overallocation for baseline hash tables).
    groupby_entries_headroom: float = 1.3

    # ---- joins ----
    # Max dense key range for the perfect join-hash-table path
    # (reference PerfectJoinHashTable).
    perfect_join_max_range: int = 1 << 26
    # Loop-join fallback threshold (reference g_trivial_loop_join_threshold=1000).
    trivial_loop_join_threshold: int = 1000
    # Dynamic selectivity probe (reference JoinFilterPushDown.cpp +
    # find_push_down_candidates re-plan loop): before the runtime join
    # reorder, count the rows surviving each input's single-input WHERE
    # conjuncts with a tiny fused count kernel, so the build/probe decision
    # sees POST-filter cardinalities.  Counts are cached per (conjuncts,
    # table generation).
    enable_selectivity_probe: bool = True
    # Initial output-capacity multiplier for 1:N join fan-out.
    join_fanout_headroom: float = 1.5

    # ---- execution ----
    enable_watchdog: bool = False
    watchdog_max_projected_rows: int = 128_000_000
    enable_dynamic_watchdog: bool = False
    dynamic_watchdog_time_limit_ms: int = 0
    # session lifecycle eviction (reference Catalog/SessionsStore.cpp);
    # 0 disables
    idle_session_duration_s: int = 0
    max_session_duration_s: int = 0
    # Two-pass filtered projection: static output cap = input rows unless a
    # LIMIT lets us cap lower (reference scan_limit).
    enable_columnar_output: bool = True
    # Execution device: "auto" picks TPU if present else CPU.
    device: str = "auto"
    # Buckets for shape-dependent recompiles: row counts round up to the next
    # power of two so the jit cache stays small (reference CodeCache economics).
    shape_bucket_pow2: bool = True

    # ---- distributed ----
    # Number of data-parallel shards (devices) to partition tables over.
    num_shards: Optional[int] = None

    # ---- logging / debug ----
    enable_debug_timer: bool = False

    # admission control (reference ExecutorResourceMgr; enable-executor-
    # resource-mgr + executor-cpu-result-mem-ratio style knobs)
    # Disk-backed plan-artifact cache (jax.export-serialized kernels —
    # the CodeCache role, reference NativeCodegen.cpp): fresh processes
    # skip re-tracing compiled plans.  TPU backends only.
    enable_plan_artifact_cache: bool = True
    enable_executor_resource_mgr: bool = True
    max_concurrent_queries: int = 4
    max_exec_bytes: int = 0  # 0 = unlimited
    admission_queue_timeout_s: float = 300.0
    log_level: str = os.environ.get("HEAVYDB_TPU_LOG", "WARNING")

    def clone(self, **overrides) -> "Config":
        return dataclasses.replace(self, **overrides)


DEFAULT = Config()
