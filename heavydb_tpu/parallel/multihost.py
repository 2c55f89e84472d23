"""Multi-host execution runtime over jax.distributed.

The reference's enterprise aggregator/leaf cluster (SURVEY §2.6.3: Thrift
start_query / execute_query_step / broadcast_serialized_rows,
heavy.thrift:769-771) maps onto a jax.distributed process group:

- every host runs the same engine process; `MultiHostRuntime.initialize`
  joins the cluster (coordinator = aggregator-role host 0);
- tables are row-partitioned across hosts (`DistEngine.load_table`), with
  string dictionaries built GLOBALLY (deterministic merge of per-host
  uniques) so dictionary ids agree everywhere — the role of the
  reference's StringDictionary generations in prepareLeafExecution
  (QueryEngine/RelAlgExecutor.cpp:1324);
- per-step execution: each host runs the leaf Compound over its local
  partition (partial aggregates), partial rows are exchanged with
  process_allgather (the data plane that replaces serialized ResultSets
  over Thrift), and the aggregator-merge Compound runs replicated so all
  hosts hold the final result (parallel/dist_engine.py);
- cross-host collectives ride jax's distributed backend: Gloo on CPU CI
  rigs, ICI/DCN on TPU pod slices.

Validated by the N-process CPU rig in tests/test_multihost.py (the
reference ships no OSS cluster test backend — SURVEY §4 — so the rig is
ours).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class MultiHostRuntime:
    """Process-group membership + host-data exchange helpers."""

    def __init__(self):
        self.initialized = False
        self.num_processes = 1
        self.process_id = 0

    def initialize(
        self,
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
        force_cpu: bool = False,
    ) -> bool:
        """Join (or bootstrap) the cluster.  Single-process → no-op."""
        import jax

        if force_cpu:
            # in-process override: the axon sitecustomize ignores
            # JAX_PLATFORMS from the environment
            jax.config.update("jax_platforms", "cpu")
        if num_processes is None or num_processes <= 1:
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        self.initialized = True
        self.num_processes = num_processes
        self.process_id = process_id or 0
        return True

    @property
    def is_leader(self) -> bool:
        return self.process_id == 0

    # ---- host-data exchange (control/data plane helpers) ----

    def allgather_scalar(self, x: int) -> List[int]:
        from jax.experimental import multihost_utils as mhu

        g = mhu.process_allgather(np.int64(x))
        return [int(v) for v in np.asarray(g).reshape(-1)]

    def allgather_array(self, a: np.ndarray) -> List[np.ndarray]:
        """Gather a variable-length 1-D array from every host (padded
        exchange; trimmed per-host on receipt)."""
        from jax.experimental import multihost_utils as mhu

        n = int(a.shape[0])
        counts = self.allgather_scalar(n)
        m = max(counts + [1])
        pad = np.zeros((m,), a.dtype)
        pad[:n] = a
        g = np.asarray(mhu.process_allgather(pad))
        # single axis0 entry per process
        return [g[p, : counts[p]] for p in range(self.num_processes)]

    def allgather_concat(self, arrays: List[np.ndarray]) -> List[np.ndarray]:
        """Gather several same-length columns from every host and return
        the concatenation over hosts for each column."""
        out = []
        for a in arrays:
            parts = self.allgather_array(np.ascontiguousarray(a))
            out.append(np.concatenate(parts))
        return out

    def allgather_bytes(self, b: bytes) -> List[bytes]:
        arr = np.frombuffer(b, np.uint8)
        return [bytes(p.tobytes()) for p in self.allgather_array(arr)]

    def allgather_strings(self, strings: List[str]) -> List[str]:
        """Deterministic global merge of per-host string lists (dictionary
        build): process order, then first-seen order within each host."""
        blob = "\x00".join(strings).encode("utf-8")
        merged: List[str] = []
        seen = set()
        for b in self.allgather_bytes(blob):
            if not b:
                continue
            for s in b.decode("utf-8").split("\x00"):
                if s not in seen:
                    seen.add(s)
                    merged.append(s)
        return merged

    def exchange_rows(
        self, cols: List[np.ndarray], dest: np.ndarray
    ) -> List[np.ndarray]:
        """Route row i of `cols` to host dest[i] (the repartition data
        plane — reference broadcast_serialized_rows re-routing rows for
        the next distributed step).  Emulated with allgather + local
        filter: the Gloo CPU backend has no all-to-all, so traffic is
        allgather-shaped, but memory/compute partition correctly — swap
        for a real ragged all-to-all on ICI/DCN pods."""
        all_dest = np.concatenate(
            self.allgather_array(
                np.ascontiguousarray(np.asarray(dest, np.int32))
            )
        )
        keep = all_dest == self.process_id
        out = []
        for c in cols:
            parts = self.allgather_array(np.ascontiguousarray(c))
            out.append(np.concatenate(parts)[keep])
        return out

    def barrier(self, name: str = "hdt"):
        from jax.experimental import multihost_utils as mhu

        mhu.sync_global_devices(name)


def generations_snapshot(db) -> Dict[str, dict]:
    """Consistent metadata snapshot for distributed planning (reference
    AggregatedColRange + StringDictionaryGenerations + TableGenerations,
    RelAlgExecutor.cpp:1324-1338).  Consumed by DistEngine.sql to verify
    all hosts plan against the same global metadata."""
    out = {}
    for name in db.catalog.list_tables():
        t = db.catalog.get_table(name)
        cols = {}
        for cd in t.columns:
            mn, mx, has_nulls = t.column_range(cd.col_id)
            cols[cd.name] = {
                "min": mn, "max": mx, "has_nulls": has_nulls,
                "dict_size": (
                    t.dicts[cd.col_id].size if cd.col_id in t.dicts else None
                ),
            }
        out[name] = {
            "generation": t.generation,
            "num_rows": t.num_rows,
            "columns": cols,
        }
    return out
