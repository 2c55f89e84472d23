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

    def allgather_multi(
        self, arrays: List[np.ndarray]
    ) -> List[List[np.ndarray]]:
        """ONE padded byte exchange for a LIST of 1-D arrays (per-host
        lengths may differ; array count and dtypes must match across
        hosts).  Returns, per array, the per-host pieces.

        Two collectives total regardless of column count — the previous
        per-column exchange cost 2 collectives PER ARRAY, and every
        distinct padded length jitted a fresh Gloo program; the payload
        here is pow2-bucketed so repeated queries reuse one compiled
        collective per size class."""
        from jax.experimental import multihost_utils as mhu

        k = len(arrays)
        arrs = [np.ascontiguousarray(a) for a in arrays]
        lens = np.array([a.shape[0] for a in arrs], np.int64)
        blob = b"".join(a.tobytes() for a in arrs)
        nb = len(blob)
        meta = np.concatenate([lens, np.array([nb], np.int64)])
        metas = np.asarray(mhu.process_allgather(meta)).reshape(
            self.num_processes, k + 1
        )
        cap = 1 << max(int(metas[:, -1].max()).bit_length(), 4)
        pad = np.zeros((cap,), np.uint8)
        pad[:nb] = np.frombuffer(blob, np.uint8)
        g = np.asarray(mhu.process_allgather(pad)).reshape(
            self.num_processes, cap
        )
        out: List[List[np.ndarray]] = [[] for _ in range(k)]
        for p in range(self.num_processes):
            off = 0
            buf = g[p]
            for i, a in enumerate(arrs):
                n = int(metas[p, i])
                nbytes = n * a.dtype.itemsize
                piece = np.frombuffer(
                    buf[off:off + nbytes].tobytes(), a.dtype
                )
                out[i].append(piece)
                off += nbytes
        return out

    def allgather_array(self, a: np.ndarray) -> List[np.ndarray]:
        """Gather a variable-length 1-D array from every host (padded
        exchange; trimmed per-host on receipt)."""
        return self.allgather_multi([np.ascontiguousarray(a)])[0]

    def allgather_concat(self, arrays: List[np.ndarray]) -> List[np.ndarray]:
        """Gather several columns from every host (ONE exchange) and
        return the concatenation over hosts for each column."""
        if not arrays:
            return []
        per = self.allgather_multi(
            [np.ascontiguousarray(a) for a in arrays]
        )
        return [np.concatenate(parts) for parts in per]

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
        the next distributed step).  Emulated with ONE batched allgather
        + local filter: the Gloo CPU backend has no all-to-all, so
        traffic is allgather-shaped, but memory/compute partition
        correctly — swap for a real ragged all-to-all on ICI/DCN pods.
        Rows are pre-sorted by destination so the local filter is one
        contiguous slice per sending host."""
        d = np.asarray(dest, np.int32)
        order = np.argsort(d, kind="stable")
        payload = [np.ascontiguousarray(np.asarray(c)[order])
                   for c in cols]
        # per-dest row counts ride the meta vector as one extra array
        counts = np.bincount(d, minlength=self.num_processes).astype(
            np.int64
        )
        per = self.allgather_multi(payload + [counts])
        all_counts = per[-1]  # per host: rows bound for each dest
        out = []
        for parts in per[:-1]:
            mine = []
            for p, piece in enumerate(parts):
                starts = np.concatenate(
                    [[0], np.cumsum(all_counts[p])]
                )
                lo = int(starts[self.process_id])
                hi = int(starts[self.process_id + 1])
                mine.append(piece[lo:hi])
            out.append(np.concatenate(mine))
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
