"""Multi-host execution support.

The reference's enterprise aggregator/leaf cluster (SURVEY §2.6.3: Thrift
start_query/execute_query_step/broadcast_serialized_rows, heavy.thrift:
769-771) maps to a jax.distributed pod slice:

- every host runs the same engine process; `initialize()` joins the
  jax.distributed cluster (coordinator = the aggregator-role host);
- tables are row-partitioned across ALL devices of the global mesh (the
  generalization of fragments-per-GPU and leaf-table shards);
- per-step execution is the SAME jit'd compound kernel on every host
  (GSPMD SPMD programs), with XLA inserting ICI/DCN collectives for
  aggregate merges — replacing serialized ResultSets over Thrift;
- metadata consistency uses the generations snapshot idea (reference
  prepareLeafExecution, RelAlgExecutor.cpp:1324): `generations_snapshot`
  captures (table row counts, dictionary sizes, column ranges) before a
  distributed query so all hosts trace identical kernels.

Hardware note: this build environment exposes one chip; multi-host paths
are validated on the 8-device virtual CPU mesh (tests/test_distributed.py)
and the driver's dryrun_multichip hook.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join (or bootstrap) the multi-host cluster.  On single-host this is a
    no-op; on a pod slice call once per host before `connect()`."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def generations_snapshot(db) -> Dict[str, dict]:
    """Consistent metadata snapshot for distributed compilation (reference
    AggregatedColRange + StringDictionaryGenerations + TableGenerations)."""
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
