"""heavydb_tpu — a TPU-native vectorized SQL query-execution engine.

A ground-up rebuild of the capabilities of heavyai/heavydb (columnar SQL
analytics at device speed) designed for TPUs: query plans lower to JAX-traced,
XLA-compiled operator pipelines (the analogue of HeavyDB's LLVM-JIT'd
query_func/row_func, see reference QueryEngine/NativeCodegen.cpp), with
sort-based and Pallas hash kernels for group-by/join, and jax.sharding meshes
for multi-chip/multi-host execution (the analogue of the enterprise
aggregator/leaf cluster, reference Distributed/).

Public API:
    db = heavydb_tpu.connect()          # in-process engine (ref: Embedded/DBEngine.h)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    rs = db.sql("SELECT count(*) FROM t")
    rs.to_pandas() / rs.rows() / rs.column(0)
"""

from heavydb_tpu.api import Database, connect
from heavydb_tpu.version import __version__

__all__ = ["connect", "Database", "__version__"]
