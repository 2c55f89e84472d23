"""Localize the ~940s flagship first-query wall at 100M rows: engine
debug-timer tree + direct H2D timing of the padded scan buffer.

  /opt/venv/bin/python -m benchmarks.firstq_debug [rows]
"""

import json
import sys
import time

import numpy as np


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    import jax

    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config
    import heavydb_tpu.exec.batch as B
    from heavydb_tpu import types as T

    db = hdt.connect(config=Config(enable_debug_timer=True))
    rng = np.random.default_rng(42)
    x = rng.integers(0, 1_000_000, rows, dtype=np.int32)
    y = rng.random(rows, dtype=np.float32)
    db.sql("CREATE TABLE t (x INT, y FLOAT) WITH (fragment_size=33554432)")
    db.catalog.get_table("t").insert_columns({1: x, 2: y})

    # direct H2D of the same padded buffer the scan would stage
    size = B.bucket(rows)
    t0 = time.time()
    xp = B.pad_to(x, size, T.integer(True))
    print(f"host pad: {time.time()-t0:.1f}s ({xp.nbytes/1e6:.0f}MB)",
          file=sys.stderr, flush=True)
    t0 = time.time()
    xd = jax.device_put(xp)
    xd.block_until_ready()
    print(f"device_put x: {time.time()-t0:.1f}s "
          f"({xp.nbytes/1e6/max(time.time()-t0,1e-9):.0f}MB/s)",
          file=sys.stderr, flush=True)
    del xd

    t0 = time.time()
    rs = db.sql("SELECT count(*), sum(y) FROM t WHERE x > 500000")
    print(f"first query: {time.time()-t0:.1f}s -> {rs.rows()}",
          file=sys.stderr, flush=True)
    print(json.dumps(db.last_query_timings, indent=1), file=sys.stderr,
          flush=True)
    t0 = time.time()
    db.sql("SELECT count(*), sum(y) FROM t WHERE x > 500001")
    print(f"second (new shape const) query: {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
