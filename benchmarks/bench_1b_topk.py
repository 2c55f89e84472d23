"""BASELINE config 4 at full scale: ORDER BY … LIMIT (top-k) over 1B rows
through the engine (radix-select path), plus a 1B-row filtered aggregate.
8.6GB of padded device columns — exercises the HBM-scale path on one chip.

  /opt/venv/bin/python -m benchmarks.bench_1b_topk [rows]
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
    import heavydb_tpu as hdt

    db = hdt.connect()
    rng = np.random.default_rng(9)
    t0 = time.time()
    k = rng.integers(0, 1 << 30, rows, dtype=np.int32)
    v = rng.random(rows, dtype=np.float32)
    log(f"datagen {time.time()-t0:.0f}s ({rows:,} rows)")
    t0 = time.time()
    db.sql("CREATE TABLE b (k INT, v FLOAT) WITH (fragment_size=33554432)")
    db.catalog.get_table("b").insert_columns({1: k, 2: v})
    log(f"load {time.time()-t0:.0f}s")

    out = {}
    q = "SELECT k, v FROM b ORDER BY v DESC LIMIT 100"
    t0 = time.time()
    r = db.sql(q)
    first = time.time() - t0
    top = r.rows()[0]
    log(f"topk first {first:.1f}s; top row {top}")
    t0 = time.time()
    db.sql(q).rows()
    warm = time.time() - t0
    log(f"topk warm e2e {warm:.2f}s")
    out["topk_1b_first_s"] = round(first, 1)
    out["topk_1b_warm_s"] = round(warm, 2)

    q2 = "SELECT count(*), sum(v), max(v) FROM b WHERE k < 500000000"
    t0 = time.time()
    r2 = db.sql(q2).rows()
    first2 = time.time() - t0
    t0 = time.time()
    db.sql(q2).rows()
    warm2 = time.time() - t0
    log(f"scan-agg 1B: first {first2:.1f}s warm {warm2:.2f}s -> {r2}")
    out["scanagg_1b_first_s"] = round(first2, 1)
    out["scanagg_1b_warm_s"] = round(warm2, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
