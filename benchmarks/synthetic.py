"""Synthetic benchmark suite — replicates the reference's
Benchmarks/synthetic_benchmark (create_table.py:120-149 column schema and
the PerfectHashSingleCol / PerfectHashMultiCol / BaselineHash /
NonGroupedAgg / Sort / MultiStep query families) on the TPU engine.

Usage:
    /opt/venv/bin/python -m benchmarks.synthetic --rows 10000000 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Column schema from the reference generator: uniform INT columns with the
# named cardinality, plus sparse BIGINT columns with step 10k.
UNIFORM_COLS = [
    ("x10", 10), ("y10", 10), ("z10", 10),
    ("x100", 100), ("y100", 100), ("z100", 100),
    ("x1k", 1000), ("x10k", 10_000), ("x100k", 100_000),
    ("x1m", 1_000_000), ("x10m", 10_000_000),
]
SPARSE_COLS = [
    ("x10k_s10k", 10_000, 10_000),
    ("x100k_s10k", 100_000, 10_000),
    ("x1m_s10k", 1_000_000, 10_000),
]

QUERIES = {
    # PerfectHashSingleCol (reference PHS001)
    "PHS001": "SELECT CAST(x10 AS DOUBLE) key0, COUNT(y10), SUM(y10), "
              "MAX(y10), MIN(y10), AVG(y10) FROM ##TAB## GROUP BY key0",
    "PHS002": "SELECT x1k, COUNT(*), SUM(y10) FROM ##TAB## GROUP BY x1k",
    "PHS003": "SELECT x100k, COUNT(*) FROM ##TAB## GROUP BY x100k",
    # PerfectHashMultiCol
    "PHM001": "SELECT x10, y10, COUNT(*), AVG(x100) FROM ##TAB## "
              "GROUP BY x10, y10",
    "PHM002": "SELECT x100, y100, COUNT(*) FROM ##TAB## GROUP BY x100, y100",
    # BaselineHash (reference BH001: group by cast + sparse keys)
    "BH001": "SELECT CAST(x10 AS DOUBLE) key0, COUNT(y10), SUM(y10), "
             "MAX(y10), MIN(y10), AVG(y10) FROM ##TAB## GROUP BY key0",
    "BH002": "SELECT x10k_s10k, COUNT(*) FROM ##TAB## GROUP BY x10k_s10k",
    "BH003": "SELECT x1m_s10k, COUNT(*), SUM(y100) FROM ##TAB## "
             "GROUP BY x1m_s10k",
    "BH004": "SELECT x10m, COUNT(*) FROM ##TAB## GROUP BY x10m",
    # NonGroupedAgg (reference NGA01)
    "NGA01": "SELECT COUNT(*) FROM ##TAB##",
    "NGA02": "SELECT SUM(x1k), MIN(x10k), MAX(x100k), AVG(x1m) FROM ##TAB##",
    "NGA03": "SELECT COUNT(*) FROM ##TAB## WHERE x100 > 50 AND y100 <= 75",
    # Sort
    "SORT01": "SELECT x1m, y10 FROM ##TAB## ORDER BY x1m DESC LIMIT 100",
    "SORT02": "SELECT x10k, COUNT(*) c FROM ##TAB## GROUP BY x10k "
              "ORDER BY c DESC LIMIT 10",
    # ApproxMedian
    "AM01": "SELECT APPROX_MEDIAN(x1k) FROM ##TAB##",
    # MultiStep
    "MS01": "SELECT key0, COUNT(*) FROM (SELECT x10 key0, y10 FROM ##TAB## "
            "WHERE x100 > 10) q GROUP BY key0",
}


def make_table(db, n_rows: int, fragment_rows: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    cols = {}
    for name, card in UNIFORM_COLS:
        cols[name] = rng.integers(1, card + 1, n_rows, dtype=np.int32)
    for name, card, step in SPARSE_COLS:
        cols[name] = (
            rng.integers(1, card + 1, n_rows, dtype=np.int64) * step
        )
    col_defs = ", ".join(
        [f"{c} INT" for c, _ in UNIFORM_COLS]
        + [f"{c} BIGINT" for c, _, _ in SPARSE_COLS]
    )
    db.sql(
        f"CREATE TABLE bench ({col_defs}) WITH (fragment_size={fragment_rows})"
    )
    t = db.catalog.get_table("bench")
    t.insert_columns(
        {cd.col_id: cols[cd.name] for cd in t.columns}
    )
    return t


def run(db, n_rows: int, iters: int = 3, out=sys.stderr):
    results = {}
    for name, q in QUERIES.items():
        sql = q.replace("##TAB##", "bench")
        try:
            t0 = time.time()
            db.sql(sql)
            compile_s = time.time() - t0
            times = []
            for _ in range(iters):
                t0 = time.time()
                db.sql(sql)
                times.append(time.time() - t0)
            best = min(times)
            results[name] = {
                "avg_ms": 1e3 * sum(times) / len(times),
                "min_ms": 1e3 * best,
                "max_ms": 1e3 * max(times),
                "first_s": compile_s,
                "rows_per_s": n_rows / best,
            }
            print(
                f"{name}: min {1e3*best:8.1f}ms  "
                f"({n_rows/best/1e9:6.2f}G rows/s)  first {compile_s:5.1f}s",
                file=out, flush=True,
            )
        except Exception as e:
            results[name] = {"error": repr(e)}
            print(f"{name}: ERROR {e!r}", file=out, flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fragment", type=int, default=32_000_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config

    cfg = Config(num_shards=args.shards) if args.shards else Config()
    db = hdt.connect(config=cfg)
    print(f"backend={jax.default_backend()} rows={args.rows:,}",
          file=sys.stderr)
    t0 = time.time()
    make_table(db, args.rows, args.fragment)
    print(f"table built in {time.time()-t0:.1f}s", file=sys.stderr)
    results = run(db, args.rows, args.iters)
    print(json.dumps({"suite": "synthetic", "rows": args.rows,
                      "results": results}))


if __name__ == "__main__":
    main()
