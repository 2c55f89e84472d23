"""Join benchmark — BASELINE.json config 3: two-table PK-FK hash join +
post-join aggregate (TPC-H Q3-style), plus the config-4 top-k shape.

Usage:
    /opt/venv/bin/python -m benchmarks.join_bench --rows 20000000 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

QUERIES = {
    # TPC-H Q3 shape: selective dim filter, FK join, grouped agg, top-k
    "J3": (
        "SELECT o.k, SUM(l.price * (1 - l.disc)) rev "
        "FROM lineitem l JOIN orders o ON l.okey = o.okey "
        "WHERE o.seg = 3 AND l.ship > 500 "
        "GROUP BY o.k ORDER BY rev DESC LIMIT 10"
    ),
    "PKFK_AGG": (
        "SELECT o.k, COUNT(*), SUM(l.price) FROM lineitem l "
        "JOIN orders o ON l.okey = o.okey GROUP BY o.k"
    ),
    "SEMI": (
        "SELECT COUNT(*) FROM lineitem WHERE okey IN "
        "(SELECT okey FROM orders WHERE seg = 1)"
    ),
    "TOPK": "SELECT okey, price FROM lineitem ORDER BY price DESC LIMIT 100",
}


def make_tables(db, n_rows: int, n_orders: int, seed: int = 13):
    rng = np.random.default_rng(seed)
    db.sql(
        "CREATE TABLE orders (okey BIGINT, k INT, seg INT) "
        "WITH (fragment_size=33554432)"
    )
    db.catalog.get_table("orders").insert_columns({
        1: np.arange(n_orders, dtype=np.int64),
        2: rng.integers(0, 100, n_orders).astype(np.int32),
        3: rng.integers(0, 5, n_orders).astype(np.int32),
    })
    db.sql(
        "CREATE TABLE lineitem (okey BIGINT, price DOUBLE, disc DOUBLE, "
        "ship INT) WITH (fragment_size=33554432)"
    )
    db.catalog.get_table("lineitem").insert_columns({
        1: rng.integers(0, n_orders, n_rows),
        2: rng.uniform(1, 1000, n_rows),
        3: rng.uniform(0, 0.1, n_rows),
        4: rng.integers(0, 1000, n_rows).astype(np.int32),
    })


def run(db, n_rows: int, iters: int = 3, out=sys.stderr):
    import jax

    results = {}
    for name, q in QUERIES.items():
        try:
            t0 = time.time()
            db.sql(q)
            first = time.time() - t0
            times = []
            for _ in range(iters):
                t0 = time.time()
                b, _ = db.sql_device(q)
                jax.block_until_ready(b.cols)
                times.append(time.time() - t0)
            best = min(times)
            results[name] = {
                "min_ms": 1e3 * best, "first_s": first,
                "rows_per_s": n_rows / best,
            }
            print(f"{name}: min {1e3*best:8.1f}ms "
                  f"({n_rows/best/1e9:6.2f}G rows/s) first {first:5.1f}s",
                  file=out, flush=True)
        except Exception as e:
            results[name] = {"error": repr(e)}
            print(f"{name}: ERROR {e!r}", file=out, flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--orders", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import heavydb_tpu as hdt

    db = hdt.connect()
    print(f"backend={jax.default_backend()} rows={args.rows:,}",
          file=sys.stderr)
    t0 = time.time()
    make_tables(db, args.rows, args.orders)
    print(f"tables built in {time.time()-t0:.1f}s", file=sys.stderr)
    results = run(db, args.rows, args.iters)
    print(json.dumps({"suite": "join", "rows": args.rows,
                      "results": results}))


if __name__ == "__main__":
    main()
