"""Flights benchmark suite — the reference's headline workload
(Benchmarks/queries/flights/Q001-Q017, run by Benchmarks/run_benchmark.py).
Query texts are reproduced 1:1 (##TAB## substitution included); the dataset
is synthesized with the same columns/cardinalities since the real flights
data isn't in the repo.

Usage:
    /opt/venv/bin/python -m benchmarks.flights --rows 10000000 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

CARRIERS = [
    "American Airlines", "United Air Lines", "Delta Air Lines",
    "Southwest Airlines", "US Airways", "Northwest Airlines",
    "Continental Air Lines", "Alaska Airlines", "JetBlue Airways",
    "SkyWest Airlines",
]
AIRPORTS = [
    "Lambert-St Louis International", "Lincoln Municipal",
    "Los Angeles International", "Chicago O'Hare International",
    "Dallas-Fort Worth International", "Hartsfield-Jackson Atlanta",
    "Denver International", "San Francisco International",
    "Phoenix Sky Harbor", "Seattle-Tacoma International",
    "Minneapolis-St Paul", "Boston Logan International",
    "Newark Liberty", "George Bush Intercontinental",
    "Detroit Metro Wayne County", "Orlando International",
] + [f"Airport {i}" for i in range(200)]

# Reference query texts (Benchmarks/queries/flights/Q001..Q017; Q009/Q010
# are disabled in the reference; geo queries omitted — no geo types yet).
QUERIES = {
    "Q001": "select count(*) from ##TAB##",
    "Q002": "select carrier_name, count(*) from ##TAB## group by carrier_name",
    "Q003": "select carrier_name, avg(arrdelay) from ##TAB## "
            "group by carrier_name",
    "Q004": "select origin_name, dest_name, avg(arrdelay) from ##TAB## "
            "group by origin_name, dest_name",
    "Q005": "select date_trunc(month, dep_timestamp) as ym, avg(arrdelay) "
            "as del from ##TAB## group by ym",
    "Q006": "select dest_name, extract(month from dep_timestamp) as m, "
            "extract(year from dep_timestamp) as y, avg(arrdelay) as del "
            "from ##TAB## group by dest_name, y, m",
    "Q007": "select count(*) from ##TAB## where origin_name = "
            "'Lambert-St Louis International'",
    "Q008": "select count(*) from ##TAB## where origin_name = "
            "'Lambert-St Louis International' and dest_name = "
            "'Lincoln Municipal'",
    "Q011": "select uniquecarrier, flightnum, dep_timestamp, dest_lat from "
            "##TAB## where origin_name = 'Lambert-St Louis International' "
            "and flightnum = 586 limit 5000",
    "Q012": "SELECT ##TAB##.carrier_name as key0, AVG(##TAB##.depdelay) AS x, "
            "AVG(##TAB##.arrdelay) AS y, COUNT(*) AS size FROM ##TAB## WHERE "
            "((##TAB##.dep_timestamp >= TIMESTAMP(0) '1996-07-26 16:30:06' AND "
            "##TAB##.dep_timestamp < TIMESTAMP(0) '1997-05-16 16:30:06')) "
            "GROUP BY key0 ORDER BY size DESC LIMIT 50",
    "Q013": "SELECT COUNT(*) as val FROM ##TAB## WHERE ((##TAB##.dep_timestamp "
            ">= TIMESTAMP(0) '1996-07-28 00:00:00' AND ##TAB##.dep_timestamp "
            "< TIMESTAMP(0) '1997-05-18 00:00:00'))",
}


def make_table(db, n_rows: int, fragment_rows: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    carrier_ids = rng.integers(0, len(CARRIERS), n_rows)
    origin_ids = rng.integers(0, len(AIRPORTS), n_rows)
    dest_ids = rng.integers(0, len(AIRPORTS), n_rows)
    base = int(np.datetime64("1996-01-01T00:00:00").astype("datetime64[s]").astype(np.int64))
    span = 2 * 365 * 86400
    dep_ts = base + rng.integers(0, span, n_rows)
    data = {
        "carrier_name": np.array(CARRIERS, object)[carrier_ids],
        "uniquecarrier": np.array(
            [c.split()[0][:2].upper() for c in CARRIERS], object
        )[carrier_ids],
        "origin_name": np.array(AIRPORTS, object)[origin_ids],
        "dest_name": np.array(AIRPORTS, object)[dest_ids],
        "flightnum": rng.integers(1, 8000, n_rows).astype(np.int32),
        "depdelay": np.where(
            rng.random(n_rows) < 0.02, np.nan, rng.normal(8, 25, n_rows)
        ),
        "arrdelay": np.where(
            rng.random(n_rows) < 0.02, np.nan, rng.normal(6, 28, n_rows)
        ),
        "dest_lat": rng.uniform(25, 49, n_rows).astype(np.float32),
        "dep_timestamp": dep_ts,
    }
    db.sql(
        "CREATE TABLE flights (carrier_name TEXT, uniquecarrier TEXT, "
        "origin_name TEXT, dest_name TEXT, flightnum INT, depdelay DOUBLE, "
        "arrdelay DOUBLE, dest_lat FLOAT, dep_timestamp TIMESTAMP) "
        f"WITH (fragment_size={fragment_rows})"
    )
    db.load_table("flights", data)


def run(db, n_rows: int, iters: int = 3, out=sys.stderr):
    results = {}
    for name, q in QUERIES.items():
        sql = q.replace("##TAB##", "flights")
        try:
            t0 = time.time()
            db.sql(sql)
            first = time.time() - t0
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
                "first_s": first,
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
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fragment", type=int, default=32_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import heavydb_tpu as hdt

    db = hdt.connect()
    print(f"backend={jax.default_backend()} rows={args.rows:,}", file=sys.stderr)
    t0 = time.time()
    make_table(db, args.rows, args.fragment)
    print(f"table built in {time.time()-t0:.1f}s", file=sys.stderr)
    results = run(db, args.rows, args.iters)
    print(json.dumps({"suite": "flights", "rows": args.rows,
                      "results": results}))


if __name__ == "__main__":
    main()
