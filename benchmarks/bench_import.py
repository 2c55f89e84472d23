"""Import / egress throughput harness — the reference ships
Benchmarks/run_benchmark_import.py (COPY FROM a CSV, report import time)
and run_benchmark_arrow.py (Arrow egress).  Same protocol here:

  1. generate a CSV (mixed int/float/text columns),
  2. COPY FROM it (native multithreaded C++ parser → columnar load),
  3. SELECT-to-Arrow egress of the full table,
  4. COPY TO (CSV export).

Usage: /opt/venv/bin/python benchmarks/bench_import.py [rows]
Prints one JSON line with rows/s + bytes/s per stage.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    if "--cpu" in sys.argv:
        # parser/host-path measurement isolated from the device relay
        # (on the axon dev relay H2D runs 13-30MB/s and dominates)
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    import heavydb_tpu as hdt

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    rng = np.random.default_rng(7)
    carriers = np.array(["AA", "UA", "DL", "WN", "B6", "AS", "NK", "F9"])

    out = {"metric": "import_export_throughput", "rows": n, "sub": {}}
    with tempfile.TemporaryDirectory() as td:
        csv = os.path.join(td, "data.csv")
        t0 = time.perf_counter()
        cols = (
            rng.integers(0, 1_000_000, n),
            rng.random(n).round(6),
            carriers[rng.integers(0, len(carriers), n)],
            rng.integers(0, 10_000, n),
        )
        with open(csv, "w") as f:
            f.write("a,b,s,c\n")
            np.savetxt(f, np.column_stack([c.astype(str) for c in cols]),
                       fmt="%s", delimiter=",")
        gen_s = time.perf_counter() - t0
        size = os.path.getsize(csv)
        print(f"csv generated: {n:,} rows, {size/1e6:.0f}MB in {gen_s:.1f}s",
              file=sys.stderr)

        db = hdt.connect()
        db.sql("CREATE TABLE imp (a INT, b DOUBLE, s TEXT, c INT)")
        t0 = time.perf_counter()
        db.sql(f"COPY imp FROM '{csv}' WITH (header='true')")
        imp_s = time.perf_counter() - t0
        assert db.sql("SELECT count(*) FROM imp").scalar() == n
        out["sub"]["import_rows_per_s"] = round(n / imp_s)
        out["sub"]["import_mb_per_s"] = round(size / 1e6 / imp_s, 1)
        print(f"COPY FROM: {imp_s:.2f}s = {n/imp_s/1e6:.2f}M rows/s",
              file=sys.stderr)

        t0 = time.perf_counter()
        tbl = db.sql("SELECT * FROM imp").to_arrow()
        arrow_s = time.perf_counter() - t0
        out["sub"]["arrow_egress_rows_per_s"] = round(n / arrow_s)
        out["sub"]["arrow_egress_mb_per_s"] = round(
            tbl.nbytes / 1e6 / arrow_s, 1)
        print(f"Arrow egress: {arrow_s:.2f}s = {n/arrow_s/1e6:.2f}M rows/s",
              file=sys.stderr)

        exp = os.path.join(td, "out.csv")
        t0 = time.perf_counter()
        db.sql(f"COPY (SELECT * FROM imp) TO '{exp}'")
        exp_s = time.perf_counter() - t0
        out["sub"]["export_rows_per_s"] = round(n / exp_s)
        print(f"COPY TO: {exp_s:.2f}s = {n/exp_s/1e6:.2f}M rows/s",
              file=sys.stderr)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
