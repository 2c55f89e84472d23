"""Bisect the 1.8s post-window cost at 100M rows."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import heavydb_tpu as hdt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    db = hdt.connect()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    carriers = ["AA", "UA", "DL", "WN", "B6", "AS", "NK", "F9", "HA", "G4",
                "OO", "YX", "MQ", "9E", "OH", "YV", "QX", "EV", "VX", "US"]
    db.load_table_device("flights", {
        "carrier": jax.random.randint(k1, (n,), 0, len(carriers), jnp.int32),
        "dep_ts": jax.random.randint(k2, (n,), 1, 1 << 26, jnp.int32),
        "delay": 10.0 + 30.0 * jax.random.normal(k3, (n,), jnp.float32),
    }, create=True, dicts={"carrier": carriers})
    WIN = ("ROW_NUMBER() OVER (PARTITION BY carrier ORDER BY dep_ts) rn, "
           "SUM(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) rsum, "
           "LAG(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) prev ")
    for label, q in [
        ("full", "SELECT carrier, MAX(rn) FROM (SELECT carrier, " + WIN +
         "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5"),
        ("rn_only", "SELECT carrier, MAX(rn) FROM (SELECT carrier, "
         "ROW_NUMBER() OVER (PARTITION BY carrier ORDER BY dep_ts) rn "
         "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5"),
        ("no_outer", "SELECT carrier, " + WIN +
         "FROM flights LIMIT 5"),
        ("count_outer", "SELECT carrier, COUNT(*) FROM (SELECT carrier, "
         + WIN + "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5"),
        ("rsum_outer", "SELECT carrier, MAX(rsum) FROM (SELECT carrier, "
         + WIN + "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5"),
    ]:
        try:
            db.sql(q)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                db.sql(q)
                ts.append(time.perf_counter() - t0)
            log(f"{label:14s} warm={min(ts):.2f}s")
        except Exception as e:
            log(f"{label:14s} ERROR {e!r}")


if __name__ == "__main__":
    main()
