"""Profile the bench window query at 20M rows: where does the 1.02s go?"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import jax.random as jrnd

import heavydb_tpu as hdt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    m = 20_000_000
    db = hdt.connect()
    db.config.enable_debug_timer = True
    ka, kb, kc = jrnd.split(jrnd.PRNGKey(7), 3)
    db.sql("CREATE TABLE g (k1 INT, k2 INT, v FLOAT) "
           "WITH (fragment_size=33554432)")
    db.load_table_device("g", {
        "k1": jrnd.randint(ka, (m,), 0, 1000, jnp.int32),
        "k2": jrnd.randint(kb, (m,), 0, 10_000_000, jnp.int32),
        "v": jrnd.uniform(kc, (m,), jnp.float32),
    })
    qw = ("SELECT k1, v, sum(v) OVER (PARTITION BY k1 ORDER BY k2), "
          "row_number() OVER (PARTITION BY k1 ORDER BY k2) "
          "FROM g LIMIT 5")
    t0 = time.perf_counter()
    db.sql(qw)
    log(f"first: {time.perf_counter()-t0:.2f}s")
    for i in range(3):
        t0 = time.perf_counter()
        db.sql(qw)
        log(f"warm{i}: {time.perf_counter()-t0:.2f}s")
    log(json.dumps(db.last_query_timings, indent=1))


if __name__ == "__main__":
    main()
