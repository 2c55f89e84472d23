"""Where does the first query's ~1s go? (fresh process, warm disk caches)

Patches _ArtifactKernel to time deserialize vs compile vs execute, and
prints the query timer tree.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import heavydb_tpu as hdt
from heavydb_tpu.exec import executor as EX


def log(*a):
    print(*a, file=sys.stderr, flush=True)


EVENTS = []

orig_try_load = EX._ArtifactKernel._try_load
orig_call = EX._ArtifactKernel.__call__


def timed_try_load(self, path):
    t0 = time.perf_counter()
    from jax import export as jexport
    import os

    if not os.path.exists(path):
        EVENTS.append(("artifact-MISS", 0.0))
        return None
    with open(path, "rb") as f:
        blob = f.read()
    t1 = time.perf_counter()
    try:
        exp = jexport.deserialize(bytearray(blob))
    except Exception:
        EVENTS.append(("artifact-deser-FAIL", time.perf_counter() - t0))
        return None
    t2 = time.perf_counter()
    fn = jax.jit(exp.call)
    self._exported = True
    EVENTS.append(("artifact-load", t2 - t0))
    return fn


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "join"
    EX._ArtifactKernel._try_load = timed_try_load
    m = 20_000_000
    t0 = time.perf_counter()
    db = hdt.connect()
    log(f"connect: {time.perf_counter()-t0:.2f}s")
    import numpy as np
    import jax.random as jrnd

    ka, kb, kc = jrnd.split(jrnd.PRNGKey(7), 3)
    t0 = time.perf_counter()
    db.sql("CREATE TABLE g (k1 INT, k2 INT, v FLOAT) "
           "WITH (fragment_size=33554432)")
    db.load_table_device("g", {
        "k1": jrnd.randint(ka, (m,), 0, 1000, jnp.int32),
        "k2": jrnd.randint(kb, (m,), 0, 10_000_000, jnp.int32),
        "v": jrnd.uniform(kc, (m,), jnp.float32),
    })
    rng = np.random.default_rng(0)
    db.sql("CREATE TABLE dim (k1 INT, nm INT)")
    db.catalog.get_table("dim").insert_columns({
        1: np.arange(1000, dtype=np.int32),
        2: rng.integers(0, 50, 1000).astype(np.int32),
    })
    log(f"load: {time.perf_counter()-t0:.2f}s")
    db.config.enable_debug_timer = True
    q = {
        "join": "SELECT d.nm, count(*), sum(g.v) FROM g JOIN dim d "
                "ON g.k1 = d.k1 GROUP BY d.nm",
        "groupby": "SELECT k1, count(*), sum(v) FROM g GROUP BY k1",
        "window": "SELECT k1, v, sum(v) OVER (PARTITION BY k1 ORDER BY "
                  "k2), row_number() OVER (PARTITION BY k1 ORDER BY k2) "
                  "FROM g LIMIT 5",
        "sparse": "SELECT k2, count(*) FROM g GROUP BY k2",
    }[which]
    t0 = time.perf_counter()
    db.sql(q)
    log(f"FIRST {which}: {time.perf_counter()-t0:.2f}s")
    for ev, dt in EVENTS:
        log(f"  {ev}: {dt:.3f}s")
    log(json.dumps(db.last_query_timings))
    t0 = time.perf_counter()
    db.sql(q)
    log(f"warm: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
