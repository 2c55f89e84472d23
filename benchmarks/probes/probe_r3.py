"""Round-3 probe: configs 2-3 hash-path queries with the round-3 tiers
(lane_agg / radix_hist) live, on the real chip.  Mirrors bench.py's
chain protocol without config 1/4/5."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import jax.random as jrnd
import numpy as np

import heavydb_tpu as hdt
from bench import chain_engine_kernel, log


def main():
    m = 20_000_000
    db = hdt.connect()
    rng = np.random.default_rng(42)
    t0 = time.time()
    ka, kb, kc = jrnd.split(jrnd.PRNGKey(7), 3)
    db.sql("CREATE TABLE g (k1 INT, k2 INT, v FLOAT) "
           "WITH (fragment_size=33554432)")
    db.load_table_device("g", {
        "k1": jrnd.randint(ka, (m,), 0, 1000, jnp.int32),
        "k2": jrnd.randint(kb, (m,), 0, 10_000_000, jnp.int32),
        "v": jrnd.uniform(kc, (m,), jnp.float32),
    })
    log(f"device load g {time.time()-t0:.1f}s")
    db.sql("CREATE TABLE dim (k1 INT, nm INT)")
    db.catalog.get_table("dim").insert_columns({
        1: np.arange(1000, dtype=np.int32),
        2: rng.integers(0, 50, 1000).astype(np.int32),
    })
    for label, q in [
        ("groupby_1k_perfect",
         "SELECT k1, count(*), sum(v) FROM g GROUP BY k1"),
        ("groupby_10m_sparse", "SELECT k2, count(*) FROM g GROUP BY k2"),
        ("join_groupby",
         "SELECT d.nm, count(*), sum(g.v) FROM g JOIN dim d "
         "ON g.k1 = d.k1 GROUP BY d.nm"),
    ]:
        try:
            per, first = chain_engine_kernel(db, q, m, label)
        except Exception as e:
            log(f"{label} failed: {e!r}")


if __name__ == "__main__":
    main()
