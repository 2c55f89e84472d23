"""Engine-path GROUP BY MAX(i64) at 134M rows — why 1.8s vs 21ms raw?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import heavydb_tpu as hdt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = 1 << 27
    db = hdt.connect()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    db.load_table_device("t", {
        "k": jax.random.randint(k1, (n,), 0, 20, jnp.int32),
        "rn": jax.random.randint(k2, (n,), 0, 10_000_000, jnp.int64),
        "rn32": jax.random.randint(k2, (n,), 0, 10_000_000, jnp.int32),
    }, create=True)
    for label, q in [
        ("max_i64", "SELECT k, MAX(rn) FROM t GROUP BY k"),
        ("max_i32", "SELECT k, MAX(rn32) FROM t GROUP BY k"),
        ("count", "SELECT k, COUNT(*) FROM t GROUP BY k"),
        ("sum_i64", "SELECT k, SUM(rn) FROM t GROUP BY k"),
    ]:
        db.sql(q)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            db.sql(q).rows()
            ts.append(time.perf_counter() - t0)
        log(f"{label:10s} warm={min(ts):.3f}s")


if __name__ == "__main__":
    main()
