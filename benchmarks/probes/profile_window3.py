"""Stage-level breakdown of the 100M 3-fn window (the _win_dev query)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import heavydb_tpu as hdt
from heavydb_tpu.exec import executor as EX


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    if hasattr(x, "shape"):
        jax.device_get(x.ravel()[:1] if getattr(x, "ndim", 0) else x)
    elif isinstance(x, (tuple, list)):
        for y in x:
            _sync(y)


orig = EX._retry_remote_compile
TIMES = []


def timed(fn, *args, **kw):
    t0 = time.perf_counter()
    out = orig(fn, *args, **kw)
    _sync(out)
    TIMES.append(time.perf_counter() - t0)
    return out


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
    q = ("SELECT carrier, MAX(rn) FROM (SELECT carrier, "
         "ROW_NUMBER() OVER (PARTITION BY carrier ORDER BY dep_ts) rn, "
         "SUM(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) rsum, "
         "LAG(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) prev "
         "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5")
    t0 = time.perf_counter()
    db.sql(q)
    log(f"first: {time.perf_counter()-t0:.1f}s")
    for i in range(2):
        t0 = time.perf_counter()
        db.sql(q)
        log(f"warm{i}: {time.perf_counter()-t0:.2f}s")
    db.config.enable_debug_timer = True
    EX._retry_remote_compile = timed
    for i in range(3):
        TIMES.clear()
        t0 = time.perf_counter()
        db.sql(q)
        tot = time.perf_counter() - t0
        log(f"patched{i}: total={tot:.2f}s "
            f"dispatches={[round(t,3) for t in TIMES]} "
            f"rest={tot-sum(TIMES):.3f}s")
    import json
    log(json.dumps(db.last_query_timings, indent=1))


if __name__ == "__main__":
    main()


def timed_main2():
    pass
