"""Device-level breakdown of the bench window query at 20M rows.

Patches executor._retry_remote_compile to sync (device_get a slice) and
time each window-stage dispatch; also times the downstream Compound by
differencing against the full query wall.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import jax.random as jrnd

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
    m = 20_000_000
    db = hdt.connect()
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
    for i in range(2):
        t0 = time.perf_counter()
        db.sql(qw)
        log(f"warm-unpatched{i}: {time.perf_counter()-t0:.2f}s")

    import heavydb_tpu.exec.window_kernel as WK
    EX._retry_remote_compile = timed
    WK_mod_patch = None
    for i in range(3):
        TIMES.clear()
        t0 = time.perf_counter()
        db.sql(qw)
        tot = time.perf_counter() - t0
        log(f"warm-patched{i}: total={tot:.2f}s sort={TIMES[0]:.3f}s "
            f"fns={TIMES[1]:.3f}s rest={tot-sum(TIMES[:2]):.3f}s "
            f"all_dispatches={[round(t,3) for t in TIMES]}")


if __name__ == "__main__":
    main()
