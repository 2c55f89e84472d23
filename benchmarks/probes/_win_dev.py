import sys; sys.path.insert(0, "/root/repo")
import sys, time
n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp
import heavydb_tpu as hdt
log(f"import done n={n}")
db = hdt.connect()
k = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(k, 3)
carriers = ["AA","UA","DL","WN","B6","AS","NK","F9","HA","G4",
            "OO","YX","MQ","9E","OH","YV","QX","EV","VX","US"]
db.load_table_device("flights", {
    "carrier": jax.random.randint(k1, (n,), 0, len(carriers), jnp.int32),
    "dep_ts": jax.random.randint(k2, (n,), 1, 1 << 26, jnp.int32),
    "delay": 10.0 + 30.0 * jax.random.normal(k3, (n,), jnp.float32),
}, create=True, dicts={"carrier": carriers})
log("device load done")
q = ("SELECT carrier, MAX(rn) FROM (SELECT carrier, "
     "ROW_NUMBER() OVER (PARTITION BY carrier ORDER BY dep_ts) rn, "
     "SUM(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) rsum, "
     "LAG(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) prev "
     "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5")
t1 = time.time()
rows = db.sql(q).rows()
log(f"first window query (incl compile): {time.time()-t1:.1f}s -> {rows[:2]}")
for i in range(3):
    t2 = time.time()
    rows = db.sql(q).rows()
    log(f"warm {i}: {time.time()-t2:.2f}s")
