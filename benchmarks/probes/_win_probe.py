import sys, time, numpy as np
n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
t0 = time.time()
def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)
import jax
import heavydb_tpu as hdt
log(f"import done, n={n}")
db = hdt.connect()
rng = np.random.default_rng(0)
carriers = np.array(["AA","UA","DL","WN","B6","AS","NK","F9","HA","G4",
                     "OO","YX","MQ","9E","OH","YV","QX","EV","VX","US"])
cid = rng.integers(0, len(carriers), n).astype(np.int32)
cols = {
    "carrier": carriers[cid],
    "dep_ts": rng.integers(1, 1 << 26, n).astype(np.int32),
    "delay": rng.normal(10, 30, n).astype(np.float32),
}
log("gen done")
import heavydb_tpu.config as C
db.load_table("flights", cols, create=True)
log("load done")
q = ("SELECT carrier, MAX(rn) FROM (SELECT carrier, "
     "ROW_NUMBER() OVER (PARTITION BY carrier ORDER BY dep_ts) rn, "
     "SUM(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) rsum, "
     "LAG(delay) OVER (PARTITION BY carrier ORDER BY dep_ts) prev "
     "FROM flights) GROUP BY carrier ORDER BY carrier LIMIT 5")
t1 = time.time()
rows = db.sql(q).rows()
log(f"first window query: {time.time()-t1:.1f}s -> {rows[:2]}")
t2 = time.time()
rows = db.sql(q).rows()
log(f"warm: {time.time()-t2:.2f}s")
