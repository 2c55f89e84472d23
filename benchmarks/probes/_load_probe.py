import time, numpy as np
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import jax
import heavydb_tpu as hdt
import heavydb_tpu.api as API
log("import done")

db = hdt.connect()
n = 20_000_000
rng = np.random.default_rng(0)
carriers = np.array(["AA","UA","DL","WN","B6","AS","NK","F9","HA","G4"])
cols = {
    "carrier": carriers[rng.integers(0, 10, n)],
    "dep_ts": rng.integers(1, 1 << 26, n).astype(np.int32),
    "delay": rng.normal(10, 30, n).astype(np.float32),
}
log("gen done")

import heavydb_tpu.exec.executor as EX
orig_prestage = EX.Executor.prestage_table if hasattr(EX, 'Executor') else None
# time sub-stages by monkeypatching
import heavydb_tpu.storage.table as TBL
orig_ins = TBL.Table.insert_columns
def timed_ins(self, *a, **k):
    t = time.time(); r = orig_ins(self, *a, **k); log(f"  insert_columns: {time.time()-t:.1f}s"); return r
TBL.Table.insert_columns = timed_ins

t1 = time.time()
db.load_table("flights", cols, create=True)
log(f"load_table total: {time.time()-t1:.1f}s")
t1 = time.time()
r = db.sql("SELECT count(*) FROM flights")
log(f"count query: {time.time()-t1:.1f}s -> {r.rows()}")
