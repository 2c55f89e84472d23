"""Reference taxis (MQ01-MQ06) and logs (Q01-Q07) benchmark suites run
VERBATIM against the engine (Benchmarks/queries/{taxis,logs}) — incl. the
rowid pseudo-column and SAMPLE_RATIO() deterministic sampling that MQ05/
MQ06 exercise."""

import os

import numpy as np
import pytest

import heavydb_tpu as hdt

TAXI_DIR = "/root/reference/Benchmarks/queries/taxis"
LOGS_DIR = "/root/reference/Benchmarks/queries/logs"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(TAXI_DIR) and os.path.isdir(LOGS_DIR)),
    reason="reference benchmark queries absent",
)

N = 40_000
T0 = np.datetime64("2015-01-01 00:00:00")


def _q(d, name, tab):
    with open(os.path.join(d, name)) as f:
        return f.read().replace("##TAB##", tab).strip().rstrip(";")


@pytest.fixture(scope="module")
def tdb():
    rng = np.random.default_rng(31)
    cab = rng.integers(0, 2, N)
    pcount = rng.integers(1, 7, N).astype(np.int32)
    pickup = T0 + rng.integers(0, 2 * 365 * 86400, N).astype(
        "timedelta64[s]")
    dist = (rng.random(N) * 30).astype(np.float32)
    amount = (rng.random(N) * 80 + 3).astype(np.float32)
    dlon = (-74.05 + rng.random(N) * 0.4)
    dlat = (40.6 + rng.random(N) * 0.3)
    db = hdt.connect()
    db.sql(
        "CREATE TABLE trips (cab_type TEXT, passenger_count INT, "
        "pickup_datetime TIMESTAMP, trip_distance FLOAT, "
        "total_amount FLOAT, dropoff_longitude DOUBLE, "
        "dropoff_latitude DOUBLE)"
    )
    db.load_table("trips", {
        "cab_type": [["green", "yellow"][i] for i in cab],
        "passenger_count": pcount,
        "pickup_datetime": pickup.astype("datetime64[s]").astype(np.int64),
        "trip_distance": dist,
        "total_amount": amount,
        "dropoff_longitude": dlon,
        "dropoff_latitude": dlat,
    })
    return db, dict(cab=cab, pcount=pcount, pickup=pickup, dist=dist,
                    amount=amount, dlon=dlon, dlat=dlat)


def test_mq01_cab_counts(tdb):
    db, d = tdb
    rows = dict(db.sql(_q(TAXI_DIR, "MQ01.sql", "trips")).rows())
    assert rows["green"] == int((d["cab"] == 0).sum())
    assert rows["yellow"] == int((d["cab"] == 1).sum())


def test_mq02_avg_by_passengers(tdb):
    db, d = tdb
    rows = dict(db.sql(_q(TAXI_DIR, "MQ02.sql", "trips")).rows())
    for p in range(1, 7):
        assert rows[p] == pytest.approx(
            float(d["amount"][d["pcount"] == p].mean()), rel=1e-6)


def test_mq03_mq04_year_groupings(tdb):
    db, d = tdb
    years = d["pickup"].astype("datetime64[Y]").astype(int) + 1970
    rows = db.sql(_q(TAXI_DIR, "MQ03.sql", "trips")).rows()
    got = {(r[0], r[1]): r[2] for r in rows}
    for (p, y), c in list(got.items())[:8]:
        assert c == int(((d["pcount"] == p) & (years == y)).sum())

    rows4 = db.sql(_q(TAXI_DIR, "MQ04.sql", "trips")).rows()
    dist_i = d["dist"].astype(np.int64)
    for p, y, di, c in rows4[:8]:
        assert c == int(((d["pcount"] == p) & (years == y)
                         & (dist_i == di)).sum())
    # ORDER BY pickup_year, the_count desc
    keys = [(r[1], -r[3]) for r in rows4]
    assert keys == sorted(keys)


def test_mq05_rowid_sample(tdb):
    db, d = tdb
    q = _q(TAXI_DIR, "MQ05.sql", "trips")
    box = ((d["dlon"] >= -73.96545429103965)
           & (d["dlon"] <= -73.77446517425182)
           & (d["dlat"] >= 40.65125236898476)
           & (d["dlat"] <= 40.8238895460745))
    total = int(box.sum())
    got = db.sql(q).scalar()
    # the rowid hash keeps ~50391620/2^32 ≈ 1.17% of rows; deterministic
    assert got == db.sql(q).scalar()
    assert 0 <= got <= total
    assert got <= max(0.05 * total, 50)


def test_mq06_sample_ratio(tdb):
    db, d = tdb
    q = _q(TAXI_DIR, "MQ06.sql", "trips")
    box = ((d["dlon"] >= -73.96545429103965)
           & (d["dlon"] <= -73.77446517425182)
           & (d["dlat"] >= 40.65125236898476)
           & (d["dlat"] <= 40.8238895460745))
    total = int(box.sum())
    got = db.sql(q).scalar()
    assert got == db.sql(q).scalar()  # deterministic
    assert 0 <= got <= total
    # ratio 1.38% with slack
    assert got <= max(0.06 * total, 50)


@pytest.fixture(scope="module")
def ldb():
    rng = np.random.default_rng(33)
    n = 30_000
    ts = np.where(
        rng.random(n) < 0.05, -1,
        (T0 + rng.integers(0, 30 * 86400, n).astype("timedelta64[s]")
         ).astype("datetime64[s]").astype(np.int64),
    )
    db = hdt.connect()
    db.sql("CREATE TABLE logs (log_timestamp TIMESTAMP, duration_ms INT, "
           "api_name TEXT, severity TEXT)")
    apis = ["get", "put", "sql_execute", "connect", "render"]
    sevs = ["INFO", "WARN", "ERROR"]
    db.load_table("logs", {
        "log_timestamp": [None if t == -1 else int(t) for t in ts],
        "duration_ms": rng.integers(1, 5000, n).astype(np.int32),
        "api_name": [apis[i] for i in rng.integers(0, len(apis), n)],
        "severity": [sevs[i] for i in rng.integers(0, len(sevs), n)],
    })
    return db, n


@pytest.mark.parametrize("qname", [f"Q0{i}.sql" for i in range(1, 8)])
def test_logs_suite(ldb, qname):
    db, n = ldb
    rows = db.sql(_q(LOGS_DIR, qname, "logs")).rows()
    if qname == "Q01.sql":
        assert rows[0][0] == n
    else:
        assert rows  # runs, returns data; spot-correctness via Q01/engine
