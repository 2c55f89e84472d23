"""Reference flights benchmark suite (Benchmarks/queries/flights/Q001-
Q017) run VERBATIM against the engine — queries load from the reference
tree at test time and results check against numpy oracles.  This is the
reference's own headline workload (Benchmarks/run_benchmark.py)."""

import os

import numpy as np
import pytest

import heavydb_tpu as hdt

QDIR = "/root/reference/Benchmarks/queries/flights"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QDIR), reason="reference benchmark queries absent"
)

N = 60_000
CARRIERS = ["AA", "UA", "DL", "WN", "B6", "AS", "NK", "F9"]
AIRPORTS = [
    "Lambert-St Louis International", "Lincoln Municipal",
    "Los Angeles International", "Chicago OHare International",
    "Dallas-Fort Worth International", "Denver International",
]
STATES = ["MO", "NE", "CA", "IL", "TX", "CO"]
T0 = np.datetime64("1996-01-01 00:00:00")


def _q(name: str) -> str:
    with open(os.path.join(QDIR, name)) as f:
        return f.read().replace("##TAB##", "flights")


@pytest.fixture(scope="module")
def fdb():
    rng = np.random.default_rng(17)
    carrier = rng.integers(0, len(CARRIERS), N)
    origin = rng.integers(0, len(AIRPORTS), N)
    dest = rng.integers(0, len(AIRPORTS), N)
    dep = T0 + rng.integers(0, 2 * 365 * 86400, N).astype("timedelta64[s]")
    arr = dep + rng.integers(1800, 21600, N).astype("timedelta64[s]")
    arrdelay = rng.integers(-30, 180, N).astype(np.int32)
    depdelay = rng.integers(-15, 120, N).astype(np.int32)
    flightnum = rng.integers(1, 2000, N).astype(np.int32)
    dest_lat = rng.random(N).astype(np.float32) * 90

    db = hdt.connect()
    db.sql(
        "CREATE TABLE flights (carrier_name TEXT, uniquecarrier TEXT, "
        "origin_name TEXT, dest_name TEXT, dest_state TEXT, "
        "flightnum INT, dep_timestamp TIMESTAMP, arr_timestamp TIMESTAMP, "
        "arrdelay INT, depdelay INT, dest_lat FLOAT)"
    )
    db.load_table("flights", {
        "carrier_name": [CARRIERS[i] for i in carrier],
        "uniquecarrier": [CARRIERS[i] for i in carrier],
        "origin_name": [AIRPORTS[i] for i in origin],
        "dest_name": [AIRPORTS[i] for i in dest],
        "dest_state": [STATES[i] for i in dest],
        "flightnum": flightnum,
        "dep_timestamp": dep.astype("datetime64[s]").astype(np.int64),
        "arr_timestamp": arr.astype("datetime64[s]").astype(np.int64),
        "arrdelay": arrdelay,
        "depdelay": depdelay,
        "dest_lat": dest_lat,
    })
    data = dict(carrier=carrier, origin=origin, dest=dest, dep=dep,
                arr=arr, arrdelay=arrdelay, depdelay=depdelay,
                flightnum=flightnum, dest_lat=dest_lat)
    return db, data


def _win(data, lo, hi):
    lo64 = np.datetime64(lo)
    hi64 = np.datetime64(hi)
    return (data["dep"] >= lo64) & (data["dep"] < hi64)


def test_q001_count(fdb):
    db, d = fdb
    assert db.sql(_q("Q001.sql")).scalar() == N


def test_q002_carrier_count(fdb):
    db, d = fdb
    rows = dict(db.sql(_q("Q002.sql")).rows())
    for i, c in enumerate(CARRIERS):
        assert rows[c] == int((d["carrier"] == i).sum())


def test_q003_carrier_avg(fdb):
    db, d = fdb
    rows = dict(db.sql(_q("Q003.sql")).rows())
    for i, c in enumerate(CARRIERS):
        assert rows[c] == pytest.approx(
            float(d["arrdelay"][d["carrier"] == i].mean()), rel=1e-6)


def test_q004_od_avg(fdb):
    db, d = fdb
    rows = {(r[0], r[1]): r[2] for r in db.sql(_q("Q004.sql")).rows()}
    m = (d["origin"] == 0) & (d["dest"] == 1)
    assert rows[(AIRPORTS[0], AIRPORTS[1])] == pytest.approx(
        float(d["arrdelay"][m].mean()), rel=1e-6)
    assert len(rows) == len(
        {(o, de) for o, de in zip(d["origin"], d["dest"])})


def test_q005_month_trunc(fdb):
    db, d = fdb
    rows = db.sql(_q("Q005.sql")).rows()
    months = d["dep"].astype("datetime64[M]")
    assert len(rows) == len(np.unique(months))
    got = {np.datetime64(r[0]).astype("datetime64[M]"): r[1]
           for r in rows}
    m0 = months == months.min()
    assert got[months.min()] == pytest.approx(
        float(d["arrdelay"][m0].mean()), rel=1e-6)


def test_q006_extract_ym(fdb):
    db, d = fdb
    rows = db.sql(_q("Q006.sql")).rows()
    # spot-check one (dest, year, month) cell
    dn, mo, yr, val = rows[0]
    di = AIRPORTS.index(dn)
    dts = d["dep"].astype("datetime64[s]").astype(object)
    mask = np.array([
        (x.month == mo and x.year == yr) for x in dts
    ]) & (d["dest"] == di)
    assert val == pytest.approx(float(d["arrdelay"][mask].mean()),
                                rel=1e-6)


def test_q007_q008_filters(fdb):
    db, d = fdb
    assert db.sql(_q("Q007.sql")).scalar() == int((d["origin"] == 0).sum())
    assert db.sql(_q("Q008.sql")).scalar() == int(
        ((d["origin"] == 0) & (d["dest"] == 1)).sum())


def test_q011_projection_limit(fdb):
    db, d = fdb
    rows = db.sql(_q("Q011.sql")).rows()
    want = int(((d["origin"] == 0) & (d["flightnum"] == 586)).sum())
    assert len(rows) == min(want, 5000)
    for r in rows:
        assert r[1] == 586


def test_q012_q016_topk_by_size(fdb):
    db, d = fdb
    for qn, lo, hi in [
        ("Q012.sql", "1996-07-26 16:30:06", "1997-05-16 16:30:06"),
        ("Q016.sql", "1996-07-28 00:00:00", "1997-05-18 00:00:00"),
    ]:
        rows = db.sql(_q(qn)).rows()
        m = _win(d, lo, hi)
        for key0, x, y, size in rows:
            sel = m & (d["carrier"] == CARRIERS.index(key0))
            assert size == int(sel.sum())
            assert x == pytest.approx(float(d["depdelay"][sel].mean()),
                                      rel=1e-6)
            assert y == pytest.approx(float(d["arrdelay"][sel].mean()),
                                      rel=1e-6)
        sizes = [r[3] for r in rows]
        assert sizes == sorted(sizes, reverse=True)


def test_q013_count_window(fdb):
    db, d = fdb
    assert db.sql(_q("Q013.sql")).scalar() == int(
        _win(d, "1996-07-28 00:00:00", "1997-05-18 00:00:00").sum())


def test_q014_month_isodow(fdb):
    db, d = fdb
    rows = db.sql(_q("Q014.sql")).rows()
    m = _win(d, "1996-07-28 00:00:00", "1997-05-18 00:00:00")
    arrs = d["arr"].astype("datetime64[s]").astype(object)
    months = np.array([x.month for x in arrs])
    isodow = np.array([x.isoweekday() for x in arrs])
    for key0, key1, color in rows[:10]:
        sel = m & (months == key0) & (isodow == key1)
        assert color == int(sel.sum())


def test_q015_state_avg(fdb):
    db, d = fdb
    rows = dict(db.sql(_q("Q015.sql")).rows())
    m = _win(d, "1996-07-28 00:00:00", "1997-05-18 00:00:00")
    for si, st in enumerate(STATES):
        sel = m & (d["dest"] == si)
        assert rows[st] == pytest.approx(
            float(d["arrdelay"][sel].mean()), rel=1e-6)


def test_q017_multi_avg(fdb):
    db, d = fdb
    rows = {(r[0], r[1]): r[2:] for r in db.sql(_q("Q017.sql")).rows()}
    m = (d["origin"] == 2) & (d["dest"] == 3)
    a, dd, s = rows[(AIRPORTS[2], AIRPORTS[3])]
    assert a == pytest.approx(float(d["arrdelay"][m].mean()), rel=1e-6)
    assert dd == pytest.approx(float(d["depdelay"][m].mean()), rel=1e-6)
    assert s == pytest.approx(
        float((d["arrdelay"][m] + d["depdelay"][m]).mean()), rel=1e-6)
