"""Date/time + decimal + CASE/NULL-corner differential clusters vs the
SQLite oracle — the ExecuteTest idiom groups the round-1 verdict asked for
(reference Tests/ExecuteTest.cpp date/decimal/CASE sections)."""

import datetime

import numpy as np
import pytest

from tests.test_sqlite_oracle import Oracle


@pytest.fixture(scope="module")
def ddb():
    import heavydb_tpu as hdt

    return hdt.connect()


@pytest.fixture(scope="module")
def doracle(ddb):
    rng = np.random.default_rng(77)
    o = Oracle(ddb)
    n = 800
    base = datetime.date(2019, 1, 1)
    dates = [
        None if i % 17 == 0
        else (base + datetime.timedelta(days=int(v))).isoformat()
        for i, v in enumerate(rng.integers(0, 1100, n))
    ]
    times = [
        None if i % 19 == 0
        else (datetime.datetime(2020, 1, 1)
              + datetime.timedelta(seconds=int(v))).isoformat(sep=" ")
        for i, v in enumerate(rng.integers(0, 90_000_000, n))
    ]
    amts = [
        None if i % 13 == 0 else round(float(v), 2)
        for i, v in enumerate(rng.uniform(-1000, 1000, n))
    ]
    k = [int(v) for v in rng.integers(0, 12, n)]
    o.load(
        "td",
        {"d": dates, "ts": times, "amt": amts, "k": k},
        {"d": "DATE", "ts": "TIMESTAMP", "amt": "DECIMAL(10,2)",
         "k": "INT"},
    )
    return o


DT_QUERIES = [
    # EXTRACT family (sqlite: strftime)
    ("SELECT count(*) FROM td WHERE EXTRACT(YEAR FROM d) = 2020",
     "SELECT count(*) FROM td WHERE CAST(strftime('%Y', d) AS INT) = 2020"),
    ("SELECT count(*) FROM td WHERE EXTRACT(MONTH FROM d) IN (1, 2)",
     "SELECT count(*) FROM td WHERE CAST(strftime('%m', d) AS INT) IN (1, 2)"),
    ("SELECT EXTRACT(DOW FROM d), count(*) FROM td WHERE d IS NOT NULL "
     "GROUP BY 1 ORDER BY 1",
     "SELECT CAST(strftime('%w', d) AS INT), count(*) FROM td WHERE d IS "
     "NOT NULL GROUP BY 1 ORDER BY 1"),
    ("SELECT EXTRACT(HOUR FROM ts), count(*) FROM td WHERE ts IS NOT NULL "
     "GROUP BY 1 ORDER BY 1 LIMIT 5",
     "SELECT CAST(strftime('%H', ts) AS INT), count(*) FROM td WHERE ts "
     "IS NOT NULL GROUP BY 1 ORDER BY 1 LIMIT 5"),
    # DATE_TRUNC via group-by month buckets
    ("SELECT EXTRACT(YEAR FROM d) * 100 + EXTRACT(MONTH FROM d), count(*) "
     "FROM td WHERE d IS NOT NULL GROUP BY 1 ORDER BY 1 LIMIT 12",
     "SELECT CAST(strftime('%Y', d) AS INT) * 100 + "
     "CAST(strftime('%m', d) AS INT), count(*) FROM td WHERE d IS NOT "
     "NULL GROUP BY 1 ORDER BY 1 LIMIT 12"),
    # date comparisons / BETWEEN
    ("SELECT count(*) FROM td WHERE d >= DATE '2020-06-01'",
     "SELECT count(*) FROM td WHERE d >= '2020-06-01'"),
    ("SELECT count(*) FROM td WHERE d BETWEEN DATE '2019-03-01' AND "
     "DATE '2019-09-30'",
     "SELECT count(*) FROM td WHERE d BETWEEN '2019-03-01' AND "
     "'2019-09-30'"),
    ("SELECT min(d), max(d) FROM td", None),
    ("SELECT count(DISTINCT d) FROM td", None),
]

DEC_QUERIES = [
    ("SELECT sum(amt) FROM td", None),
    ("SELECT round(avg(amt), 2) FROM td", None),
    ("SELECT min(amt), max(amt) FROM td", None),
    ("SELECT count(*) FROM td WHERE amt > 500.50", None),
    ("SELECT count(*) FROM td WHERE amt BETWEEN -100.25 AND 100.25", None),
    ("SELECT k, sum(amt) FROM td GROUP BY k ORDER BY k", None),
    ("SELECT sum(amt * 2), sum(amt) + sum(amt) FROM td", None),
    ("SELECT count(*) FROM td WHERE amt + 10.00 > 0", None),
    ("SELECT CAST(amt AS INT), count(*) FROM td WHERE amt IS NOT NULL "
     "AND amt > 990 GROUP BY 1 ORDER BY 1", None),
]

NULL_CASE_QUERIES = [
    ("SELECT count(*) FROM td WHERE NULL IS NULL", None),
    ("SELECT count(*) FROM td WHERE amt = NULL", None),       # always unknown
    ("SELECT count(*) FROM td WHERE NOT (amt > 0)", None),    # null drops
    ("SELECT count(*) FROM td WHERE amt > 0 OR amt <= 0", None),
    ("SELECT count(*) FROM td WHERE COALESCE(k, -1) >= 0", None),
    ("SELECT COALESCE(max(amt), 0) FROM td WHERE amt > 10000", None),
    ("SELECT CASE WHEN amt IS NULL THEN 'n' WHEN amt > 0 THEN 'p' "
     "ELSE 'z' END c, count(*) FROM td GROUP BY c ORDER BY c", None),
    ("SELECT NULLIF(k, 5), count(*) FROM td GROUP BY 1 "
     "ORDER BY 1 NULLS FIRST",
     "SELECT NULLIF(k, 5), count(*) FROM td GROUP BY 1 "
     "ORDER BY NULLIF(k, 5) IS NOT NULL, 1"),
    ("SELECT sum(CASE WHEN k % 2 = 0 THEN amt END) FROM td", None),
    ("SELECT count(CASE WHEN amt > 0 THEN 1 END) FROM td", None),
]


@pytest.mark.parametrize("pair", DT_QUERIES, ids=[q[0][:48] for q in DT_QUERIES])
def test_datetime_cluster(doracle, pair):
    ours, lite = pair
    doracle.check(ours, lite_sql=lite)


@pytest.mark.parametrize("pair", DEC_QUERIES, ids=[q[0][:48] for q in DEC_QUERIES])
def test_decimal_cluster(doracle, pair):
    ours, lite = pair
    doracle.check(ours, lite_sql=lite)


@pytest.mark.parametrize("pair", NULL_CASE_QUERIES,
                         ids=[q[0][:48] for q in NULL_CASE_QUERIES])
def test_null_case_cluster(doracle, pair):
    ours, lite = pair
    doracle.check(ours, lite_sql=lite)


def test_interval_arithmetic(ddb):
    """d ± INTERVAL 'n' unit with civil month-end clamping (reference
    DateAdd.cpp)."""
    import datetime as _dt

    db = ddb
    db.sql("CREATE TABLE iv (d DATE, ts TIMESTAMP)")
    db.sql("INSERT INTO iv VALUES ('2020-01-31', '2020-01-31 10:30:00'), "
           "('2019-12-31', '2020-03-31 23:59:59')")
    rows = db.sql("SELECT d + INTERVAL '1' MONTH, d - INTERVAL '2' MONTH, "
                  "d + INTERVAL '1' DAY FROM iv").rows()
    assert rows[0] == (_dt.date(2020, 2, 29), _dt.date(2019, 11, 30),
                       _dt.date(2020, 2, 1))
    assert rows[1] == (_dt.date(2020, 1, 31), _dt.date(2019, 10, 31),
                       _dt.date(2020, 1, 1))
    rows = db.sql("SELECT ts + INTERVAL '90' SECOND, "
                  "ts + INTERVAL '25' HOUR FROM iv").rows()
    assert rows[0][0] == _dt.datetime(2020, 1, 31, 10, 31, 30)
    assert rows[0][1] == _dt.datetime(2020, 2, 1, 11, 30)
    assert rows[1][0] == _dt.datetime(2020, 4, 1, 0, 1, 29)
    # interval in a filter over a literal timestamp
    assert db.sql(
        "SELECT count(*) FROM iv WHERE ts > "
        "TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '30' DAY"
    ).rows()[0][0] == 2
