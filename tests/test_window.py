"""Window function tests (reference window set, Shared/sqldefs.h:143-173)."""

import numpy as np
import pytest


@pytest.fixture()
def wdb(db):
    db.sql("CREATE TABLE w (g TEXT, x INT, v DOUBLE)")
    db.sql(
        "INSERT INTO w VALUES "
        "('a', 1, 10.0), ('a', 2, 20.0), ('a', 3, 30.0), "
        "('b', 1, 5.0), ('b', 2, NULL), ('b', 2, 7.0), "
        "('c', 9, 1.0)"
    )
    return db


def test_row_number(wdb):
    rows = wdb.sql(
        "SELECT g, x, ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) rn "
        "FROM w ORDER BY g, x, rn"
    ).rows()
    assert [r[2] for r in rows] == [1, 2, 3, 1, 2, 3, 1]


def test_rank_dense_rank(wdb):
    rows = wdb.sql(
        "SELECT g, x, RANK() OVER (PARTITION BY g ORDER BY x), "
        "DENSE_RANK() OVER (PARTITION BY g ORDER BY x) "
        "FROM w WHERE g = 'b' ORDER BY x"
    ).rows()
    assert rows == [("b", 1, 1, 1), ("b", 2, 2, 2), ("b", 2, 2, 2)]


def test_lag_lead(wdb):
    rows = wdb.sql(
        "SELECT g, x, LAG(v) OVER (PARTITION BY g ORDER BY x), "
        "LEAD(v) OVER (PARTITION BY g ORDER BY x) "
        "FROM w WHERE g = 'a' ORDER BY x"
    ).rows()
    assert rows == [
        ("a", 1, None, 20.0),
        ("a", 2, 10.0, 30.0),
        ("a", 3, 20.0, None),
    ]


def test_lag_offset_default(wdb):
    rows = wdb.sql(
        "SELECT x, LAG(x, 2, -1) OVER (ORDER BY x, v NULLS LAST) FROM w "
        "WHERE g = 'a' ORDER BY x"
    ).rows()
    assert [r[1] for r in rows] == [-1, -1, 1]


def test_first_last_value(wdb):
    rows = wdb.sql(
        "SELECT g, x, FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY x), "
        "LAST_VALUE(v) OVER (PARTITION BY g ORDER BY x) "
        "FROM w WHERE g = 'a' ORDER BY x"
    ).rows()
    # default frame: LAST_VALUE = current row's last peer
    assert rows == [
        ("a", 1, 10.0, 10.0),
        ("a", 2, 10.0, 20.0),
        ("a", 3, 10.0, 30.0),
    ]


def test_running_sum_count(wdb):
    rows = wdb.sql(
        "SELECT g, x, SUM(v) OVER (PARTITION BY g ORDER BY x), "
        "COUNT(v) OVER (PARTITION BY g ORDER BY x) "
        "FROM w WHERE g = 'b' ORDER BY x, v NULLS LAST"
    ).rows()
    # x=2 rows are peers → both see the full running value
    assert rows == [("b", 1, 5.0, 1), ("b", 2, 12.0, 2), ("b", 2, 12.0, 2)]


def test_partition_agg_no_order(wdb):
    rows = wdb.sql(
        "SELECT g, SUM(v) OVER (PARTITION BY g), "
        "COUNT(*) OVER (PARTITION BY g), "
        "MIN(x) OVER (PARTITION BY g), MAX(v) OVER (PARTITION BY g) "
        "FROM w ORDER BY g, x"
    ).rows()
    assert rows[0] == ("a", 60.0, 3, 1, 30.0)
    assert rows[3] == ("b", 12.0, 3, 1, 7.0)
    assert rows[6] == ("c", 1.0, 1, 9, 1.0)


def test_running_min_max(wdb):
    rows = wdb.sql(
        "SELECT x, MIN(v) OVER (ORDER BY x NULLS LAST, v NULLS LAST), "
        "MAX(v) OVER (ORDER BY x NULLS LAST, v NULLS LAST) "
        "FROM w WHERE g='a' ORDER BY x"
    ).rows()
    assert rows == [(1, 10.0, 10.0), (2, 10.0, 20.0), (3, 10.0, 30.0)]


def test_ntile_percent_rank(wdb):
    rows = wdb.sql(
        "SELECT x, NTILE(2) OVER (ORDER BY x), "
        "PERCENT_RANK() OVER (ORDER BY x), "
        "CUME_DIST() OVER (ORDER BY x) "
        "FROM w WHERE g = 'a' ORDER BY x"
    ).rows()
    assert [r[1] for r in rows] == [1, 1, 2]
    assert rows[0][2] == 0.0 and rows[2][2] == 1.0
    assert rows[2][3] == 1.0


def test_window_no_partition(wdb):
    rows = wdb.sql(
        "SELECT g, x, ROW_NUMBER() OVER (ORDER BY v DESC NULLS LAST, x) "
        "FROM w ORDER BY 3 LIMIT 3"
    ).rows()
    assert [r[0] for r in rows] == ["a", "a", "a"]


def test_window_expr_combination(wdb):
    rows = wdb.sql(
        "SELECT x, v - AVG(v) OVER (PARTITION BY g) delta FROM w "
        "WHERE g = 'a' ORDER BY x"
    ).rows()
    assert [r[1] for r in rows] == [-10.0, 0.0, 10.0]


def test_window_string_arg(wdb):
    rows = wdb.sql(
        "SELECT x, FIRST_VALUE(g) OVER (ORDER BY x, g) FROM w ORDER BY x, g LIMIT 2"
    ).rows()
    assert [r[1] for r in rows] == ["a", "a"]


def test_window_over_filtered_subquery(wdb):
    rows = wdb.sql(
        "SELECT g, sv FROM (SELECT g, x, SUM(v) OVER (PARTITION BY g) sv "
        "FROM w WHERE x < 3) q WHERE sv > 10 ORDER BY g, x"
    ).rows()
    assert rows == [
        ("a", 30.0), ("a", 30.0), ("b", 12.0), ("b", 12.0), ("b", 12.0)
    ]


# ---- explicit frames (ROWS/RANGE BETWEEN) ----------------------------------

FRAMED_QUERIES = [
    "SELECT g, x, SUM(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, AVG(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, MIN(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, MAX(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM w "
    "ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, COUNT(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, SUM(x) OVER (PARTITION BY g ORDER BY x "
    "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM w "
    "ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, MAX(v) OVER (PARTITION BY g ORDER BY x "
    "RANGE BETWEEN CURRENT ROW AND CURRENT ROW) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, MIN(x) OVER (PARTITION BY g ORDER BY x "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM w "
    "ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, LAST_VALUE(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM w ORDER BY g, x, v NULLS FIRST",
    "SELECT g, x, SUM(v) OVER (PARTITION BY g "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
    "FROM w ORDER BY g, x, v NULLS FIRST",
]


@pytest.mark.parametrize("q", FRAMED_QUERIES)
def test_framed_vs_sqlite(wdb, q):
    import math
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE w (g TEXT, x INT, v DOUBLE)")
    con.executemany(
        "INSERT INTO w VALUES (?,?,?)",
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
         ("b", 1, 5.0), ("b", 2, None), ("b", 2, 7.0), ("c", 9, 1.0)],
    )
    want = con.execute(q).fetchall()
    got = wdb.sql(q).rows()
    assert len(got) == len(want), (got, want)
    for rg, rw in zip(got, want):
        for a, b in zip(rg, rw):
            if isinstance(a, float) and b is not None:
                assert math.isclose(a, b, rel_tol=1e-9), (q, got, want)
            else:
                assert a == b, (q, got, want)


def test_framed_larger_random_vs_sqlite(db):
    import math
    import sqlite3

    rng = np.random.default_rng(5)
    n = 3000
    g = rng.integers(0, 7, n)
    x = rng.integers(0, 50, n)
    v = np.where(rng.random(n) < 0.1, np.nan, rng.normal(0, 10, n))
    db.sql("CREATE TABLE wr (g INT, x INT, v DOUBLE, r INT)")
    db.load_table("wr", {"g": g.astype(np.int32), "x": x.astype(np.int32),
                         "v": v, "r": np.arange(n, dtype=np.int32)})
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE wr (g INT, x INT, v DOUBLE, r INT)")
    con.executemany(
        "INSERT INTO wr VALUES (?,?,?,?)",
        [(int(g[i]), int(x[i]), None if np.isnan(v[i]) else float(v[i]), i)
         for i in range(n)],
    )
    for q in [
        "SELECT g, x, SUM(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST, r "
        "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) s FROM wr "
        "ORDER BY g, r",
        "SELECT g, x, MIN(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST, r "
        "ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM wr "
        "ORDER BY g, r",
        "SELECT g, x, MAX(v) OVER (PARTITION BY g ORDER BY x, v NULLS FIRST, r "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) s FROM wr "
        "ORDER BY g, r",
        "SELECT g, x, COUNT(v) OVER (PARTITION BY g ORDER BY x "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s FROM wr "
        "ORDER BY g, r",
    ]:
        want = con.execute(q).fetchall()
        got = db.sql(q).rows()
        assert len(got) == len(want)
        mismatch = 0
        for rg, rw in zip(got, want):
            a, b = rg[2], rw[2]
            if a is None or b is None:
                assert a == b, (q, rg, rw)
            elif isinstance(a, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (q, rg, rw)
            else:
                assert a == b, (q, rg, rw)


def test_frame_errors(db):
    db.sql("CREATE TABLE fe (x INT)")
    db.sql("INSERT INTO fe VALUES (1), (2)")
    import pytest as _pt

    from heavydb_tpu.errors import BinderError, NotSupported

    with _pt.raises(NotSupported):
        db.sql("SELECT SUM(x) OVER (ORDER BY x "
               "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) FROM fe")
    with _pt.raises(BinderError):
        db.sql("SELECT SUM(x) OVER (ORDER BY x "
               "ROWS BETWEEN UNBOUNDED FOLLOWING AND CURRENT ROW) FROM fe")


def test_ignore_nulls_navigation(db):
    db.sql("CREATE TABLE wn (g INT, x INT, v DOUBLE)")
    db.sql(
        "INSERT INTO wn VALUES (1,1,10.0),(1,2,NULL),(1,3,NULL),"
        "(1,4,40.0),(1,5,NULL),(2,1,NULL),(2,2,7.0)"
    )
    base = "OVER (PARTITION BY g ORDER BY x) FROM wn ORDER BY g, x"
    assert [r[2] for r in db.sql(
        f"SELECT g, x, LAG(v) IGNORE NULLS {base}"
    ).rows()] == [None, 10.0, 10.0, 10.0, 40.0, None, None]
    assert [r[2] for r in db.sql(
        f"SELECT g, x, LEAD(v) IGNORE NULLS {base}"
    ).rows()] == [40.0, 40.0, 40.0, None, None, 7.0, None]
    assert [r[2] for r in db.sql(
        f"SELECT g, x, LAST_VALUE(v) IGNORE NULLS {base}"
    ).rows()] == [10.0, 10.0, 10.0, 40.0, 40.0, None, 7.0]
    assert [r[2] for r in db.sql(
        f"SELECT g, x, FIRST_VALUE(v) IGNORE NULLS {base}"
    ).rows()] == [10.0] * 5 + [None, 7.0]
    # LAG(expr, 2) IGNORE NULLS + default; RESPECT NULLS is a no-op
    assert [r[2] for r in db.sql(
        f"SELECT g, x, LAG(v, 2, -1.0) IGNORE NULLS {base}"
    ).rows()] == [-1.0, -1.0, -1.0, -1.0, 10.0, -1.0, -1.0]
    assert [r[2] for r in db.sql(
        f"SELECT g, x, LAG(v) RESPECT NULLS {base}"
    ).rows()] == [None, 10.0, None, None, 40.0, None, None]


def test_string_order_key_lexicographic(db, rng):
    """Window ORDER BY on a dict-encoded TEXT column must rank by
    LEXICOGRAPHIC order, not dictionary id (ids follow insertion order) —
    same contract as the Sort node's rank tables.  Also exercises the
    rank-translated packed sort-key path."""
    import sqlite3

    db.sql("CREATE TABLE wso (s TEXT, g INT, v INT)")
    words = ["zebra", "apple", "mango", "kiwi", "banana", "apple", "zebra"]
    rows = [(w, int(i % 2), i) for i, w in enumerate(words)]
    db.load_table(
        "wso",
        {"s": [r[0] for r in rows], "g": [r[1] for r in rows],
         "v": [r[2] for r in rows]},
    )
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE wso (s TEXT, g INT, v INT)")
    con.executemany("INSERT INTO wso VALUES (?,?,?)", rows)
    for q in [
        "SELECT v, RANK() OVER (ORDER BY s) FROM wso ORDER BY v",
        "SELECT v, DENSE_RANK() OVER (ORDER BY s DESC) FROM wso ORDER BY v",
        "SELECT v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY s, v) "
        "FROM wso ORDER BY v",
        "SELECT v, FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY s) "
        "FROM wso ORDER BY v",
        "SELECT v, SUM(v) OVER (ORDER BY s) FROM wso ORDER BY v",
    ]:
        mine = [tuple(r) for r in db.sql(q).rows()]
        assert mine == sorted(con.execute(q).fetchall()), q


def test_double_single_running_sum_matches_f64(monkeypatch):
    """Force the double-single (paired f32) big-n path and check it against
    the plain f64 formulation (ops/window._ds_eligible gate)."""
    import jax.numpy as jnp

    from heavydb_tpu.ops import window as W

    monkeypatch.setattr(W, "_DS_MIN_ROWS", 1)
    rng = np.random.default_rng(9)
    n = 100_000
    vals = jnp.asarray((rng.random(n) - 0.5).astype(np.float32) * 1e3)
    pstart = jnp.asarray(rng.random(n) < 0.001).at[0].set(True)
    ostart = jnp.ones(n, bool)  # each row its own peer group
    run, _ = W.running_agg(vals, None, pstart, ostart, "SUM",
                           np.dtype(np.float64))
    if isinstance(run, W.DsPair):  # SUM rides as split f32 pairs now
        run = run.combine()
    # oracle: per-partition running sum in f64
    v = np.asarray(vals, np.float64)
    ps = np.asarray(pstart)
    ref = np.zeros(n)
    acc = 0.0
    for i in range(n):
        if ps[i]:
            acc = 0.0
        acc += v[i]
        ref[i] = acc
    assert np.allclose(np.asarray(run), ref, rtol=1e-9, atol=1e-6)
