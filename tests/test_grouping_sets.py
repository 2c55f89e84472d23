"""GROUPING SETS / ROLLUP / CUBE (round-2) — desugared into UNION ALL of
per-set aggregations; differential-checked against hand-expanded SQLite."""

import sqlite3

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture(scope="module")
def gdb():
    db = hdt.connect()
    rng = np.random.default_rng(2)
    n = 5000
    a = rng.integers(0, 4, n).astype(np.int32)
    b = rng.integers(0, 3, n).astype(np.int32)
    v = rng.integers(0, 100, n).astype(np.int32)
    db.load_table("t", {"a": a, "b": b, "v": v}, create=True)
    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    cur.execute("CREATE TABLE t (a INT, b INT, v INT)")
    cur.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [(int(x), int(y), int(z)) for x, y, z in zip(a, b, v)],
    )
    return db, cur


def _wrap(u):
    return f"SELECT * FROM ({u}) ORDER BY a IS NULL, a, b IS NULL, b"


CASES = [
    ("SELECT a, b, count(*), sum(v) FROM t GROUP BY ROLLUP(a, b) "
     "ORDER BY a NULLS LAST, b NULLS LAST",
     _wrap("SELECT a, b, count(*), sum(v) FROM t GROUP BY a, b UNION ALL "
           "SELECT a, NULL, count(*), sum(v) FROM t GROUP BY a UNION ALL "
           "SELECT NULL, NULL, count(*), sum(v) FROM t")),
    ("SELECT a, b, sum(v) FROM t GROUP BY CUBE(a, b) "
     "ORDER BY a NULLS LAST, b NULLS LAST",
     _wrap("SELECT a, b, sum(v) FROM t GROUP BY a, b UNION ALL "
           "SELECT NULL, b, sum(v) FROM t GROUP BY b UNION ALL "
           "SELECT a, NULL, sum(v) FROM t GROUP BY a UNION ALL "
           "SELECT NULL, NULL, sum(v) FROM t")),
    ("SELECT a, b, count(*) FROM t "
     "GROUP BY GROUPING SETS ((a, b), (b), ()) "
     "ORDER BY a NULLS LAST, b NULLS LAST",
     _wrap("SELECT a, b, count(*) FROM t GROUP BY a, b UNION ALL "
           "SELECT NULL, b, count(*) FROM t GROUP BY b UNION ALL "
           "SELECT NULL, NULL, count(*) FROM t")),
    # HAVING applies per grouping set
    ("SELECT a, b, count(*) FROM t GROUP BY ROLLUP(a, b) "
     "HAVING count(*) > 430 ORDER BY a NULLS LAST, b NULLS LAST",
     _wrap("SELECT * FROM (SELECT a, b, count(*) c FROM t GROUP BY a, b "
           "HAVING c > 430) UNION ALL "
           "SELECT * FROM (SELECT a, NULL, count(*) c FROM t GROUP BY a "
           "HAVING c > 430) UNION ALL "
           "SELECT * FROM (SELECT NULL a, NULL b, count(*) c FROM t "
           "HAVING c > 430)")),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0][:40] for c in CASES])
def test_grouping_sets(gdb, case):
    db, cur = gdb
    q, lq = case
    mine = [tuple(r) for r in db.sql(q).rows()]
    want = cur.execute(lq).fetchall()
    assert mine == want, (mine[:6], want[:6])


def test_rollup_with_expressions(gdb):
    db, cur = gdb
    mine = [tuple(r) for r in db.sql(
        "SELECT a % 2, sum(v) FROM t GROUP BY ROLLUP(a % 2) "
        "ORDER BY 1 NULLS LAST"
    ).rows()]
    want = cur.execute(
        "SELECT * FROM (SELECT a % 2 m, sum(v) FROM t GROUP BY m UNION ALL "
        "SELECT NULL, sum(v) FROM t) ORDER BY m IS NULL, m"
    ).fetchall()
    assert mine == want
