"""Differential tests against an in-memory SQLite oracle — the pattern of
the reference's Tests/ExecuteTest.cpp (`c("SELECT ...", dt)` compares engine
results against SQLite via Tests/TestHelpers.h).

Random tables are loaded into both engines; each query must produce an
identical multiset of rows (order-insensitive unless the query has ORDER BY,
in which case order matters)."""

import math
import sqlite3

import numpy as np
import pytest


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if v != v:
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    return v


def _norm_rows(rows):
    return [tuple(_norm(v) for v in r) for r in rows]


def _vals_close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(float(a), float(b), rel_tol=1e-5, abs_tol=1e-6)
    return a == b


def _rows_close(ours, theirs):
    """Pairwise equality with float tolerance — round(v, 6) alone makes
    the comparison a coin flip for values sitting on a rounding boundary
    (engine sums in a different order than SQLite)."""
    return len(ours) == len(theirs) and all(
        len(r) == len(s) and all(_vals_close(a, b) for a, b in zip(r, s))
        for r, s in zip(ours, theirs)
    )


class Oracle:
    def __init__(self, db):
        self.db = db
        self.lite = sqlite3.connect(":memory:")

    def load(self, name, cols: dict, decls: dict):
        """cols: name → list of python values (None for null);
        decls: name → engine SQL type."""
        self.db.sql(
            f"CREATE TABLE {name} ("
            + ", ".join(f"{c} {t}" for c, t in decls.items())
            + ")"
        )
        lite_types = {
            "INT": "INTEGER", "BIGINT": "INTEGER", "SMALLINT": "INTEGER",
            "DOUBLE": "REAL", "FLOAT": "REAL", "TEXT": "TEXT",
            "BOOLEAN": "INTEGER", "DATE": "TEXT",
        }
        self.lite.execute(
            f"CREATE TABLE {name} ("
            + ", ".join(
                f"{c} {lite_types.get(t.split('(')[0], 'NUMERIC')}"
                for c, t in decls.items()
            )
            + ")"
        )
        names = list(cols)
        n = len(cols[names[0]])
        rows = [tuple(cols[c][i] for c in names) for i in range(n)]
        ph = ",".join("?" * len(names))
        bool_cols = [i for i, c in enumerate(names) if decls[c] == "BOOLEAN"]
        lite_rows = [
            tuple(
                int(v) if (i in bool_cols and v is not None) else v
                for i, v in enumerate(r)
            )
            for r in rows
        ]
        self.lite.executemany(f"INSERT INTO {name} VALUES ({ph})", lite_rows)
        # engine insert via bulk load
        self.db.load_table(name, {c: np.array(cols[c], object) for c in names})

    def check(self, sql, ordered=None, lite_sql=None):
        ours = _norm_rows(self.db.sql(sql).rows())
        theirs = _norm_rows(self.lite.execute(lite_sql or sql).fetchall())
        if ordered is None:
            ordered = "ORDER BY" in sql.upper()
        if ordered:
            assert _rows_close(ours, theirs), (
                f"\nquery: {sql}\nours:   {ours[:8]}\ntheirs: {theirs[:8]}"
            )
        else:
            assert _rows_close(
                sorted(ours, key=repr), sorted(theirs, key=repr)
            ), (
                f"\nquery: {sql}\nours:   {sorted(ours, key=repr)[:8]}\n"
                f"theirs: {sorted(theirs, key=repr)[:8]}"
            )


@pytest.fixture()
def oracle(db, rng):
    o = Oracle(db)
    n = 2000
    x = [int(v) if i % 11 else None for i, v in enumerate(rng.integers(-50, 50, n))]
    y = [float(round(v, 3)) if i % 7 else None
         for i, v in enumerate(rng.normal(0, 100, n))]
    s = [
        None if i % 13 == 0 else ["red", "green", "blue", "amber", "x'y"][v]
        for i, v in enumerate(rng.integers(0, 5, n))
    ]
    k = [int(v) for v in rng.integers(0, 20, n)]
    big = [int(v) for v in rng.integers(-(2**40), 2**40, n)]
    o.load(
        "t1",
        {"x": x, "y": y, "s": s, "k": k, "big": big},
        {"x": "INT", "y": "DOUBLE", "s": "TEXT", "k": "INT", "big": "BIGINT"},
    )
    m = 300
    o.load(
        "t2",
        {
            "k": [int(v) for v in rng.integers(0, 25, m)],
            "w": [float(round(v, 2)) for v in rng.uniform(0, 10, m)],
            "tag": [["red", "green", "cyan"][v] for v in rng.integers(0, 3, m)],
        },
        {"k": "INT", "w": "DOUBLE", "tag": "TEXT"},
    )
    return o


QUERIES = [
    "SELECT count(*) FROM t1",
    "SELECT count(x), count(y), count(s) FROM t1",
    "SELECT sum(x), min(x), max(x) FROM t1",
    "SELECT avg(y) FROM t1",
    "SELECT sum(big) FROM t1",
    "SELECT count(*) FROM t1 WHERE x > 0",
    "SELECT count(*) FROM t1 WHERE x > 0 AND y < 50.0",
    "SELECT count(*) FROM t1 WHERE x IS NULL OR y IS NULL",
    "SELECT count(*) FROM t1 WHERE x BETWEEN -10 AND 10",
    "SELECT count(*) FROM t1 WHERE x IN (1, 2, 3, 5, 8, 13, 21)",
    "SELECT count(*) FROM t1 WHERE x NOT IN (1, 2, 3)",
    "SELECT count(*) FROM t1 WHERE s = 'red'",
    "SELECT count(*) FROM t1 WHERE s <> 'red'",
    "SELECT count(*) FROM t1 WHERE s LIKE 'r%'",
    "SELECT count(*) FROM t1 WHERE s LIKE '%e%'",
    "SELECT count(*) FROM t1 WHERE s IN ('red', 'blue')",
    "SELECT count(*) FROM t1 WHERE s IS NULL",
    "SELECT count(*) FROM t1 WHERE x % 2 = 0",
    "SELECT count(*) FROM t1 WHERE -x > 10",
    "SELECT x FROM t1 WHERE x IS NOT NULL ORDER BY x, big LIMIT 10",
    "SELECT x, y FROM t1 WHERE x = 17",
    "SELECT DISTINCT k FROM t1 ORDER BY k",
    "SELECT DISTINCT s FROM t1 ORDER BY s NULLS LAST",
    "SELECT count(DISTINCT x) FROM t1",
    "SELECT count(DISTINCT s) FROM t1",
    "SELECT k, count(*) FROM t1 GROUP BY k ORDER BY k",
    "SELECT k, count(*), sum(x), avg(y), min(y), max(x) FROM t1 GROUP BY k ORDER BY k",
    "SELECT s, count(*) FROM t1 GROUP BY s ORDER BY s NULLS LAST",
    "SELECT s, k, count(*) FROM t1 GROUP BY s, k ORDER BY s NULLS LAST, k",
    "SELECT x % 5, count(*) FROM t1 WHERE x IS NOT NULL GROUP BY 1 ORDER BY 1",
    "SELECT k, count(*) c FROM t1 GROUP BY k HAVING count(*) > 90 ORDER BY k",
    "SELECT k, sum(y) FROM t1 GROUP BY k HAVING sum(y) > 0 ORDER BY k",
    "SELECT k FROM t1 GROUP BY k HAVING min(x) IS NOT NULL ORDER BY k",
    "SELECT CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END sg, count(*) "
    "FROM t1 WHERE x IS NOT NULL GROUP BY sg ORDER BY sg",
    "SELECT k * 2 + 1, count(*) FROM t1 GROUP BY 1 ORDER BY 1",
    "SELECT abs(x) a, count(*) FROM t1 WHERE x IS NOT NULL GROUP BY a ORDER BY a LIMIT 5",
    "SELECT x, count(*) FROM t1 GROUP BY x ORDER BY x NULLS LAST",
    "SELECT big, count(*) FROM t1 GROUP BY big ORDER BY big LIMIT 20",
    "SELECT y FROM t1 ORDER BY y NULLS LAST LIMIT 10",
    "SELECT y FROM t1 ORDER BY y DESC NULLS FIRST LIMIT 10",
    "SELECT x, y, s FROM t1 ORDER BY x NULLS LAST, y NULLS LAST, s NULLS LAST LIMIT 25",
    "SELECT s FROM t1 ORDER BY s NULLS FIRST LIMIT 30",
    "SELECT x + y FROM t1 WHERE x IS NOT NULL AND y IS NOT NULL ORDER BY 1 LIMIT 5",
    "SELECT max(x) - min(x) FROM t1",
    "SELECT count(*) FROM t1, t2 WHERE t1.k = t2.k",
    "SELECT t1.k, count(*) FROM t1, t2 WHERE t1.k = t2.k GROUP BY t1.k ORDER BY t1.k",
    "SELECT t2.tag, sum(t1.x) FROM t1 JOIN t2 ON t1.k = t2.k "
    "GROUP BY t2.tag ORDER BY t2.tag",
    "SELECT count(*) FROM t1 JOIN t2 ON t1.s = t2.tag",
    "SELECT count(*) FROM t1 LEFT JOIN t2 ON t1.k = t2.k",
    "SELECT count(*) FROM t1 LEFT JOIN t2 ON t1.k = t2.k WHERE t2.k IS NULL",
    "SELECT sum(t1.x + t2.w) FROM t1 JOIN t2 ON t1.k = t2.k",
    "SELECT count(*) FROM t1 WHERE k IN (SELECT k FROM t2 WHERE w > 5.0)",
    "SELECT count(*) FROM t1 WHERE x = (SELECT max(k) FROM t2)",
    "SELECT sub.k, sub.c FROM (SELECT k, count(*) c FROM t1 GROUP BY k) sub "
    "WHERE sub.c > 95 ORDER BY sub.k",
    "SELECT k FROM t1 WHERE x > 40 UNION ALL SELECT k FROM t2 WHERE w > 9.0",
    "SELECT k FROM t1 WHERE x > 40 UNION SELECT k FROM t2 WHERE w > 9.0 ORDER BY k",
    "SELECT CAST(y AS INT) FROM t1 WHERE y IS NOT NULL ORDER BY 1 LIMIT 5",
    "SELECT CAST(x AS DOUBLE) / 4 FROM t1 WHERE x = 10 LIMIT 1",
    "SELECT COALESCE(x, 0), COALESCE(s, 'none') FROM t1 ORDER BY 1, 2 LIMIT 10",
    "SELECT NULLIF(k, 5) FROM t1 ORDER BY 1 NULLS FIRST LIMIT 3",
    "SELECT k, CASE WHEN sum(y) > 0 THEN 'pos' ELSE 'neg' END FROM t1 "
    "GROUP BY k ORDER BY k",
    "SELECT min(s), max(s) FROM t1",
    "SELECT k, min(s) FROM t1 GROUP BY k ORDER BY k",
]


@pytest.mark.parametrize("sql", QUERIES, ids=lambda q: q[:60])
def test_oracle(oracle, sql):
    oracle.check(sql)


def test_oracle_int_division(oracle):
    # sqlite / on ints truncates like ours
    oracle.check("SELECT x / 3 FROM t1 WHERE x IS NOT NULL ORDER BY x LIMIT 7")


def test_oracle_update_delete(oracle):
    for s in [
        "UPDATE t1 SET x = x + 100 WHERE k = 3",
        "DELETE FROM t1 WHERE k = 7",
        "UPDATE t1 SET y = 0.0 WHERE y IS NULL",
    ]:
        oracle.db.sql(s)
        oracle.lite.execute(s)
    oracle.check("SELECT count(*), sum(x), sum(y) FROM t1")
    oracle.check("SELECT k, count(*) FROM t1 GROUP BY k ORDER BY k")
