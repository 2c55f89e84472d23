"""Randomized differential SQL fuzz vs the SQLite oracle (round-2: the
reference's ExecuteTest covers ~31k LoC of SQL; we generate queries from a
grammar seeded deterministically so failures reproduce).

Grammar: projections/filters over scalar expressions (arith, CASE,
COALESCE/NULLIF, IN/BETWEEN/LIKE, 3-valued NULL logic), GROUP BY with
HAVING, INNER/LEFT joins, ORDER BY + LIMIT with full tie-breaking,
UNION ALL, IN-subqueries."""

import random

import numpy as np
import pytest

from tests.test_sqlite_oracle import Oracle, _norm_rows


@pytest.fixture(scope="module")
def fdb():
    import heavydb_tpu as hdt

    return hdt.connect()


@pytest.fixture(scope="module")
def foracle(fdb):
    rng = np.random.default_rng(20260817)
    o = Oracle(fdb)
    n = 1200
    x = [int(v) if i % 11 else None
         for i, v in enumerate(rng.integers(-50, 50, n))]
    y = [float(round(v, 3)) if i % 7 else None
         for i, v in enumerate(rng.normal(0, 100, n))]
    s = [None if i % 13 == 0
         else ["red", "green", "blue", "amber", "plum"][v]
         for i, v in enumerate(rng.integers(0, 5, n))]
    s2 = [None if i % 17 == 0
          else ["ash", "oak", "elm", "fir"][v]
          for i, v in enumerate(rng.integers(0, 4, n))]
    k = [int(v) for v in rng.integers(0, 20, n)]
    big = [int(v) for v in rng.integers(-(2**40), 2**40, n)]
    o.load(
        "f1", {"x": x, "y": y, "s": s, "s2": s2, "k": k, "big": big},
        {"x": "INT", "y": "DOUBLE", "s": "TEXT", "s2": "TEXT", "k": "INT",
         "big": "BIGINT"},
    )
    m = 200
    o.load(
        "f2",
        {"k": [int(v) for v in rng.integers(0, 25, m)],
         "w": [float(round(v, 2)) for v in rng.uniform(0, 10, m)],
         "tag": [["red", "green", "cyan"][v]
                 for v in rng.integers(0, 3, m)]},
        {"k": "INT", "w": "DOUBLE", "tag": "TEXT"},
    )
    return o


class Gen:
    """Deterministic random query generator."""

    INT_COLS = ["x", "k"]
    NUM_COLS = ["x", "k", "y"]
    STR_COLS = ["s"]

    def __init__(self, seed):
        self.r = random.Random(seed)

    def int_expr(self, depth=0):
        r = self.r
        if depth > 1 or r.random() < 0.4:
            return r.choice(self.INT_COLS + [str(r.randint(-20, 20))])
        kind = r.randint(0, 4)
        a, b = self.int_expr(depth + 1), self.int_expr(depth + 1)
        if kind == 0:
            return f"({a} + {b})"
        if kind == 1:
            return f"({a} - {b})"
        if kind == 2:
            return f"({a} * {r.randint(1, 5)})"
        if kind == 3:
            return f"ABS({a})"
        return f"COALESCE({a}, {r.randint(-5, 5)})"

    def predicate(self, depth=0):
        r = self.r
        if depth < 1 and r.random() < 0.4:
            op = r.choice(["AND", "OR"])
            p = f"({self.predicate(depth + 1)} {op} {self.predicate(depth + 1)})"
            return f"NOT {p}" if r.random() < 0.2 else p
        kind = r.randint(0, 7)
        if kind == 0:
            return (f"{self.int_expr()} "
                    f"{r.choice(['<', '<=', '>', '>=', '=', '<>'])} "
                    f"{self.int_expr()}")
        if kind == 1:
            c = r.choice(self.NUM_COLS + self.STR_COLS)
            return f"{c} IS {r.choice(['NULL', 'NOT NULL'])}"
        if kind == 2:
            vals = ", ".join(str(r.randint(-30, 30))
                             for _ in range(r.randint(1, 5)))
            return f"{r.choice(self.INT_COLS)} IN ({vals})"
        if kind == 3:
            lo = r.randint(-40, 10)
            return f"{r.choice(self.INT_COLS)} BETWEEN {lo} AND {lo + r.randint(0, 40)}"
        if kind == 4:
            pat = r.choice(["r%", "%e%", "_lu%", "%ed", "gr__n"])
            return f"s LIKE '{pat}'"
        if kind == 5:
            return f"s = '{r.choice(['red', 'green', 'blue', 'amber'])}'"
        if kind == 6:
            # two-dict-column string comparisons (pairwise rank tables)
            return f"s {r.choice(['<', '<=', '>', '>=', '=', '<>'])} s2"
        return f"y {r.choice(['<', '>'])} {r.randint(-100, 100)}"

    def agg(self):
        r = self.r
        k = r.randint(0, 5)
        if k == 0:
            return "count(*)"
        if k == 1:
            return f"count({r.choice(self.NUM_COLS + self.STR_COLS)})"
        if k == 2:
            return f"sum({r.choice(self.INT_COLS)})"
        if k == 3:
            return f"min({r.choice(self.NUM_COLS)})"
        if k == 4:
            return f"max({r.choice(self.NUM_COLS)})"
        return f"avg({r.choice(self.NUM_COLS)})"

    def query(self):
        r = self.r
        shape = r.randint(0, 10)
        if shape == 0:  # filtered aggregate
            aggs = ", ".join(self.agg() for _ in range(r.randint(1, 3)))
            return f"SELECT {aggs} FROM f1 WHERE {self.predicate()}"
        if shape == 1:  # group-by
            g = r.choice(["k", "s", "(x % 5)", "(k % 7)"])
            aggs = ", ".join(self.agg() for _ in range(r.randint(1, 2)))
            q = f"SELECT {g}, {aggs} FROM f1"
            if r.random() < 0.6:
                q += f" WHERE {self.predicate()}"
            q += f" GROUP BY {g}"
            if r.random() < 0.4:
                q += f" HAVING count(*) > {r.randint(0, 20)}"
            return q
        if shape == 2:  # join aggregate
            import re

            def qual(text):
                return re.sub(r"\b([xysk])\b", r"f1.\1", text)

            jk = r.choice(["INNER", "LEFT"])
            agg = qual(self.agg())
            q = (f"SELECT count(*), {agg} FROM f1 {jk} JOIN f2 "
                 f"ON f1.k = f2.k")
            if r.random() < 0.5:
                q += f" WHERE {qual(self.predicate())}"
            return q
        if shape == 3:  # projection + order + limit (fully tie-broken)
            e = self.int_expr()
            return (f"SELECT x, k, {e} FROM f1 WHERE {self.predicate()} "
                    "ORDER BY 3 NULLS FIRST, x NULLS FIRST, k, big "
                    f"LIMIT {r.randint(1, 50)}")
        if shape == 4:  # CASE projection aggregate
            thr = r.randint(-20, 20)
            return (f"SELECT sum(CASE WHEN x > {thr} THEN 1 ELSE 0 END), "
                    f"count(CASE WHEN s = 'red' THEN 1 END) FROM f1")
        if shape == 5:  # IN-subquery
            return (f"SELECT count(*) FROM f1 WHERE k IN "
                    f"(SELECT k FROM f2 WHERE w < {r.randint(1, 9)})")
        if shape == 6:  # set ops (INTERSECT/EXCEPT/UNION dedup semantics)
            op = r.choice(["INTERSECT", "EXCEPT", "UNION", "UNION ALL"])
            return (f"SELECT k FROM f1 WHERE {self.predicate()} "
                    f"{op} SELECT k FROM f2 WHERE w < {r.randint(2, 9)} "
                    "ORDER BY 1 NULLS FIRST")
        if shape == 7:  # DISTINCT aggregates
            c = r.choice(self.INT_COLS)
            q = (f"SELECT count(DISTINCT {c}), count(DISTINCT s), "
                 f"sum(DISTINCT {c}) FROM f1")
            if r.random() < 0.6:
                q += f" WHERE {self.predicate()}"
            return q
        if shape == 8:  # correlated EXISTS / NOT EXISTS
            neg = r.choice(["", "NOT "])
            cmpo = r.choice(["<", ">", "="])
            return (f"SELECT count(*) FROM f1 WHERE {neg}EXISTS "
                    f"(SELECT 1 FROM f2 WHERE f2.k = f1.k "
                    f"AND f2.w {cmpo} {r.randint(1, 9)})")
        if shape == 9:  # string-function projection aggregate
            fn = r.choice(["LENGTH(s)", "UPPER(s)", "LOWER(s)",
                           "SUBSTR(s, 1, 2)"])
            return (f"SELECT s, count(*), min({fn}) FROM f1 "
                    f"WHERE {self.predicate()} GROUP BY s "
                    "ORDER BY 1 NULLS FIRST")
        # pairwise string ops: col || col concat group-by / projection
        e = r.choice(["s || s2", "s || '-' || s2", "UPPER(s) || s2",
                      "s || LOWER(s2)"])
        if r.random() < 0.5:
            return (f"SELECT {e}, count(*) FROM f1 "
                    f"WHERE {self.predicate()} GROUP BY {e} "
                    "ORDER BY 1 NULLS FIRST, 2")
        return (f"SELECT x, k, {e} FROM f1 WHERE {self.predicate()} "
                "ORDER BY 3 NULLS FIRST, x NULLS FIRST, k, big "
                f"LIMIT {r.randint(1, 40)}")


N_QUERIES = 360


@pytest.mark.parametrize("batch", range(12))
def test_fuzz_batch(foracle, batch):
    gen = Gen(9000 + batch)
    per = N_QUERIES // 12
    for qi in range(per):
        q = gen.query()
        try:
            foracle.check(q)
        except Exception as e:
            raise AssertionError(
                f"seed={9000 + batch} #{qi}: {q}\n{type(e).__name__}: {e}"
            ) from None
