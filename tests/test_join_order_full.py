"""Join reordering (reference FromTableReordering.cpp) and FULL OUTER JOIN
(round-2 additions) — differential-checked against numpy/sqlite oracles."""

import sqlite3

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def db():
    return hdt.connect()


def test_reorder_small_probe_parity(db, rng):
    n = 50_000
    k = rng.integers(0, 500, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    db.load_table("fact", {"k": k, "v": v}, create=True)
    db.load_table(
        "dim",
        {"k": np.arange(500, dtype=np.int32),
         "nm": rng.integers(0, 20, 500).astype(np.int32)},
        create=True,
    )
    a = db.sql(
        "SELECT d.nm, count(*), sum(f.v) FROM fact f JOIN dim d "
        "ON f.k = d.k GROUP BY d.nm ORDER BY d.nm"
    ).rows()
    b = db.sql(
        "SELECT d.nm, count(*), sum(f.v) FROM dim d JOIN fact f "
        "ON d.k = f.k GROUP BY d.nm ORDER BY d.nm"
    ).rows()
    assert len(a) == len(b) == 20
    for x, y in zip(a, b):
        assert x[0] == y[0] and x[1] == y[1]
        assert x[2] == pytest.approx(y[2], rel=1e-5)


def test_reorder_flips_probe_side(db, rng):
    # the plan itself must flip: big table becomes the probe (input 0)
    db.load_table(
        "big", {"k": rng.integers(0, 100, 10_000).astype(np.int32)},
        create=True,
    )
    db.load_table("small", {"k": np.arange(100, dtype=np.int32)}, create=True)
    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.plan import rel_alg as R
    from heavydb_tpu.sql.parser import parse

    stmt = parse("SELECT count(*) FROM small s JOIN big b ON s.k = b.k")
    plan = optimize(db._plan_select(stmt))
    assert isinstance(plan, R.Compound)
    assert plan.inputs[0].table.name == "big"  # probe = larger table
    assert plan.inputs[1].table.name == "small"


def test_reorder_three_way_parity(db, rng):
    n = 20_000
    db.load_table(
        "f3", {"k": rng.integers(0, 300, n).astype(np.int32),
               "v": rng.integers(0, 100, n).astype(np.int32)}, create=True)
    db.load_table(
        "m3", {"k": rng.integers(0, 300, 2000).astype(np.int32),
               "g": rng.integers(0, 9, 2000).astype(np.int32)}, create=True)
    db.load_table("d3", {"k": np.arange(300, dtype=np.int32)}, create=True)
    orders = [
        "f3 f JOIN m3 m ON f.k=m.k JOIN d3 d ON m.k=d.k",
        "d3 d JOIN m3 m ON d.k=m.k JOIN f3 f ON m.k=f.k",
        "m3 m JOIN d3 d ON m.k=d.k JOIN f3 f ON d.k=f.k",
    ]
    results = [
        db.sql(f"SELECT m.g, count(*), sum(f.v) FROM {o} "
               "GROUP BY m.g ORDER BY m.g").rows()
        for o in orders
    ]
    assert results[0] == results[1] == results[2]


def _sqlite_with(tables):
    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    for name, cols, rows in tables:
        cur.execute(f"CREATE TABLE {name} ({cols})")
        ph = ",".join("?" * len(rows[0]))
        cur.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
    return cur


def test_full_outer_join_oracle(db, rng):
    n_l, n_r = 4000, 3000
    lk = rng.integers(0, 2000, n_l)
    lk = np.where(rng.random(n_l) < 0.05, -(2**31), lk).astype(np.int32)
    lv = rng.integers(0, 100, n_l).astype(np.int32)
    rk = rng.integers(1000, 3000, n_r).astype(np.int32)
    rv = rng.integers(0, 100, n_r).astype(np.int32)
    db.sql("CREATE TABLE fl (k INT, v INT)")
    db.catalog.get_table("fl").insert_columns({1: lk, 2: lv})
    db.load_table("fr", {"k": rk, "v": rv}, create=True)
    lrows = [(None if k == -(2**31) else int(k), int(v))
             for k, v in zip(lk, lv)]
    rrows = [(int(k), int(v)) for k, v in zip(rk, rv)]
    cur = _sqlite_with([("fl", "k INT, v INT", lrows),
                        ("fr", "k INT, v INT", rrows)])
    q = ("SELECT count(*), count(fl.v), count(fr.v), sum(fl.v), sum(fr.v) "
         "FROM fl FULL OUTER JOIN fr ON fl.k = fr.k")
    mine = db.sql(q).rows()[0]
    want = cur.execute(q).fetchone()
    assert tuple(mine) == tuple(want)


def test_full_outer_groupby_oracle(db):
    lrows = [(1, "a"), (2, "b"), (3, "c"), (None, "d"), (2, "e")]
    rrows = [(2, 10), (4, 20), (None, 30), (2, 40)]
    db.sql("CREATE TABLE lg (k INT, s TEXT)")
    db.sql("CREATE TABLE rg (k INT, v INT)")
    for k, s in lrows:
        db.sql(f"INSERT INTO lg VALUES ({k if k is not None else 'NULL'},'{s}')")
    for k, v in rrows:
        db.sql(f"INSERT INTO rg VALUES ({k if k is not None else 'NULL'},{v})")
    cur = _sqlite_with([("lg", "k INT, s TEXT", lrows),
                        ("rg", "k INT, v INT", rrows)])
    mine = [tuple(r) for r in db.sql(
        "SELECT rg.v, count(*), count(lg.s) FROM lg FULL JOIN rg "
        "ON lg.k = rg.k GROUP BY rg.v ORDER BY rg.v NULLS FIRST"
    ).rows()]
    want = cur.execute(
        "SELECT rg.v, count(*), count(lg.s) FROM lg FULL JOIN rg "
        "ON lg.k = rg.k GROUP BY rg.v ORDER BY rg.v IS NOT NULL, rg.v"
    ).fetchall()
    assert mine == want


def test_full_outer_projection_nullability(db):
    db.sql("CREATE TABLE pa (k INT)")
    db.sql("CREATE TABLE pb (k INT)")
    db.sql("INSERT INTO pa VALUES (1), (2)")
    db.sql("INSERT INTO pb VALUES (2), (3)")
    rows = sorted(
        db.sql("SELECT pa.k, pb.k FROM pa FULL JOIN pb ON pa.k = pb.k").rows(),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert rows == [(1, None), (2, 2), (None, 3)]


def test_fragment_skipping_consistent_around_outer_joins(rng):
    """Pruning scan fragments via simple comparison quals is
    semantics-preserving even around FULL/LEFT joins (comparison quals
    never pass on NULL-extended rows, so both paths drop them)."""
    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config

    n = 60_000
    lk = rng.integers(0, 3000, n).astype(np.int32)
    lv = rng.integers(0, 1000, n).astype(np.int32)
    rk = rng.integers(1500, 4500, 20_000).astype(np.int32)
    rv = rng.integers(0, 1000, 20_000).astype(np.int32)

    def run(frag):
        db = hdt.connect(config=Config(default_fragment_rows=frag))
        db.load_table("l", {"k": lk, "v": lv}, create=True)
        db.load_table("r", {"k": rk, "v": rv}, create=True)
        return [
            db.sql("SELECT count(*), count(l.v), count(r.v) FROM l "
                   "FULL JOIN r ON l.k = r.k WHERE l.v > 500").rows(),
            db.sql("SELECT count(*) FROM l FULL JOIN r ON l.k = r.k "
                   "WHERE r.v < 100").rows(),
            db.sql("SELECT count(*) FROM l LEFT JOIN r ON l.k = r.k "
                   "WHERE l.v BETWEEN 100 AND 200").rows(),
        ]

    assert run(100_000) == run(8_000)


def test_left_join_residual_conditions(db):
    """LEFT JOIN with non-equi ON conditions: a pair failing the residual
    is not a match, so the probe row null-extends (ON-clause semantics,
    NOT WHERE semantics).  Reference: join quals vs filter quals split in
    QueryEngine/JoinFilterPushDown."""
    import sqlite3

    db.sql("CREATE TABLE lo (k INT, d INT)")
    db.load_table("lo", {"k": [1, 2, 3, None], "d": [10, 20, 30, 5]})
    db.sql("CREATE TABLE ll (k INT, s INT, w DOUBLE)")
    db.load_table("ll", {"k": [1, 1, 2, 3], "s": [5, 15, 19, 40],
                         "w": [1.0, 2.0, 3.0, 4.0]})
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE lo (k INT, d INT)")
    con.executemany("INSERT INTO lo VALUES (?,?)",
                    [(1, 10), (2, 20), (3, 30), (None, 5)])
    con.execute("CREATE TABLE ll (k INT, s INT, w DOUBLE)")
    con.executemany("INSERT INTO ll VALUES (?,?,?)",
                    [(1, 5, 1.0), (1, 15, 2.0), (2, 19, 3.0), (3, 40, 4.0)])
    for q in [
        "SELECT lo.k, lo.d, ll.s, ll.w FROM lo LEFT JOIN ll "
        "ON lo.k = ll.k AND ll.s > lo.d "
        "ORDER BY lo.k NULLS LAST, ll.s NULLS LAST",
        "SELECT lo.k, count(ll.s) FROM lo LEFT JOIN ll "
        "ON lo.k = ll.k AND ll.s > lo.d GROUP BY lo.k "
        "ORDER BY lo.k NULLS LAST",
        "SELECT lo.k, sum(ll.w) FROM lo LEFT JOIN ll "
        "ON lo.k = ll.k AND ll.s <> lo.d + 5 GROUP BY lo.k "
        "ORDER BY lo.k NULLS LAST",
        "SELECT lo.k, ll.s FROM lo LEFT JOIN ll "
        "ON lo.k = ll.k AND ll.s < 10 "
        "ORDER BY lo.k NULLS LAST, ll.s NULLS LAST",
    ]:
        assert [tuple(r) for r in db.sql(q).rows()] == \
            con.execute(q).fetchall(), q


def test_semi_anti_residual_conditions(db):
    """EXISTS/NOT EXISTS with correlated non-equality predicates evaluate
    the residual over candidate pairs (TPC-H Q4/Q21 shape)."""
    import sqlite3

    db.sql("CREATE TABLE so (k INT, d INT)")
    db.load_table("so", {"k": [1, 2, 3, None], "d": [10, 20, 30, 5]})
    db.sql("CREATE TABLE sl (k INT, s INT)")
    db.load_table("sl", {"k": [1, 1, 2, 3], "s": [5, 15, 19, 40]})
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE so (k INT, d INT)")
    con.executemany("INSERT INTO so VALUES (?,?)",
                    [(1, 10), (2, 20), (3, 30), (None, 5)])
    con.execute("CREATE TABLE sl (k INT, s INT)")
    con.executemany("INSERT INTO sl VALUES (?,?)",
                    [(1, 5), (1, 15), (2, 19), (3, 40)])
    for q in [
        "SELECT k FROM so WHERE EXISTS (SELECT 1 FROM sl "
        "WHERE sl.k = so.k AND sl.s > so.d) ORDER BY k",
        "SELECT k, d FROM so WHERE NOT EXISTS (SELECT 1 FROM sl "
        "WHERE sl.k = so.k AND sl.s > so.d) ORDER BY k NULLS LAST",
        "SELECT k FROM so WHERE EXISTS (SELECT 1 FROM sl "
        "WHERE sl.k = so.k AND sl.s <> so.d AND sl.s < 20) ORDER BY k",
    ]:
        assert [tuple(r) for r in db.sql(q).rows()] == \
            con.execute(q).fetchall(), q


def test_outer_join_null_rejection_rule(db):
    """LEFT→INNER under a null-rejecting WHERE conjunct (reference
    HeavyDBPlanner OuterJoinOptViaNullRejectionRule) — verified both in
    the plan (join kind flips) and differentially vs sqlite."""
    import sqlite3

    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.sql.parser import parse

    db.sql("CREATE TABLE njl (x INT)")
    db.load_table("njl", {"x": [1, 2, 3, 4, None]})
    db.sql("CREATE TABLE njr (y INT, v INT)")
    db.load_table("njr", {"y": [2, 3, 3], "v": [10, -5, None]})

    def kinds(sql):
        node = optimize(db._plan_select(parse(sql)))
        out = []

        def walk(n):
            if hasattr(n, "join_levels"):
                out.extend(k for k, _ in n.join_levels)
            for i in n.inputs:
                walk(i)

        walk(node)
        return out

    assert kinds("SELECT * FROM njl LEFT JOIN njr ON njl.x=njr.y "
                 "WHERE njr.v > 0") == ["INNER"]
    assert kinds("SELECT * FROM njl LEFT JOIN njr ON njl.x=njr.y "
                 "WHERE njr.v IS NULL") == ["LEFT"]
    assert kinds("SELECT * FROM njl LEFT JOIN njr ON njl.x=njr.y "
                 "WHERE njr.v > 0 OR njl.x = 1") == ["LEFT"]
    assert kinds("SELECT * FROM njl LEFT JOIN njr ON njl.x=njr.y "
                 "WHERE njr.v > 0 OR njr.y = 3") == ["INNER"]
    assert kinds("SELECT * FROM njl FULL OUTER JOIN njr ON njl.x=njr.y "
                 "WHERE njl.x > 0") == ["LEFT"]
    assert kinds("SELECT * FROM njl FULL OUTER JOIN njr ON njl.x=njr.y "
                 "WHERE njl.x > 0 AND njr.v IS NOT NULL") == ["INNER"]

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE njl (x INT)")
    con.executemany("INSERT INTO njl VALUES (?)",
                    [(1,), (2,), (3,), (4,), (None,)])
    con.execute("CREATE TABLE njr (y INT, v INT)")
    con.executemany("INSERT INTO njr VALUES (?,?)",
                    [(2, 10), (3, -5), (3, None)])
    for q in [
        "SELECT njl.x, njr.v FROM njl LEFT JOIN njr ON njl.x=njr.y "
        "WHERE njr.v > 0 ORDER BY njl.x",
        "SELECT njl.x FROM njl LEFT JOIN njr ON njl.x=njr.y "
        "WHERE njr.v IS NULL ORDER BY njl.x NULLS LAST",
        "SELECT njl.x, njr.v FROM njl LEFT JOIN njr ON njl.x=njr.y "
        "WHERE njr.v > 0 OR njl.x = 1 ORDER BY njl.x",
        "SELECT njl.x, njr.y FROM njl LEFT JOIN njr ON njl.x=njr.y "
        "WHERE NOT (njr.v = 10) ORDER BY njl.x, njr.v",
        "SELECT njl.x, njr.y, njr.v FROM njl FULL OUTER JOIN njr "
        "ON njl.x=njr.y WHERE njl.x > 0 AND njr.v IS NOT NULL "
        "ORDER BY njl.x, njr.v",
    ]:
        assert [tuple(r) for r in db.sql(q).rows()] == \
            con.execute(q).fetchall(), q
