"""Correlated scalar subqueries + quantified ANY/SOME/ALL comparisons.

Reference: Calcite decorrelates these during planning (RelDecorrelator,
SubQueryRemoveRule); the reference's ExecuteTest exercises the results.
Correlated scalar aggregates become LEFT JOINs against the subquery
re-grouped by its correlation keys (select_planner._decorrelate_scalar);
quantified comparisons expand to IN / guarded MIN-MAX scalar aggregates
(builder._bind_quant_subquery).
"""

import sqlite3

import pytest


@pytest.fixture()
def pair(db):
    rows_li = [(1, 5, 10.0), (1, 50, 20.0), (2, 3, 30.0), (2, 4, 40.0),
               (3, 100, 5.0), (None, 7, 1.0)]
    rows_p = [(1, "A"), (2, "B"), (3, "A"), (4, "C")]
    db.sql("CREATE TABLE li (pk INT, qty INT, price DOUBLE)")
    db.load_table("li", {"pk": [r[0] for r in rows_li],
                         "qty": [r[1] for r in rows_li],
                         "price": [r[2] for r in rows_li]})
    db.sql("CREATE TABLE p (pk INT, brand TEXT)")
    db.load_table("p", {"pk": [r[0] for r in rows_p],
                        "brand": [r[1] for r in rows_p]})
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE li (pk INT, qty INT, price DOUBLE)")
    con.executemany("INSERT INTO li VALUES (?,?,?)", rows_li)
    con.execute("CREATE TABLE p (pk INT, brand TEXT)")
    con.executemany("INSERT INTO p VALUES (?,?)", rows_p)
    return db, con


CORRELATED = [
    # TPC-H Q17 shape: correlated average threshold
    "SELECT sum(price) FROM li l WHERE qty < "
    "(SELECT 0.5*avg(qty) FROM li l2 WHERE l2.pk = l.pk)",
    # select-list scalar aggregates
    "SELECT p.pk, (SELECT sum(qty) FROM li WHERE li.pk = p.pk) "
    "FROM p ORDER BY p.pk",
    # COUNT over an empty correlated set must be 0, not NULL
    "SELECT p.pk, (SELECT count(*) FROM li WHERE li.pk = p.pk) "
    "FROM p ORDER BY p.pk",
    "SELECT p.pk, (SELECT count(*) FROM li WHERE li.pk = p.pk AND qty > 4) "
    "FROM p ORDER BY p.pk",
    # in WHERE with local residual filters
    "SELECT p.pk FROM p WHERE "
    "(SELECT max(qty) FROM li WHERE li.pk = p.pk) > 10 ORDER BY p.pk",
    "SELECT p.pk, (SELECT avg(price) FROM li WHERE li.pk = p.pk "
    "AND li.qty < 60) FROM p ORDER BY p.pk",
    # two scalar subqueries in one query (chained LEFT JOINs)
    "SELECT p.pk, (SELECT min(qty) FROM li WHERE li.pk = p.pk), "
    "(SELECT max(qty) FROM li WHERE li.pk = p.pk) FROM p ORDER BY p.pk",
]


@pytest.mark.parametrize("q", CORRELATED)
def test_correlated_scalar_subquery(pair, q):
    db, con = pair
    assert [tuple(r) for r in db.sql(q).rows()] == con.execute(q).fetchall()


# sqlite has no quantified comparisons — expectations computed by hand over
# qty = {5, 50, 3, 4, 100, 7}
QUANTIFIED = [
    # S = {3, 4} (pk = 2)
    ("SELECT count(*) FROM li WHERE qty > ANY "
     "(SELECT qty FROM li WHERE pk = 2)", 5),
    ("SELECT count(*) FROM li WHERE qty >= ALL "
     "(SELECT qty FROM li WHERE pk = 2)", 5),
    # empty sets: ANY → FALSE, ALL → TRUE
    ("SELECT count(*) FROM li WHERE qty > ANY "
     "(SELECT qty FROM li WHERE pk = 99)", 0),
    ("SELECT count(*) FROM li WHERE qty > ALL "
     "(SELECT qty FROM li WHERE pk = 99)", 6),
    # = ANY ≡ IN; <> ALL ≡ NOT IN   (S = {5, 50})
    ("SELECT count(*) FROM li WHERE qty = ANY "
     "(SELECT qty FROM li WHERE pk = 1)", 2),
    ("SELECT count(*) FROM li WHERE qty <> ALL "
     "(SELECT qty FROM li WHERE pk = 1)", 4),
    ("SELECT count(*) FROM li WHERE qty = ALL "
     "(SELECT qty FROM li WHERE qty = 100)", 1),
    # S = {5, 50, 3, 4}: every qty differs from something in S
    ("SELECT count(*) FROM li WHERE qty <> ANY "
     "(SELECT qty FROM li WHERE pk <= 2)", 6),
    # SOME ≡ ANY   (qty < 50: {5, 3, 4, 7})
    ("SELECT count(*) FROM li WHERE qty < SOME "
     "(SELECT qty FROM li WHERE pk = 1)", 4),
]


@pytest.mark.parametrize("q,expect", QUANTIFIED)
def test_quantified_subquery(pair, q, expect):
    db, _ = pair
    assert db.sql(q).rows()[0][0] == expect
