"""Engine behavior tests (reference Tests/ExecuteTest.cpp patterns)."""

import datetime

import numpy as np
import pytest

from heavydb_tpu.errors import (
    BinderError,
    CatalogError,
    DivisionByZero,
    SqlError,
)


@pytest.fixture()
def tdb(db):
    db.sql("CREATE TABLE t (x INT, y DOUBLE, s TEXT, d DATE, b BOOLEAN)")
    db.sql(
        "INSERT INTO t VALUES "
        "(1, 2.5, 'foo', '2020-01-01', 'true'), "
        "(2, NULL, 'bar', '2020-06-15', 'false'), "
        "(3, 7.5, 'foo', NULL, NULL), "
        "(NULL, 1.0, NULL, '2021-03-03', 'true')"
    )
    return db


def test_count_star(tdb):
    assert tdb.sql("SELECT count(*) FROM t").scalar() == 4


def test_select_star_types(tdb):
    rows = tdb.sql("SELECT * FROM t").rows()
    assert rows[0] == (1, 2.5, "foo", datetime.date(2020, 1, 1), True)
    assert rows[1][1] is None
    assert rows[3][0] is None and rows[3][2] is None


def test_filter_comparisons(tdb):
    assert tdb.sql("SELECT count(*) FROM t WHERE x > 1").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE x IS NULL").scalar() == 1
    assert tdb.sql("SELECT count(*) FROM t WHERE y IS NOT NULL").scalar() == 3
    assert tdb.sql("SELECT count(*) FROM t WHERE x BETWEEN 2 AND 3").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE x IN (1, 3)").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE x NOT IN (1, 3)").scalar() == 1


def test_three_valued_logic(tdb):
    # NULL OR TRUE = TRUE; NULL AND FALSE = FALSE; NOT NULL = NULL
    assert tdb.sql("SELECT count(*) FROM t WHERE y > 100 OR x >= 1").scalar() == 3
    # NULL AND FALSE = FALSE → NOT gives TRUE for every row
    assert (
        tdb.sql("SELECT count(*) FROM t WHERE NOT (y > 100 AND x < 0)").scalar() == 4
    )
    # NULL OR FALSE = NULL → NOT NULL = NULL → row excluded
    assert (
        tdb.sql("SELECT count(*) FROM t WHERE NOT (y > 100 OR x < 0)").scalar() == 2
    )


def test_string_predicates(tdb):
    assert tdb.sql("SELECT count(*) FROM t WHERE s = 'foo'").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE s <> 'foo'").scalar() == 1
    assert tdb.sql("SELECT count(*) FROM t WHERE s LIKE 'f%'").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE s ILIKE 'BA_'").scalar() == 1
    assert tdb.sql("SELECT count(*) FROM t WHERE s IN ('foo','baz')").scalar() == 2


def test_arithmetic(tdb):
    rows = tdb.sql("SELECT x + 1, x * 2, x - 1, x / 2, x % 2 FROM t WHERE x = 3").rows()
    assert rows == [(4, 6, 2, 1, 1)]
    assert tdb.sql("SELECT 7 / 2").scalar() == 3
    assert tdb.sql("SELECT -7 / 2").scalar() == -3
    assert tdb.sql("SELECT 7.0 / 2").scalar() == 3.5
    assert tdb.sql("SELECT MOD(-7, 3)").scalar() == -1


def test_division_by_zero(tdb):
    with pytest.raises(DivisionByZero):
        tdb.sql("SELECT x / 0 FROM t")


def test_aggregates(tdb):
    r = tdb.sql(
        "SELECT count(*), count(y), sum(x), avg(y), min(x), max(y) FROM t"
    ).rows()[0]
    assert r == (4, 3, 6, pytest.approx(11.0 / 3), 1, 7.5)


def test_group_by(tdb):
    rows = tdb.sql(
        "SELECT s, count(*), sum(x) FROM t GROUP BY s ORDER BY s"
    ).rows()
    assert rows == [("bar", 1, 2), ("foo", 2, 4), (None, 1, None)]


def test_group_by_having(tdb):
    rows = tdb.sql(
        "SELECT s, count(*) c FROM t GROUP BY s HAVING count(*) > 1"
    ).rows()
    assert rows == [("foo", 2)]


def test_group_by_expr_and_ordinal(tdb):
    rows = tdb.sql(
        "SELECT x % 2 AS par, count(*) FROM t WHERE x IS NOT NULL "
        "GROUP BY 1 ORDER BY 1"
    ).rows()
    assert rows == [(0, 1), (1, 2)]


def test_distinct(tdb):
    rows = tdb.sql("SELECT DISTINCT s FROM t ORDER BY s").rows()
    assert rows == [("bar",), ("foo",), (None,)]
    assert tdb.sql("SELECT count(DISTINCT s) FROM t").scalar() == 2


def test_order_by_nulls(tdb):
    rows = tdb.sql("SELECT x FROM t ORDER BY x").rows()
    assert [r[0] for r in rows] == [1, 2, 3, None]
    rows = tdb.sql("SELECT x FROM t ORDER BY x DESC").rows()
    assert [r[0] for r in rows] == [None, 3, 2, 1]
    rows = tdb.sql("SELECT x FROM t ORDER BY x ASC NULLS FIRST").rows()
    assert [r[0] for r in rows] == [None, 1, 2, 3]


def test_limit_offset(tdb):
    rows = tdb.sql("SELECT x FROM t ORDER BY x NULLS LAST LIMIT 2 OFFSET 1").rows()
    assert [r[0] for r in rows] == [2, 3]


def test_case(tdb):
    rows = tdb.sql(
        "SELECT CASE WHEN x >= 2 THEN 'big' WHEN x = 1 THEN 'small' END "
        "FROM t ORDER BY x NULLS LAST"
    ).rows()
    assert [r[0] for r in rows] == ["small", "big", "big", None]


def test_cast(tdb):
    assert tdb.sql("SELECT CAST(2.7 AS INT)").scalar() == 2
    assert tdb.sql("SELECT CAST(3 AS DOUBLE)").scalar() == 3.0
    assert tdb.sql("SELECT CAST('2020-05-05' AS DATE)").scalar() == datetime.date(
        2020, 5, 5
    )


def test_date_functions(tdb):
    rows = tdb.sql(
        "SELECT EXTRACT(YEAR FROM d), EXTRACT(MONTH FROM d), "
        "EXTRACT(DAY FROM d) FROM t WHERE x = 1"
    ).rows()
    assert rows == [(2020, 1, 1)]
    assert tdb.sql(
        "SELECT EXTRACT(DOW FROM d) FROM t WHERE x = 2"
    ).scalar() == 1  # 2020-06-15 is a Monday; DOW 0=Sunday
    r = tdb.sql("SELECT DATE_TRUNC('month', d) FROM t WHERE x = 2").scalar()
    assert r == datetime.date(2020, 6, 1)


def test_dateadd_datediff(tdb):
    assert tdb.sql(
        "SELECT DATEADD('day', 14, d) FROM t WHERE x = 1"
    ).scalar() == datetime.date(2020, 1, 15)
    assert tdb.sql(
        "SELECT DATEADD('month', 1, CAST('2020-01-31' AS DATE))"
    ).scalar() == datetime.date(2020, 2, 29)
    assert (
        tdb.sql(
            "SELECT DATEDIFF('day', CAST('2020-01-01' AS DATE), "
            "CAST('2020-03-01' AS DATE))"
        ).scalar()
        == 60
    )


def test_booleans(tdb):
    assert tdb.sql("SELECT count(*) FROM t WHERE b").scalar() == 2
    assert tdb.sql("SELECT count(*) FROM t WHERE NOT b").scalar() == 1
    assert tdb.sql("SELECT count(*) FROM t WHERE b IS NULL").scalar() == 1


def test_coalesce_nullif(tdb):
    rows = tdb.sql("SELECT COALESCE(y, -1.0) FROM t ORDER BY x NULLS LAST").rows()
    assert [r[0] for r in rows] == [2.5, -1.0, 7.5, 1.0]
    assert tdb.sql("SELECT NULLIF(1, 1)").scalar() is None


def test_subqueries(tdb):
    assert (
        tdb.sql("SELECT count(*) FROM t WHERE x = (SELECT max(x) FROM t)").scalar()
        == 1
    )
    assert (
        tdb.sql(
            "SELECT count(*) FROM t WHERE s IN (SELECT s FROM t WHERE x = 1)"
        ).scalar()
        == 2
    )
    assert (
        tdb.sql("SELECT count(*) FROM t WHERE EXISTS (SELECT 1 FROM t WHERE x > 10)").scalar()
        == 0
    )


def test_from_subquery(tdb):
    rows = tdb.sql(
        "SELECT s, c FROM (SELECT s, count(*) c FROM t GROUP BY s) sub "
        "WHERE c > 1"
    ).rows()
    assert rows == [("foo", 2)]


def test_union_all(tdb):
    assert (
        tdb.sql(
            "SELECT x FROM t WHERE x = 1 UNION ALL SELECT x FROM t WHERE x > 1"
        ).row_count
        == 3
    )
    rows = tdb.sql("SELECT s FROM t UNION SELECT s FROM t ORDER BY s").rows()
    assert rows == [("bar",), ("foo",), (None,)]


def test_math_functions(tdb):
    assert tdb.sql("SELECT ABS(-5)").scalar() == 5
    assert tdb.sql("SELECT FLOOR(2.7)").scalar() == pytest.approx(2.0)
    assert tdb.sql("SELECT CEIL(2.1)").scalar() == pytest.approx(3.0)
    assert tdb.sql("SELECT ROUND(2.567, 2)").scalar() == pytest.approx(2.57)
    assert tdb.sql("SELECT POWER(2, 10)").scalar() == pytest.approx(1024.0)
    assert tdb.sql("SELECT SQRT(16.0)").scalar() == pytest.approx(4.0)


def test_ddl(db):
    db.sql("CREATE TABLE a (x INT)")
    with pytest.raises(CatalogError):
        db.sql("CREATE TABLE a (x INT)")
    db.sql("CREATE TABLE IF NOT EXISTS a (x INT)")
    db.sql("ALTER TABLE a RENAME TO b")
    db.sql("DROP TABLE b")
    with pytest.raises(CatalogError):
        db.sql("DROP TABLE b")
    db.sql("DROP TABLE IF EXISTS b")


def test_insert_select_ctas(tdb):
    tdb.sql("CREATE TABLE t2 AS SELECT x, s FROM t WHERE x IS NOT NULL")
    assert tdb.sql("SELECT count(*) FROM t2").scalar() == 3
    tdb.sql("INSERT INTO t2 SELECT x, s FROM t WHERE x = 1")
    assert tdb.sql("SELECT count(*) FROM t2").scalar() == 4
    rows = tdb.sql("SELECT s, count(*) FROM t2 GROUP BY s ORDER BY s").rows()
    assert rows == [("bar", 1), ("foo", 3)]


def test_update_delete(tdb):
    tdb.sql("UPDATE t SET x = x + 10 WHERE s = 'foo'")
    assert tdb.sql("SELECT sum(x) FROM t").scalar() == 6 + 20
    tdb.sql("DELETE FROM t WHERE x > 10")
    assert tdb.sql("SELECT count(*) FROM t").scalar() == 2
    tdb.sql("DELETE FROM t")
    assert tdb.sql("SELECT count(*) FROM t").scalar() == 0


def test_empty_table_aggregates(db):
    db.sql("CREATE TABLE e (x INT, s TEXT)")
    assert db.sql("SELECT count(*) FROM e").scalar() == 0
    r = db.sql("SELECT sum(x), min(x), avg(x) FROM e").rows()[0]
    assert r == (None, None, None)
    assert db.sql("SELECT s, count(*) FROM e GROUP BY s").row_count == 0
    assert db.sql("SELECT x FROM e WHERE x > 0").row_count == 0


def test_joins_inner_left(db):
    db.sql("CREATE TABLE c (id INT, name TEXT)")
    db.sql("CREATE TABLE o (cid INT, amt DOUBLE)")
    db.sql("INSERT INTO c VALUES (1, 'alice'), (2, 'bob'), (3, 'carol')")
    db.sql(
        "INSERT INTO o VALUES (1, 10.0), (1, 20.0), (2, 5.0), (4, 99.0), (NULL, 1.0)"
    )
    rows = db.sql(
        "SELECT c.name, o.amt FROM c JOIN o ON c.id = o.cid ORDER BY c.name, o.amt"
    ).rows()
    assert rows == [("alice", 10.0), ("alice", 20.0), ("bob", 5.0)]
    rows = db.sql(
        "SELECT c.name, o.amt FROM c LEFT JOIN o ON c.id = o.cid "
        "ORDER BY c.name, o.amt NULLS LAST"
    ).rows()
    assert rows == [
        ("alice", 10.0),
        ("alice", 20.0),
        ("bob", 5.0),
        ("carol", None),
    ]
    # aggregate over join
    rows = db.sql(
        "SELECT c.name, count(o.cid), sum(o.amt) FROM c LEFT JOIN o "
        "ON c.id = o.cid GROUP BY c.name ORDER BY c.name"
    ).rows()
    assert rows == [("alice", 2, 30.0), ("bob", 1, 5.0), ("carol", 0, None)]


def test_join_comma_where(db):
    db.sql("CREATE TABLE a (x INT)")
    db.sql("CREATE TABLE b (y INT)")
    db.sql("INSERT INTO a VALUES (1), (2)")
    db.sql("INSERT INTO b VALUES (2), (3)")
    rows = db.sql("SELECT a.x, b.y FROM a, b WHERE a.x = b.y").rows()
    assert rows == [(2, 2)]
    assert db.sql("SELECT count(*) FROM a, b").scalar() == 4


def test_self_join_string_keys(db):
    db.sql("CREATE TABLE s1 (k TEXT, v INT)")
    db.sql("CREATE TABLE s2 (k TEXT, w INT)")
    db.sql("INSERT INTO s1 VALUES ('a', 1), ('b', 2)")
    db.sql("INSERT INTO s2 VALUES ('b', 20), ('c', 30)")
    rows = db.sql(
        "SELECT s1.k, s1.v, s2.w FROM s1 JOIN s2 ON s1.k = s2.k"
    ).rows()
    assert rows == [("b", 2, 20)]


def test_multi_column_group(db):
    db.sql("CREATE TABLE m (a INT, b INT, v DOUBLE)")
    db.sql(
        "INSERT INTO m VALUES (1,1,1.0),(1,1,2.0),(1,2,3.0),(2,1,4.0),(2,NULL,5.0)"
    )
    rows = db.sql(
        "SELECT a, b, sum(v) FROM m GROUP BY a, b ORDER BY a, b NULLS LAST"
    ).rows()
    assert rows == [(1, 1, 3.0), (1, 2, 3.0), (2, 1, 4.0), (2, None, 5.0)]


def test_decimal(db):
    db.sql("CREATE TABLE dec (p DECIMAL(10,2), q DECIMAL(10,2))")
    db.sql("INSERT INTO dec VALUES (1.25, 2.50), (3.10, NULL)")
    rows = db.sql("SELECT p + q, p * 2 FROM dec").rows()
    assert rows[0][0] == pytest.approx(3.75)
    assert rows[0][1] == pytest.approx(2.50)
    assert rows[1][0] is None
    assert db.sql("SELECT sum(p) FROM dec").scalar() == pytest.approx(4.35)


def test_copy_roundtrip(db, tmp_path):
    db.sql("CREATE TABLE t (x INT, s TEXT)")
    db.sql("INSERT INTO t VALUES (1, 'a'), (2, NULL)")
    p = tmp_path / "out.csv"
    db.sql(f"COPY (SELECT * FROM t) TO '{p}'")
    db.sql("CREATE TABLE t2 (x INT, s TEXT)")
    db.sql(f"COPY t2 FROM '{p}'")
    assert db.sql("SELECT count(*) FROM t2").scalar() == 2


def test_views(tdb):
    tdb.sql("CREATE VIEW v AS SELECT s, count(*) c FROM t GROUP BY s")
    rows = tdb.sql("SELECT * FROM v WHERE c > 1").rows()
    assert rows == [("foo", 2)]
    tdb.sql("DROP VIEW v")
    with pytest.raises(CatalogError):
        tdb.sql("SELECT * FROM v")


def test_explain(tdb):
    rs = tdb.sql("EXPLAIN SELECT s, count(*) FROM t GROUP BY s")
    text = "\n".join(r[0] for r in rs.rows())
    assert "Compound" in text


def test_load_table_api(db, rng):
    n = 1000
    db.load_table(
        "big",
        {
            "k": rng.integers(0, 10, n),
            "v": rng.normal(size=n),
        },
        create=True,
    )
    assert db.sql("SELECT count(*) FROM big").scalar() == n
    assert db.sql("SELECT count(DISTINCT k) FROM big").scalar() == 10


def test_approx_count_distinct(db, rng):
    n = 50_000
    vals = rng.integers(0, 5000, n)
    db.load_table("acd", {"v": vals}, create=True)
    exact = len(np.unique(vals))
    approx = db.sql("SELECT APPROX_COUNT_DISTINCT(v) FROM acd").scalar()
    assert abs(approx - exact) / exact < 0.05


def test_stddev_variance(db):
    db.sql("CREATE TABLE sv (x DOUBLE)")
    db.sql("INSERT INTO sv VALUES (1.0), (2.0), (3.0), (4.0)")
    import math

    assert db.sql("SELECT VARIANCE(x) FROM sv").scalar() == pytest.approx(
        np.var([1, 2, 3, 4], ddof=1)
    )
    assert db.sql("SELECT STDDEV(x) FROM sv").scalar() == pytest.approx(
        math.sqrt(np.var([1, 2, 3, 4], ddof=1))
    )


def test_approx_median(db):
    db.sql("CREATE TABLE am (x DOUBLE, g INT)")
    db.sql(
        "INSERT INTO am VALUES (1.0,1),(2.0,1),(3.0,1),(10.0,2),(20.0,2)"
    )
    assert db.sql("SELECT APPROX_MEDIAN(x) FROM am").scalar() == pytest.approx(3.0)
    rows = db.sql(
        "SELECT g, APPROX_MEDIAN(x) FROM am GROUP BY g ORDER BY g"
    ).rows()
    assert rows == [(1, pytest.approx(2.0)), (2, pytest.approx(15.0))]


def test_binder_errors(tdb):
    with pytest.raises(BinderError):
        tdb.sql("SELECT nope FROM t")
    with pytest.raises(BinderError):
        tdb.sql("SELECT x, count(*) FROM t")  # x not grouped
    with pytest.raises(CatalogError):
        tdb.sql("SELECT * FROM missing")


def test_intersect_except(db):
    db.sql("CREATE TABLE a (x INT, s TEXT)")
    db.sql("CREATE TABLE b (x INT, s TEXT)")
    db.sql("INSERT INTO a VALUES (1,'p'), (2,'q'), (2,'q'), (NULL,NULL), (3,'r')")
    db.sql("INSERT INTO b VALUES (2,'q'), (NULL,NULL), (4,'s')")
    rows = db.sql(
        "SELECT x, s FROM a INTERSECT SELECT x, s FROM b ORDER BY x NULLS LAST"
    ).rows()
    assert rows == [(2, "q"), (None, None)]
    rows = db.sql(
        "SELECT x, s FROM a EXCEPT SELECT x, s FROM b ORDER BY x"
    ).rows()
    assert rows == [(1, "p"), (3, "r")]


def test_to_arrow(db):
    db.sql("CREATE TABLE t (x INT, s TEXT, d DATE, v DOUBLE)")
    db.sql("INSERT INTO t VALUES (1, 'a', '2020-01-01', 1.5), (NULL, NULL, NULL, NULL)")
    tbl = db.sql("SELECT * FROM t").to_arrow()
    assert tbl.num_rows == 2
    assert tbl.column("s").to_pylist() == ["a", None]
    assert str(tbl.schema.field("d").type) == "date32[day]"
    assert tbl.column("x").to_pylist() == [1, None]


def test_fragment_skipping(db):
    # tiny fragments; quals outside per-fragment ranges must still be correct
    db.sql("CREATE TABLE fs (x INT, s TEXT) WITH (fragment_size=100)")
    import numpy as np

    xs = np.arange(1000)  # sorted → fragments have tight ranges
    ss = np.array(["lo" if v < 500 else "hi" for v in xs], object)
    db.load_table("fs", {"x": xs, "s": ss})
    t = db.catalog.get_table("fs")
    assert len(t.fragments) == 10
    assert db.sql("SELECT count(*) FROM fs WHERE x >= 950").scalar() == 50
    assert db.sql("SELECT sum(x) FROM fs WHERE x BETWEEN 250 AND 260").scalar() == sum(range(250, 261))
    assert db.sql("SELECT count(*) FROM fs WHERE x = 123").scalar() == 1
    assert db.sql("SELECT count(*) FROM fs WHERE s = 'hi' AND x < 510").scalar() == 10
    assert db.sql("SELECT count(*) FROM fs WHERE x > 2000").scalar() == 0
    # group-by over pruned scan
    rows = db.sql(
        "SELECT s, count(*) FROM fs WHERE x >= 900 GROUP BY s"
    ).rows()
    assert rows == [("hi", 100)]


def test_alter_table_columns(db):
    db.sql("CREATE TABLE at (x INT)")
    db.sql("INSERT INTO at VALUES (1), (2)")
    db.sql("ALTER TABLE at ADD COLUMN y DOUBLE DEFAULT 9.5")
    db.sql("ALTER TABLE at ADD COLUMN s TEXT")
    rows = db.sql("SELECT x, y, s FROM at ORDER BY x").rows()
    assert rows == [(1, 9.5, None), (2, 9.5, None)]
    db.sql("INSERT INTO at VALUES (3, 1.0, 'n')")
    db.sql("ALTER TABLE at RENAME COLUMN y TO yy")
    assert db.sql("SELECT sum(yy) FROM at").scalar() == pytest.approx(20.0)
    db.sql("ALTER TABLE at DROP COLUMN yy")
    assert [f for f in db.sql("SELECT * FROM at").fields] == ["x", "s"]
    db.sql("OPTIMIZE TABLE at")
    assert db.sql("SELECT count(*) FROM at").scalar() == 3


def test_result_recycler(db):
    db.sql("CREATE TABLE rr (x INT)")
    db.sql("INSERT INTO rr VALUES (1), (2)")
    q = "SELECT /*+ keep_result */ sum(x) FROM rr"
    assert db.sql(q).scalar() == 3
    assert len(db._result_cache) == 1
    rs2 = db.sql(q)
    assert rs2.scalar() == 3
    # invalidated by writes
    db.sql("INSERT INTO rr VALUES (10)")
    assert db.sql(q).scalar() == 13


def test_copy_autocreate_with_detection(db, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "id,name,score,seen,flag\n"
        "1,alice,3.5,2024-01-01,true\n"
        "2,bob,,2024-02-02,false\n"
        "3,,7.25,,true\n"
    )
    db.sql(f"COPY newtab FROM '{p}'")
    rows = db.sql("SELECT * FROM newtab ORDER BY id").rows()
    assert rows[0][1] == "alice" and rows[0][2] == 3.5
    assert rows[1][2] is None and rows[2][1] is None
    import datetime

    assert rows[0][3] == datetime.date(2024, 1, 1)
    assert rows[0][4] is True
    det = db.sql("DESCRIBE newtab").rows()
    types = {r[0]: r[1] for r in det}
    assert "INTEGER" in types["id"] or "BIGINT" in types["id"]
    assert types["score"].startswith("DOUBLE")


def test_correlated_exists(db):
    db.sql("CREATE TABLE c (id INT, name TEXT)")
    db.sql("CREATE TABLE o (cid INT, amt DOUBLE)")
    db.sql("INSERT INTO c VALUES (1,'alice'), (2,'bob'), (3,'carol')")
    db.sql("INSERT INTO o VALUES (1, 10.0), (1, 20.0), (3, 5.0)")
    rows = db.sql(
        "SELECT name FROM c WHERE EXISTS "
        "(SELECT 1 FROM o WHERE o.cid = c.id) ORDER BY name"
    ).rows()
    assert [r[0] for r in rows] == ["alice", "carol"]
    rows = db.sql(
        "SELECT name FROM c WHERE NOT EXISTS "
        "(SELECT 1 FROM o WHERE o.cid = c.id) ORDER BY name"
    ).rows()
    assert [r[0] for r in rows] == ["bob"]
    # with an extra uncorrelated predicate inside
    rows = db.sql(
        "SELECT name FROM c WHERE EXISTS "
        "(SELECT 1 FROM o WHERE o.cid = c.id AND o.amt > 15) ORDER BY name"
    ).rows()
    assert [r[0] for r in rows] == ["alice"]


def test_correlated_in(db):
    db.sql("CREATE TABLE a (x INT, grp INT)")
    db.sql("CREATE TABLE b (y INT, grp INT)")
    db.sql("INSERT INTO a VALUES (1, 10), (2, 10), (3, 20)")
    db.sql("INSERT INTO b VALUES (1, 10), (3, 10), (3, 20)")
    rows = db.sql(
        "SELECT x FROM a WHERE x IN (SELECT y FROM b WHERE b.grp = a.grp) "
        "ORDER BY x"
    ).rows()
    assert [r[0] for r in rows] == [1, 3]


def test_correlated_with_other_filters(db):
    db.sql("CREATE TABLE t1 (k INT, v INT)")
    db.sql("CREATE TABLE t2 (k INT)")
    db.sql("INSERT INTO t1 VALUES (1, 100), (2, 5), (3, 100)")
    db.sql("INSERT INTO t2 VALUES (1), (2)")
    rows = db.sql(
        "SELECT k FROM t1 WHERE v > 50 AND EXISTS "
        "(SELECT 1 FROM t2 WHERE t2.k = t1.k)"
    ).rows()
    assert [r[0] for r in rows] == [1]


def test_mode_and_quantile(db):
    db.sql("CREATE TABLE mq (g INT, v INT)")
    db.sql(
        "INSERT INTO mq VALUES (1,5),(1,5),(1,7),(2,3),(2,9),(2,9),(2,9),(1,NULL)"
    )
    rows = db.sql("SELECT g, MODE(v) FROM mq GROUP BY g ORDER BY g").rows()
    assert rows == [(1, 5), (2, 9)]
    assert db.sql("SELECT APPROX_QUANTILE(v, 0.5) FROM mq WHERE g = 2").scalar() == 9.0


def test_sample_single_value(db):
    db.sql("CREATE TABLE sv2 (g INT, s TEXT)")
    db.sql("INSERT INTO sv2 VALUES (1, 'only'), (2, 'a'), (2, 'a')")
    rows = db.sql("SELECT g, SAMPLE(s) FROM sv2 GROUP BY g ORDER BY g").rows()
    assert rows[0] == (1, "only")
    assert rows[1][1] == "a"


def test_sql_device_api(db):
    import jax

    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1), (2)")
    batch, decode = db.sql_device("SELECT sum(x) FROM t")
    jax.block_until_ready(batch.cols)
    assert decode().scalar() == 3


def test_div_by_zero_only_for_surviving_rows(db):
    db.sql("CREATE TABLE dz (x INT, g INT)")
    db.sql("INSERT INTO dz VALUES (0, 1), (5, 1), (0, 2)")
    # filtered-out rows must not trip the error (reference: row-wise
    # codegen evaluates targets behind the filter guard)
    assert db.sql("SELECT 10 / x FROM dz WHERE x <> 0").rows() == [(2,)]
    assert db.sql(
        "SELECT SUM(10 / x) FROM dz WHERE x <> 0"
    ).scalar() == 2
    assert db.sql(
        "SELECT g, 10 / SUM(x) FROM dz WHERE x <> 0 GROUP BY g"
    ).rows() == [(1, 2)]
    import pytest as _pt

    from heavydb_tpu.errors import DivisionByZero

    with _pt.raises(DivisionByZero):
        db.sql("SELECT 10 / x FROM dz").rows()


def test_copy_to_parquet(db, tmp_path):
    import pandas as pd

    db.sql("CREATE TABLE cp (a INT, s TEXT)")
    db.sql("INSERT INTO cp VALUES (1, 'x'), (2, NULL)")
    p = str(tmp_path / "out.parquet")
    db.sql(f"COPY (SELECT * FROM cp) TO '{p}'")
    df = pd.read_parquet(p)
    assert list(df["a"]) == [1, 2]
    assert df["s"][0] == "x" and pd.isna(df["s"][1])


def test_fixed_width_encoding(db):
    import numpy as np

    db.sql(
        "CREATE TABLE fx (a BIGINT ENCODING FIXED(32), "
        "t TIMESTAMP ENCODING FIXED(32), s SMALLINT)"
    )
    db.sql(
        "INSERT INTO fx VALUES (123456789, '2024-01-01 12:00:00', 5), "
        "(NULL, NULL, NULL)"
    )
    t = db.catalog.get_table("fx")
    assert t.fragments[0].chunks[1].dtype == np.int32  # narrowed BIGINT
    assert t.fragments[0].chunks[2].dtype == np.int32  # narrowed TIMESTAMP
    rows = db.sql("SELECT a, s FROM fx ORDER BY a NULLS LAST").rows()
    assert rows == [(123456789, 5), (None, None)]
    assert db.sql("SELECT SUM(a) FROM fx").scalar() == 123456789
    import pytest as _pt

    from heavydb_tpu.errors import NotSupported

    with _pt.raises(NotSupported):
        db.sql("CREATE TABLE bad (x DOUBLE ENCODING FIXED(32))")


def test_now_current_date(db):
    import datetime

    rows = db.sql("SELECT NOW(), CURRENT_DATE()").rows()
    now, today = rows[0]
    assert isinstance(now, datetime.datetime)
    assert today == datetime.datetime.now(datetime.timezone.utc).date()
    db.sql("CREATE TABLE nw (ts TIMESTAMP)")
    db.sql("INSERT INTO nw VALUES ('2020-01-01 00:00:00')")
    assert db.sql("SELECT COUNT(*) FROM nw WHERE ts < NOW()").scalar() == 1


def test_native_csv_parser_matches_pandas(tmp_path, rng):
    """The C++ multithreaded CSV parser (native/csv_ext.cpp) produces the
    same columns as the pandas path, including quoted fields, doubled
    quotes, embedded delimiters, and null markers."""
    import csv as _csv

    import pandas as pd

    from heavydb_tpu.io.csv_import import parse_csv_native

    p = tmp_path / "data.csv"
    n = 5000
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["i", "f", "s"])
        for k in range(n):
            w.writerow([
                int(rng.integers(-10**6, 10**6)) if k % 7 else "",
                round(float(rng.random() * 100), 3) if k % 5 else "NULL",
                ['say "hi"', "a,b", "plain", ""][k % 4],
            ])
    res = parse_csv_native(str(p))
    if res is None:
        import pytest

        pytest.skip("native csv extension unavailable")
    names, cols, nrows = res
    assert names == ["i", "f", "s"] and nrows == n
    from heavydb_tpu.storage.table import RawText

    # text columns arrive un-decoded (RawText) for native dict interning
    assert isinstance(cols[2], RawText)
    cols = list(cols)
    cols[2] = cols[2].to_list()
    df = pd.read_csv(p, na_values=["NULL", ""], keep_default_na=True)
    iv = df["i"].to_numpy()
    assert np.allclose(np.nan_to_num(cols[0], nan=-1),
                       np.nan_to_num(iv, nan=-1))
    fv = df["f"].to_numpy()
    assert np.allclose(np.nan_to_num(cols[1], nan=-1),
                       np.nan_to_num(fv, nan=-1), atol=1e-9)
    for k in range(0, n, 997):
        want = df["s"].iloc[k]
        got = cols[2][k]
        if isinstance(want, float):
            assert got is None
        else:
            assert got == want


def test_sort_column_tightens_fragments(rng):
    """WITH (sort_column='x'): incoming batches sort by x, tightening
    fragment min/max and sharpening fragment skipping (reference
    TableDescriptor sortedColumnId)."""
    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config

    n = 120_000
    x = rng.integers(0, 1_000_000, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    db = hdt.connect(config=Config(default_fragment_rows=20_000))
    db.sql("CREATE TABLE sorted_t (x INT, v FLOAT) "
           "WITH (sort_column='x', fragment_size=20000)")
    db.catalog.get_table("sorted_t").insert_columns({1: x, 2: v})
    t = db.catalog.get_table("sorted_t")
    mins = [f.stats[1].min for f in t.fragments]
    assert mins == sorted(mins)  # fragments cover ascending ranges
    # skipping now prunes most fragments for a narrow filter
    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.sql.parser import parse

    node = optimize(db._plan_select(parse(
        "SELECT count(*) FROM sorted_t WHERE x < 50000")))
    kept = db.executor._surviving_fragments(
        node.inputs[0], 0, node.filter_cond)
    assert kept is not None and len(kept) <= 2
    want = int((x < 50000).sum())
    assert db.sql("SELECT count(*) FROM sorted_t WHERE x < 50000"
                  ).rows()[0][0] == want


def test_sum_avg_distinct(db):
    """SUM/AVG(DISTINCT x) — reduce over distinct per-group values
    (reference: Calcite accepts DISTINCT on SUM/AVG; HeavyDB executes
    via the count-distinct set machinery)."""
    db.sql("CREATE TABLE sd (k INT, x INT, y DOUBLE)")
    db.sql(
        "INSERT INTO sd VALUES (1,5,1.5), (1,5,1.5), (1,7,2.5), "
        "(2,5,NULL), (2,NULL,3.0), (NULL,4,3.0), (2,5,3.0)"
    )
    assert db.sql(
        "SELECT sum(DISTINCT x), avg(DISTINCT y) FROM sd"
    ).rows() == [(16, (1.5 + 2.5 + 3.0) / 3)]
    assert db.sql(
        "SELECT k, sum(DISTINCT x), avg(DISTINCT x) FROM sd "
        "GROUP BY k ORDER BY k NULLS FIRST"
    ).rows() == [(None, 4, 4.0), (1, 12, 6.0), (2, 5, 5.0)]
    # empty / all-NULL group → NULL (matches plain SUM semantics)
    assert db.sql(
        "SELECT sum(DISTINCT x) FROM sd WHERE x IS NULL"
    ).rows() == [(None,)]
