"""ARRAY column tests — reference ExecuteTest ArrayTest patterns
(CARDINALITY, array subscript kARRAY_AT, quantified ANY/ALL comparisons,
UNNEST; ImportExport array literals {..} / ARRAY[..])."""

import numpy as np
import pytest


@pytest.fixture()
def adb(db):
    db.sql("CREATE TABLE t (id INT, tags TEXT[], vals INT[], w DOUBLE)")
    db.sql(
        "INSERT INTO t VALUES "
        "(1, {'a','b'}, {1,2,3}, 1.5), "
        "(2, {'b','c','d'}, {4}, 2.5), "
        "(3, NULL, {}, 3.5), "
        "(4, {'a'}, {7, NULL, 9}, 4.5)"
    )
    return db


def test_select_array_columns(adb):
    rows = adb.sql("SELECT id, tags, vals FROM t ORDER BY id").rows()
    assert rows == [
        (1, ["a", "b"], [1, 2, 3]),
        (2, ["b", "c", "d"], [4]),
        (3, None, []),
        (4, ["a"], [7, None, 9]),
    ]


def test_cardinality(adb):
    rows = adb.sql(
        "SELECT id, CARDINALITY(tags), CARDINALITY(vals) FROM t ORDER BY id"
    ).rows()
    assert rows == [(1, 2, 3), (2, 3, 1), (3, None, 0), (4, 1, 3)]


def test_subscript(adb):
    rows = adb.sql(
        "SELECT id, vals[1], vals[2], tags[1] FROM t ORDER BY id"
    ).rows()
    assert rows == [
        (1, 1, 2, "a"),
        (2, 4, None, "b"),
        (3, None, None, None),
        (4, 7, None, "a"),  # vals[2] is a NULL element
    ]


def test_subscript_out_of_range(adb):
    rows = adb.sql("SELECT vals[9] FROM t ORDER BY id").rows()
    assert [r[0] for r in rows] == [None, None, None, None]


def test_any_all(adb):
    assert adb.sql(
        "SELECT id FROM t WHERE 'a' = ANY tags ORDER BY id"
    ).rows() == [(1,), (4,)]
    # NULL array → NULL (filtered); others contain no 'z'
    assert adb.sql(
        "SELECT id FROM t WHERE 'z' <> ALL tags ORDER BY id"
    ).rows() == [(1,), (2,), (4,)]
    # lit <op> elem direction: 5 < elem
    assert adb.sql(
        "SELECT id FROM t WHERE 5 < ANY vals ORDER BY id"
    ).rows() == [(4,)]
    # empty array: ALL → TRUE
    assert adb.sql(
        "SELECT id FROM t WHERE 2 >= ALL vals ORDER BY id"
    ).rows() == [(3,)]
    # filter + aggregate over rows selected by array predicate
    assert adb.sql(
        "SELECT SUM(w) FROM t WHERE 'b' = ANY tags"
    ).scalar() == 4.0


def test_unnest_project(adb):
    rows = adb.sql("SELECT id, UNNEST(tags) FROM t ORDER BY id").rows()
    assert rows == [
        (1, "a"), (1, "b"), (2, "b"), (2, "c"), (2, "d"), (4, "a"),
    ]


def test_unnest_group_by(adb):
    rows = adb.sql(
        "SELECT UNNEST(tags) tag, COUNT(*) c FROM t GROUP BY tag "
        "ORDER BY c DESC, tag"
    ).rows()
    assert rows == [("a", 2), ("b", 2), ("c", 1), ("d", 1)]


def test_unnest_agg_skips_null_elements(adb):
    assert adb.sql("SELECT SUM(UNNEST(vals)) FROM t").scalar() == 26


def test_unnest_after_filter(adb):
    rows = adb.sql(
        "SELECT id, UNNEST(vals) v FROM t WHERE id > 1 ORDER BY id, v"
    ).rows()
    assert rows == [(2, 4), (4, 7), (4, 9), (4, None)]


def test_array_literal_forms(db):
    db.sql("CREATE TABLE a2 (x DOUBLE[], s TEXT[])")
    db.sql("INSERT INTO a2 VALUES (ARRAY[1.5, 2.5], ARRAY['p','q'])")
    db.sql("INSERT INTO a2 VALUES (NULL, {'r'})")
    rows = db.sql("SELECT x, s FROM a2 ORDER BY CARDINALITY(s) DESC").rows()
    assert rows == [([1.5, 2.5], ["p", "q"]), (None, ["r"])]


def test_load_table_lists(db):
    db.sql("CREATE TABLE a3 (id INT, xs BIGINT[])")
    db.load_table("a3", {
        "id": np.arange(3, dtype=np.int32),
        "xs": [[10, 20], None, []],
    })
    rows = db.sql("SELECT id, xs, CARDINALITY(xs) FROM a3 ORDER BY id").rows()
    assert rows == [(0, [10, 20], 2), (1, None, None), (2, [], 0)]


def test_ctas_and_insert_select(adb):
    adb.sql("CREATE TABLE t2 AS SELECT id, tags FROM t WHERE id <= 2")
    rows = adb.sql("SELECT id, tags FROM t2 ORDER BY id").rows()
    assert rows == [(1, ["a", "b"]), (2, ["b", "c", "d"])]
    adb.sql("INSERT INTO t2 SELECT id, tags FROM t WHERE id = 4")
    assert adb.sql(
        "SELECT COUNT(*) FROM t2 WHERE 'a' = ANY tags"
    ).scalar() == 2


def test_update_delete_preserve_arrays(adb):
    adb.sql("UPDATE t SET w = 0.0 WHERE id = 1")
    adb.sql("DELETE FROM t WHERE id = 2")
    rows = adb.sql("SELECT id, tags, w FROM t ORDER BY id").rows()
    assert rows == [
        (1, ["a", "b"], 0.0),
        (3, None, 3.5),
        (4, ["a"], 4.5),
    ]


def test_array_errors(adb):
    from heavydb_tpu.errors import BinderError, NotSupported

    with pytest.raises(BinderError):
        adb.sql("SELECT * FROM t ORDER BY tags")
    with pytest.raises(BinderError):
        adb.sql("SELECT tags, COUNT(*) FROM t GROUP BY tags")
    with pytest.raises(BinderError):
        adb.sql("SELECT * FROM t WHERE tags = vals")
    with pytest.raises(NotSupported):
        adb.sql("SELECT UNNEST(tags), UNNEST(vals) FROM t")


def test_array_join_side(adb):
    # array columns ride through joins untouched
    adb.sql("CREATE TABLE d (id INT, nm TEXT)")
    adb.sql("INSERT INTO d VALUES (1, 'one'), (4, 'four')")
    rows = adb.sql(
        "SELECT d.nm, t.tags FROM t JOIN d ON t.id = d.id ORDER BY d.nm"
    ).rows()
    assert rows == [("four", ["a"]), ("one", ["a", "b"])]


def test_array_persistence(tmp_path):
    import heavydb_tpu as hdt

    d = str(tmp_path / "adb")
    db = hdt.connect(d)
    db.sql("CREATE TABLE t (id INT, tags TEXT[], v DOUBLE[])")
    db.sql("INSERT INTO t VALUES (1, {'a','b'}, {0.5}), (2, NULL, {})")
    del db
    db2 = hdt.connect(d)
    assert db2.sql("SELECT id, tags, v FROM t ORDER BY id").rows() == [
        (1, ["a", "b"], [0.5]), (2, None, []),
    ]
    db2.sql("INSERT INTO t VALUES (3, {'c'}, NULL)")
    del db2
    db3 = hdt.connect(d)
    assert db3.sql(
        "SELECT id, CARDINALITY(tags) FROM t ORDER BY id"
    ).rows() == [(1, 2), (2, None), (3, 1)]


def test_array_equality(db):
    db.sql("CREATE TABLE aeq (a INT[], b INT[], s TEXT[], t2 TEXT[])")
    db.sql("INSERT INTO aeq VALUES ({1,2,3}, {1,2,3}, {'x','y'}, {'x','y'}),"
           " ({4,5}, {4,6}, {'a'}, {'b'}), (NULL, {1}, NULL, {'z'})")
    assert db.sql("SELECT a = b FROM aeq").rows() == [
        (True,), (False,), (None,)
    ]
    assert db.sql("SELECT count(*) FROM aeq WHERE a = b").rows()[0][0] == 1
    assert db.sql("SELECT count(*) FROM aeq WHERE a <> b").rows()[0][0] == 1
    assert db.sql("SELECT s = t2 FROM aeq").rows() == [
        (True,), (False,), (None,)
    ]
