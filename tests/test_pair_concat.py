"""col || col between two dict-encoded string columns (pairwise dense
translation table) vs the SQLite oracle.  Reference: two-variable string
ops (QueryEngine/StringOpsIR.cpp) via StringDictionaryProxy transients."""
import numpy as np
import pytest

from tests.test_sqlite_oracle import Oracle


@pytest.fixture()
def oracle(db):
    rng = np.random.default_rng(42)
    o = Oracle(db)
    n = 500
    a = [None if i % 11 == 0 else ["ab", "cd", "ef", "g'h"][v]
         for i, v in enumerate(rng.integers(0, 4, n))]
    b = [None if i % 7 == 0 else ["X", "YY", ""][v]
         for i, v in enumerate(rng.integers(0, 3, n))]
    k = [int(v) for v in rng.integers(0, 5, n)]
    o.load("pc", {"a": a, "b": b, "k": k},
           {"a": "TEXT", "b": "TEXT", "k": "INT"})
    return o


def test_projection(oracle):
    oracle.check("SELECT a || b FROM pc")


def test_with_constants_and_chains(oracle):
    oracle.check("SELECT a || '-' || b FROM pc")
    oracle.check("SELECT UPPER(a || b) FROM pc")
    oracle.check("SELECT UPPER(a) || LOWER(b) FROM pc")


def test_nary_concat_fn(oracle):
    # SQLite lacks 3-arg CONCAT pre-3.44; express via ||
    oracle.check("SELECT CONCAT(a, b) FROM pc",
                 lite_sql="SELECT a || b FROM pc")
    oracle.check("SELECT CONCAT(a, '-', b) FROM pc",
                 lite_sql="SELECT a || '-' || b FROM pc")


def test_filter_group_order(oracle):
    oracle.check("SELECT count(*) FROM pc WHERE a || b = 'abX'")
    oracle.check(
        "SELECT a || b AS ab, count(*) FROM pc GROUP BY ab "
        "ORDER BY ab NULLS LAST, 2")
    oracle.check(
        "SELECT a || b, count(*) FROM pc GROUP BY a || b "
        "ORDER BY a || b NULLS LAST, 2")
    oracle.check("SELECT MIN(a || b), MAX(a || b) FROM pc")


def test_groupby_repeated_transform(oracle):
    # GROUP BY repeating the transform expression (not via alias)
    oracle.check(
        "SELECT UPPER(a), count(*) FROM pc GROUP BY UPPER(a) "
        "ORDER BY UPPER(a) NULLS LAST")


def test_pair_table_cap(db):
    db.sql("CREATE TABLE cap_t (a TEXT, b TEXT)")
    db.sql("INSERT INTO cap_t VALUES ('p','q')")
    db.config.pair_concat_max_entries = 0
    from heavydb_tpu.errors import NotSupported

    with pytest.raises(NotSupported):
        db.sql("SELECT a || b FROM cap_t")
    db.config.pair_concat_max_entries = 1 << 22
    assert db.sql("SELECT a || b FROM cap_t").rows() == [("pq",)]


def test_dict_ordering_comparisons(oracle):
    oracle.check("SELECT count(*) FROM pc WHERE a < b")
    oracle.check("SELECT count(*) FROM pc WHERE a >= b")
    oracle.check("SELECT a, b FROM pc WHERE UPPER(a) <= UPPER(b)")
    oracle.check("SELECT count(*) FROM pc WHERE a || b > b || a")
