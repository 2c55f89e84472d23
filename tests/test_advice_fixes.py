"""Regression tests for the round-2 advisor findings (ADVICE.md):

- _split_join_condition must NOT unwrap a same-side dict=dict comparison
  into a raw-id equality (ids from different dictionaries are not
  comparable), and multi-key joins with cross-dictionary string keys must
  refuse rather than hash/range-pack raw ids.
- rewrite_over_agg handles DictPairCompare over group keys.
- ML: fit cursors need >=2 columns; predictions on non-finite features
  are NULL; R2 of a perfect fit on constant y is 1.0.
"""

import numpy as np
import pytest

from heavydb_tpu.errors import NotSupported
from tests.test_sqlite_oracle import Oracle


@pytest.fixture()
def oracle(db):
    rng = np.random.default_rng(11)
    o = Oracle(db)
    n = 300
    words = ["ant", "bee", "cat", "dog", "elk"]
    s = [words[v] for v in rng.integers(0, 5, n)]
    s2 = [words[v] for v in rng.integers(0, 5, n)]
    k = [int(v) for v in rng.integers(0, 8, n)]
    o.load("f1", {"k": k, "s": s, "s2": s2},
           {"k": "INT", "s": "TEXT", "s2": "TEXT"})
    m = 40
    t = [words[v] for v in rng.integers(0, 5, m)]
    k2 = [int(v) for v in rng.integers(0, 8, m)]
    o.load("f2", {"k": k2, "t": t}, {"k": "INT", "t": "TEXT"})
    return o


def test_same_side_dict_compare_in_join_on(oracle):
    # f1.s = f1.s2 compares ids from two DIFFERENT dictionaries — it must
    # stay a DictPairCompare residual, not become a raw-id equality
    oracle.check(
        "SELECT count(*) FROM f1 JOIN f2 ON f1.k = f2.k AND f1.s = f1.s2"
    )


def test_cross_dict_equi_join_single_key(oracle):
    # cross-side dict=dict single key: translation map path
    oracle.check(
        "SELECT count(*) FROM f1 JOIN f2 ON f1.s = f2.t"
    )


def test_multikey_cross_dict_join_refuses(db):
    db.sql("CREATE TABLE ma (k INT, s TEXT)")
    db.sql("INSERT INTO ma VALUES (1, 'x'), (2, 'y')")
    db.sql("CREATE TABLE mb (k INT, t TEXT)")
    db.sql("INSERT INTO mb VALUES (1, 'x'), (2, 'z')")
    with pytest.raises(NotSupported):
        db.sql(
            "SELECT count(*) FROM ma JOIN mb "
            "ON ma.k = mb.k AND ma.s = mb.t"
        )


def test_grouped_dict_compare_projection(oracle):
    # dict ordering comparison over group keys (rewrite_over_agg branch)
    oracle.check(
        "SELECT s < s2, count(*) FROM f1 GROUP BY s, s2",
        lite_sql="SELECT s < s2, count(*) FROM f1 GROUP BY s, s2",
    )


def test_ml_cursor_needs_features(db):
    db.sql("CREATE TABLE mt (y DOUBLE)")
    db.sql("INSERT INTO mt VALUES (1.0), (2.0)")
    with pytest.raises(Exception) as ei:
        db.sql(
            "SELECT * FROM TABLE(decision_tree_reg_fit('m0', 8, 4, "
            "CURSOR(SELECT y FROM mt)))"
        ).rows()
    assert "feature" in str(ei.value).lower() or "column" in str(
        ei.value).lower()


def test_ml_predict_nonfinite_features_null(db):
    db.sql("CREATE TABLE mfit (y DOUBLE, x DOUBLE)")
    rows = ", ".join(f"({i % 5}.0, {i % 5}.0)" for i in range(40))
    db.sql(f"INSERT INTO mfit VALUES {rows}")
    db.sql(
        "SELECT * FROM TABLE(decision_tree_reg_fit('mnan', 8, 4, "
        "CURSOR(SELECT y, x FROM mfit)))"
    ).rows()
    db.sql("CREATE TABLE mp (id INT, x DOUBLE)")
    db.sql("INSERT INTO mp VALUES (1, 2.0), (2, CAST('nan' AS DOUBLE))")
    r = db.sql(
        "SELECT * FROM TABLE(ml_reg_predict('mnan', "
        "CURSOR(SELECT id, x FROM mp)))"
    ).rows()
    byid = {row[0]: row[1] for row in r}
    assert byid[1] is not None and abs(byid[1] - 2.0) < 1.0
    assert byid[2] is None or (isinstance(byid[2], float)
                               and np.isnan(byid[2]))


def test_r2_constant_y_perfect_fit(db):
    db.sql("CREATE TABLE rc (y DOUBLE, x DOUBLE)")
    rows = ", ".join(f"(3.0, {i}.0)" for i in range(30))
    db.sql(f"INSERT INTO rc VALUES {rows}")
    db.sql(
        "SELECT * FROM TABLE(decision_tree_reg_fit('rcm', 8, 4, "
        "CURSOR(SELECT y, x FROM rc)))"
    ).rows()
    r = db.sql(
        "SELECT r2 FROM TABLE(r2_score('rcm', "
        "CURSOR(SELECT y, x FROM rc)))"
    ).rows()
    assert abs(r[0][0] - 1.0) < 1e-9
