"""Tree-model ML table functions (reference
TableFunctions/SystemFunctions/os/ML: DECISION_TREE_REG_FIT,
RANDOM_FOREST_REG_FIT, GBT_REG_FIT, ML_REG_PREDICT, R2_SCORE)."""
import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def db(tmp_path):
    return hdt.connect(str(tmp_path / "mldb"))


def _load_nonlinear(db, n=2000, seed=7):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(-3, 3, n)
    x2 = rng.uniform(-3, 3, n)
    # piecewise nonlinear target — linear regression cannot fit this
    y = np.where(x1 > 0, 4.0 + 2.0 * x2, -3.0) + np.where(
        x2 > 1, 5.0, 0.0) + rng.normal(0, 0.1, n)
    db.load_table("mlt", {
        "id": np.arange(n, dtype=np.int64),
        "x1": x1, "x2": x2, "y": y,
    }, create=True)
    return x1, x2, y


def _r2(db, model):
    rows = db.sql(
        f"SELECT r2 FROM TABLE(r2_score('{model}', "
        "CURSOR(SELECT y, x1, x2 FROM mlt)))").rows()
    return rows[0][0]


def test_decision_tree_fit_predict(db):
    _load_nonlinear(db)
    rows = db.sql(
        "SELECT model_name, kind, n_trees, n_features FROM TABLE("
        "decision_tree_reg_fit('dt', 8, 4, "
        "CURSOR(SELECT y, x1, x2 FROM mlt)))").rows()
    assert rows == [("dt", "tree", 1, 2)]
    assert _r2(db, "dt") > 0.9
    # predictions align by id and are finite
    out = db.sql(
        "SELECT id, prediction FROM TABLE(ml_reg_predict('dt', "
        "CURSOR(SELECT id, x1, x2 FROM mlt))) ORDER BY id LIMIT 5").rows()
    assert [r[0] for r in out] == [0, 1, 2, 3, 4]
    assert all(np.isfinite(r[1]) for r in out)


def test_random_forest_beats_stump(db):
    _load_nonlinear(db)
    db.sql("SELECT * FROM TABLE(decision_tree_reg_fit('stump', 1, 4, "
           "CURSOR(SELECT y, x1, x2 FROM mlt)))")
    db.sql("SELECT * FROM TABLE(random_forest_reg_fit('rf', 12, 8, "
           "CURSOR(SELECT y, x1, x2 FROM mlt)))")
    assert _r2(db, "rf") > 0.9 > _r2(db, "stump")


def test_gbt_fit(db):
    _load_nonlinear(db)
    db.sql("SELECT * FROM TABLE(gbt_reg_fit('g', 40, 3, 0.3, "
           "CURSOR(SELECT y, x1, x2 FROM mlt)))")
    assert _r2(db, "g") > 0.9


def test_ml_models_listing_and_unknown(db):
    _load_nonlinear(db)
    db.sql("SELECT * FROM TABLE(decision_tree_reg_fit('m1', "
           "CURSOR(SELECT y, x1 FROM mlt)))")
    rows = db.sql("SELECT model_name FROM TABLE(ml_models())").rows()
    assert ("m1",) in rows
    with pytest.raises(Exception):
        db.sql("SELECT * FROM TABLE(ml_reg_predict('nope', "
               "CURSOR(SELECT id, x1 FROM mlt)))")


def test_predict_matches_direct_kernel(db):
    """SQL-path prediction == direct ops.ml prediction on the same data."""
    from heavydb_tpu.ops import ml

    x1, x2, y = _load_nonlinear(db, n=500, seed=3)
    db.sql("SELECT * FROM TABLE(decision_tree_reg_fit('d2', 6, 4, "
           "CURSOR(SELECT y, x1, x2 FROM mlt)))")
    X = np.column_stack([x1, x2])
    m = db._ml_models["d2"]
    want = m.predict(X)
    got = db.sql(
        "SELECT prediction FROM TABLE(ml_reg_predict('d2', "
        "CURSOR(SELECT id, x1, x2 FROM mlt))) ORDER BY id").rows()
    np.testing.assert_allclose([r[0] for r in got], want, rtol=1e-12)
