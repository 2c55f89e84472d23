"""UDF and table function tests (reference UdfCompiler / TableFunctions)."""

import numpy as np
import pytest

from heavydb_tpu import types as T


def test_scalar_udf(db):
    import jax.numpy as jnp

    db.sql("CREATE TABLE t (x DOUBLE, y DOUBLE)")
    db.sql("INSERT INTO t VALUES (3.0, 4.0), (6.0, 8.0), (NULL, 1.0)")
    db.register_udf(
        "HYPOT", lambda a, b: jnp.sqrt(a * a + b * b),
        [T.double(), T.double()], T.double(),
    )
    rows = db.sql("SELECT HYPOT(x, y) FROM t ORDER BY x NULLS LAST").rows()
    assert rows[0][0] == pytest.approx(5.0)
    assert rows[1][0] == pytest.approx(10.0)
    assert rows[2][0] is None  # null propagation
    # usable in WHERE and GROUP BY
    assert db.sql("SELECT count(*) FROM t WHERE HYPOT(x, y) > 6").scalar() == 1


def test_udf_wrong_arity(db):
    db.sql("CREATE TABLE t (x DOUBLE)")
    db.register_udf("F1", lambda a: a, [T.double()], T.double())
    from heavydb_tpu.errors import BinderError

    with pytest.raises(BinderError):
        db.sql("SELECT F1(x, x) FROM t")


def test_generate_series(db):
    rows = db.sql("SELECT * FROM TABLE(generate_series(1, 5))").rows()
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
    rows = db.sql(
        "SELECT * FROM TABLE(generate_series(0, 10, 5))"
    ).rows()
    assert [r[0] for r in rows] == [0, 5, 10]
    # composes with the rest of SQL
    assert db.sql(
        "SELECT sum(generate_series) FROM TABLE(generate_series(1, 100))"
    ).scalar() == 5050


def test_custom_table_function_with_cursor(db):
    db.sql("CREATE TABLE t (k TEXT, v DOUBLE)")
    db.sql("INSERT INTO t VALUES ('a', 1.0), ('b', 2.0), ('a', 3.0)")

    def normalize(cursor=None):
        v = cursor["v"].astype(float)
        return {
            "k": cursor["k"],
            "z": (v - v.mean()) / v.std(),
        }

    db.register_table_function("normalize", normalize)
    rows = db.sql(
        "SELECT k, z FROM TABLE(normalize(CURSOR(SELECT k, v FROM t))) "
        "ORDER BY z"
    ).rows()
    assert len(rows) == 3
    assert rows[0][1] < rows[2][1]
    # strings survived the round trip
    assert {r[0] for r in rows} == {"a", "b"}


def test_table_function_join(db):
    db.sql("CREATE TABLE r (n INT, lbl TEXT)")
    db.sql("INSERT INTO r VALUES (2, 'two'), (4, 'four')")
    rows = db.sql(
        "SELECT g.generate_series, r.lbl FROM TABLE(generate_series(1, 5)) g "
        "JOIN r ON g.generate_series = r.n ORDER BY 1"
    ).rows()
    assert rows == [(2, "two"), (4, "four")]


# ---- ML / system table functions (reference SystemFunctions/os/ML) -------


def test_linear_reg_fit_predict(db):
    import numpy as np

    rng = np.random.default_rng(0)
    n = 400
    x1 = rng.normal(0, 1, n)
    y = 3.0 + 2.0 * x1
    db.sql("CREATE TABLE ml (id INT, y DOUBLE, x1 DOUBLE)")
    db.load_table("ml", {"id": np.arange(n, dtype=np.int32), "y": y, "x1": x1})
    coefs = db.sql(
        "SELECT coef FROM TABLE(linear_reg_fit(CURSOR(SELECT y, x1 FROM ml)))"
        " ORDER BY coef_idx"
    ).rows()
    assert abs(coefs[0][0] - 3.0) < 1e-6 and abs(coefs[1][0] - 2.0) < 1e-6
    preds = db.sql(
        "SELECT prediction FROM TABLE(linear_reg_predict("
        "CURSOR(SELECT id, x1 FROM ml), 3.0, 2.0)) ORDER BY id LIMIT 1"
    ).scalar()
    assert abs(preds - y[0]) < 1e-9


def test_kmeans_separates_blobs(db):
    import numpy as np

    rng = np.random.default_rng(1)
    f = np.concatenate([rng.normal(0, 0.1, 50), rng.normal(10, 0.1, 50)])
    db.sql("CREATE TABLE km (id INT, f DOUBLE)")
    db.load_table("km", {"id": np.arange(100, dtype=np.int32), "f": f})
    rows = db.sql(
        "SELECT cluster_id, COUNT(*) c FROM TABLE(kmeans("
        "CURSOR(SELECT id, f FROM km), 2)) GROUP BY cluster_id ORDER BY c"
    ).rows()
    assert [r[1] for r in rows] == [50, 50]


def test_dwell_times(db):
    db.sql("CREATE TABLE ev (e INT, s INT, ts BIGINT)")
    db.sql(
        "INSERT INTO ev VALUES (1, 100, 0), (1, 101, 60), (1, 102, 180), "
        "(2, 100, 10)"
    )
    rows = db.sql(
        "SELECT * FROM TABLE(tf_compute_dwell_times("
        "CURSOR(SELECT e, s, ts FROM ev))) ORDER BY ts"
    ).rows()
    assert rows == [(1, 100, 0, 60), (1, 101, 60, 120)]
