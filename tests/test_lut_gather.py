"""ops.join.lut_gather: small-table lookups via one-hot MXU matmuls
(replaces ~14ns/row gathers through join build tables; exactness via
16-bit integer limbs + HIGHEST matmul precision — the default TPU bf16
passes rounded integers above 256)."""
import numpy as np
import pytest

import jax.numpy as jnp

import heavydb_tpu.ops.join as J


def test_lut_gather_exact_all_dtypes():
    rng = np.random.default_rng(0)
    B, n = 1531, 1 << 18
    tbl_i = rng.integers(-2**31, 2**31 - 1, B).astype(np.int32)
    tbl_f = rng.random(B).astype(np.float32)
    tbl_b = rng.integers(0, 2, B).astype(bool)
    tbl_16 = rng.integers(-2**15, 2**15 - 1, B).astype(np.int16)
    idx = rng.integers(0, B, n).astype(np.int32)
    out = J.lut_gather(
        [jnp.asarray(t) for t in (tbl_i, tbl_f, tbl_b, tbl_16)],
        jnp.asarray(idx),
    )
    assert out is not None
    for got, tbl in zip(out, (tbl_i, tbl_f, tbl_b, tbl_16)):
        got = np.asarray(got)
        assert got.dtype == tbl.dtype
        assert (got == tbl[idx]).all()


def test_lut_gather_falls_back():
    idx = jnp.zeros(1 << 18, jnp.int32)
    # table too big
    assert J.lut_gather([jnp.zeros(4096, jnp.int32)], idx) is None
    # too few rows
    assert J.lut_gather([jnp.zeros(8, jnp.int32)],
                        jnp.zeros(16, jnp.int32)) is None
    # 8-byte dtype
    assert J.lut_gather([jnp.zeros(64, jnp.float64)], idx) is None


def test_engine_join_through_lut(db, monkeypatch):
    """Force the lut path at small row counts and check join results."""
    monkeypatch.setattr(J, "_LUT_MIN_ROWS", 1)
    rng = np.random.default_rng(1)
    n = 30_000
    k = rng.integers(0, 500, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    db.sql("CREATE TABLE f (k INT, v FLOAT)")
    db.catalog.get_table("f").insert_columns({1: k, 2: v})
    db.sql("CREATE TABLE d (k INT, grp INT)")
    db.catalog.get_table("d").insert_columns({
        1: np.arange(500, dtype=np.int32),
        2: (np.arange(500, dtype=np.int32) % 7).astype(np.int32),
    })
    rows = db.sql(
        "SELECT d.grp, count(*), sum(f.v) FROM f JOIN d ON f.k = d.k "
        "GROUP BY d.grp ORDER BY d.grp").rows()
    grp = (k % 7)
    for g, cnt, s in rows:
        sel = grp == g
        assert cnt == int(sel.sum())
        assert s == pytest.approx(float(v[sel].sum()), rel=1e-5)
