"""Staged host→device scan upload (the JumpBufferTransferMgr role):
chunked device_put + device-side pad, with chunk-stat-narrowed integer
transfer (narrow on the wire, widened + sentinel-remapped on device).
Thresholds are lowered so the CPU suite exercises the real path."""

import numpy as np
import pytest


@pytest.fixture()
def sdb(db):
    ex = db.executor
    old_min, old_chunk = ex._STAGE_MIN_BYTES, ex._STAGE_CHUNK_BYTES
    ex._STAGE_MIN_BYTES = 1 << 10
    ex._STAGE_CHUNK_BYTES = 1 << 12
    yield db
    ex._STAGE_MIN_BYTES, ex._STAGE_CHUNK_BYTES = old_min, old_chunk


def test_narrowed_bigint_with_nulls(sdb):
    n = 10_000
    rng = np.random.default_rng(1)
    k = rng.integers(-100, 900, n).astype(np.float64)
    k[rng.random(n) < 0.1] = np.nan  # None → BIGINT NULL
    v = rng.random(n)
    sdb.load_table(
        "st", {"k": np.where(np.isnan(k), np.nan, k), "v": v}, create=True,
        schema=[("k", "BIGINT"), ("v", "DOUBLE")],
    ) if False else None
    # use plain dict load: float with NaN → nullable BIGINT via SQL CAST
    sdb.sql("CREATE TABLE st (k BIGINT, v DOUBLE)")
    t = sdb.catalog.get_table("st")
    kk = np.where(np.isnan(k), np.iinfo(np.int64).min, k).astype(np.int64)
    t.insert_columns({1: kk, 2: v})
    nn = int(np.isnan(k).sum())
    rows = sdb.sql(
        "SELECT count(*), count(k), min(k), max(k), sum(v) FROM st"
    ).rows()
    got_n, got_k, got_min, got_max, got_sv = rows[0]
    assert got_n == n and got_k == n - nn
    assert got_min == int(np.nanmin(k)) and got_max == int(np.nanmax(k))
    assert got_sv == pytest.approx(float(v.sum()), rel=1e-9)
    # filters + group-by over the narrowed upload still exact
    want = int(((k >= 0) & (k < 100)).sum())
    assert sdb.sql(
        "SELECT count(*) FROM st WHERE k >= 0 AND k < 100"
    ).scalar() == want
    assert sdb.sql("SELECT count(*) FROM st WHERE k IS NULL").scalar() == nn


def test_wide_values_not_narrowed(sdb):
    n = 5_000
    rng = np.random.default_rng(2)
    k = rng.integers(-(2 ** 60), 2 ** 60, n)
    sdb.sql("CREATE TABLE wt (k BIGINT)")
    sdb.catalog.get_table("wt").insert_columns({1: k})
    assert sdb.sql("SELECT min(k), max(k) FROM wt").rows()[0] == (
        int(k.min()), int(k.max()))


def test_pad_tail_is_null(sdb):
    # row count far from the pow2 bucket → large device-side pad tail
    n = 3_001
    sdb.sql("CREATE TABLE pt (k INT)")
    sdb.catalog.get_table("pt").insert_columns({
        1: np.arange(n, dtype=np.int32)})
    assert sdb.sql("SELECT count(*), sum(k) FROM pt").rows()[0] == (
        n, n * (n - 1) // 2)
