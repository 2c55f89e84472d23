"""Force the TPU-only aggregation strategies (one-hot scan / minmax scan)
on the CPU backend and verify exactness — catches NaN-poisoning and limb
arithmetic bugs without TPU hardware."""

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.ops import groupby as G


@pytest.fixture()
def tpu_paths(monkeypatch):
    monkeypatch.setattr(G, "_on_tpu", lambda: True)


def test_onehot_scan_groupby_exact(tpu_paths, rng):
    db = hdt.connect()
    n = 100_000
    k = rng.integers(0, 500, n).astype(np.int32)
    vf = np.where(rng.random(n) < 0.15, np.nan, rng.random(n)).astype(np.float32)
    vi = rng.integers(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)
    db.sql("CREATE TABLE t (k INT, vf FLOAT, vi INT)")
    db.catalog.get_table("t").insert_columns({1: k, 2: vf, 3: vi})
    rows = sorted(
        db.sql(
            "SELECT k, count(*), count(vf), sum(vf), sum(vi), min(vi), "
            "max(vi), avg(vf) FROM t GROUP BY k"
        ).rows()
    )
    m = ~np.isnan(vf)
    ref_c = np.bincount(k, minlength=500)
    ref_cf = np.bincount(k[m], minlength=500)
    ref_sf = np.bincount(k[m], weights=vf[m].astype(np.float64), minlength=500)
    ref_si = np.zeros(500, np.int64)
    np.add.at(ref_si, k, vi.astype(np.int64))
    ref_mn = np.full(500, 2**31 - 1, np.int64)
    np.minimum.at(ref_mn, k, vi)
    ref_mx = np.full(500, -(2**31), np.int64)
    np.maximum.at(ref_mx, k, vi)
    for i in range(500):
        r = rows[i]
        assert r[1] == ref_c[i] and r[2] == ref_cf[i]
        assert r[3] == pytest.approx(ref_sf[i], rel=1e-3)
        assert r[4] == ref_si[i], f"int sum mismatch at {i}"
        assert r[5] == ref_mn[i] and r[6] == ref_mx[i]
        assert r[7] == pytest.approx(ref_sf[i] / max(ref_cf[i], 1), rel=1e-3)


def test_onehot_scan_bigint_sum_exact(tpu_paths, rng):
    # BIGINT args must take the 8-limb exact path, not the f32 stream
    # (round-1 advisor finding: int64 sums were accumulated in f32)
    db = hdt.connect()
    n = 60_000
    k = rng.integers(0, 300, n).astype(np.int32)
    v = rng.integers(-(2**52), 2**52, n).astype(np.int64)
    db.sql("CREATE TABLE tb (k INT, v BIGINT)")
    db.catalog.get_table("tb").insert_columns({1: k, 2: v})
    rows = sorted(
        db.sql("SELECT k, SUM(v), AVG(v), COUNT(*) FROM tb GROUP BY k").rows()
    )
    ref = np.zeros(300, np.int64)
    np.add.at(ref, k, v)
    ref_c = np.bincount(k, minlength=300)
    for i in range(300):
        assert rows[i][1] == ref[i], f"BIGINT sum mismatch at group {i}"
        assert rows[i][3] == ref_c[i]
        assert rows[i][2] == pytest.approx(ref[i] / ref_c[i], rel=1e-12)


def test_small_slot_paths_exact(tpu_paths, rng):
    db = hdt.connect()
    n = 50_000
    k = rng.integers(0, 5, n).astype(np.int32)
    v = rng.integers(-1000, 1000, n).astype(np.int32)
    db.sql("CREATE TABLE t (k INT, v INT)")
    db.catalog.get_table("t").insert_columns({1: k, 2: v})
    rows = sorted(db.sql("SELECT k, count(*), sum(v) FROM t GROUP BY k").rows())
    ref_c = np.bincount(k, minlength=5)
    ref_s = np.zeros(5, np.int64)
    np.add.at(ref_s, k, v.astype(np.int64))
    for i in range(5):
        assert rows[i][1] == ref_c[i] and rows[i][2] == ref_s[i]


def test_tiled_onehot_scan_exact(tpu_paths, rng):
    # slots > 4096 → the slot-tiled one-hot path (flights Q004 shape)
    db = hdt.connect()
    n = 120_000
    k = rng.integers(0, 9000, n).astype(np.int32)
    v = np.where(rng.random(n) < 0.1, np.nan, rng.normal(5, 3, n))
    db.sql("CREATE TABLE tt (k INT, v DOUBLE)")
    db.catalog.get_table("tt").insert_columns({1: k, 2: v})
    rows = db.sql(
        "SELECT k, COUNT(*), COUNT(v), SUM(v), MIN(v), MAX(v) FROM tt "
        "GROUP BY k ORDER BY k"
    ).rows()
    m = ~np.isnan(v)
    want_c = np.bincount(k, minlength=9000)
    want_cv = np.bincount(k[m], minlength=9000)
    want_s = np.zeros(9000)
    np.add.at(want_s, k[m], v[m])
    seen = 0
    for r in rows:
        i = r[0]
        assert r[1] == want_c[i] and r[2] == want_cv[i]
        assert r[3] is None or abs(r[3] - want_s[i]) < 1e-4
        if want_cv[i]:
            assert abs(r[4] - v[m][k[m] == i].min()) < 1e-12
            assert abs(r[5] - v[m][k[m] == i].max()) < 1e-12
        seen += 1
    assert seen == (want_c > 0).sum()


def test_blocked_cumsum_matches_numpy(rng):
    import jax.numpy as jnp

    from heavydb_tpu.ops import scan as SC

    for n in (0, 1, 1000, (1 << 20) - 3, (1 << 20) + 17, 3_000_001):
        x = rng.integers(-5, 9, n).astype(np.int32)
        got = np.asarray(SC.cumsum(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x))
    x = rng.integers(0, 2, 2_500_000).astype(np.int64)
    got = np.asarray(SC.cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_distinct_sum_on_shared_scan_path(tpu_paths, rng):
    """SUM/AVG(DISTINCT) must NOT ride the shared one-hot scan (which
    sums every row) — it routes to the sorted distinct machinery even
    when the TPU mid-slot strategy is active."""
    db = hdt.connect()
    n = 50_000
    k = rng.integers(0, 300, n).astype(np.int32)
    v = rng.integers(0, 8, n).astype(np.int32)  # heavy duplication
    db.sql("CREATE TABLE td (k INT, v INT)")
    db.catalog.get_table("td").insert_columns({1: k, 2: v})
    rows = sorted(
        db.sql(
            "SELECT k, sum(DISTINCT v), avg(DISTINCT v), sum(v) "
            "FROM td GROUP BY k"
        ).rows()
    )
    import collections

    per = collections.defaultdict(set)
    tot = collections.defaultdict(int)
    for kk, vv in zip(k, v):
        per[int(kk)].add(int(vv))
        tot[int(kk)] += int(vv)
    for kk, sd, ad, s in rows:
        assert sd == sum(per[kk]), kk
        assert ad == pytest.approx(sum(per[kk]) / len(per[kk]))
        assert s == tot[kk]


def test_keyless_distinct_sum_not_fused(tpu_paths, rng):
    db = hdt.connect()
    n = 20_000
    v = rng.integers(0, 50, n).astype(np.int32)
    db.sql("CREATE TABLE td2 (v INT)")
    db.catalog.get_table("td2").insert_columns({1: v})
    assert db.sql("SELECT sum(DISTINCT v) FROM td2").rows() == [
        (int(np.unique(v).sum()),)
    ]
