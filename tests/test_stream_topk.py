"""Streamed ORDER BY ... LIMIT over fragment waves (reference
StreamingTopN: top-k without materializing the whole input).  The union
of per-wave top-k is a superset of the global top-k, so waved select is
exact; differential-checked against the one-shot path and numpy."""

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def sdb():
    db = hdt.connect()
    db.config.stream_threshold_bytes = 1 << 14  # 16KB → tiny tables stream
    rng = np.random.default_rng(3)
    n = 40_000
    db.sql("CREATE TABLE s (k INT, v FLOAT, w INT) WITH (fragment_size=4096)")
    k = rng.integers(0, 1000, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    w = rng.integers(-50, 50, n).astype(np.int32)
    db.catalog.get_table("s").insert_columns({1: k, 2: v, 3: w})
    return db, k, v, w


def test_stream_topk_desc(sdb):
    db, k, v, w = sdb
    got = db.sql("SELECT k, v FROM s ORDER BY v DESC LIMIT 25").rows()
    order = np.argsort(-v, kind="stable")[:25]
    assert np.allclose([r[1] for r in got], v[order])


def test_stream_topk_asc_with_offset(sdb):
    db, k, v, w = sdb
    got = db.sql("SELECT w FROM s ORDER BY w LIMIT 10 OFFSET 5").rows()
    ws = np.sort(w)
    assert [r[0] for r in got] == ws[5:15].tolist()


def test_stream_topk_with_filter_and_exprs(sdb):
    db, k, v, w = sdb
    got = db.sql(
        "SELECT k + 1, v * 2 FROM s WHERE w > 0 ORDER BY v DESC LIMIT 7"
    ).rows()
    m = w > 0
    order = np.argsort(-v[m])[:7]
    assert np.allclose([r[1] for r in got], (v[m] * 2)[order], rtol=1e-6)
    assert [r[0] for r in got] == (k[m][order] + 1).tolist()


def test_stream_matches_oneshot(sdb):
    db, *_ = sdb
    q = "SELECT k, v, w FROM s ORDER BY v LIMIT 50"
    streamed = db.sql(q).rows()
    db.config.stream_threshold_bytes = -1  # disable streaming
    oneshot = db.sql(q).rows()
    assert streamed == oneshot


def test_stream_topk_nulls(sdb):
    db, k, v, w = sdb
    db.sql("INSERT INTO s VALUES (NULL, NULL, NULL)")
    got = db.sql("SELECT v FROM s ORDER BY v DESC NULLS FIRST LIMIT 3").rows()
    assert got[0][0] is None
    vs = np.sort(v)
    assert np.allclose([got[1][0], got[2][0]], [vs[-1], vs[-2]])
