"""DeviceLRUCache eviction (reference BufferMgr slab LRU) and
fragment-streaming execution (out-of-core aggregates)."""

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.config import Config
from heavydb_tpu.storage.buffer_mgr import DeviceLRUCache


def test_lru_eviction_budget():
    c = DeviceLRUCache(budget_bytes=100)
    a = np.zeros(10, np.int32)  # 40 bytes
    c[("t", 1)] = a
    c[("t", 2)] = np.zeros(10, np.int32)
    assert c.total_bytes == 80
    c[("t", 3)] = np.zeros(10, np.int32)  # over budget -> evict oldest
    assert c.total_bytes == 80
    assert c.get(("t", 1)) is None
    assert c.get(("t", 2)) is not None
    assert c.evictions == 1


def test_lru_recency_order():
    c = DeviceLRUCache(budget_bytes=100)
    c[("a",)] = np.zeros(10, np.int32)
    c[("b",)] = np.zeros(10, np.int32)
    assert c.get(("a",)) is not None  # touch a -> b becomes LRU
    c[("c",)] = np.zeros(10, np.int32)
    assert c.get(("b",)) is None
    assert c.get(("a",)) is not None and c.get(("c",)) is not None


def test_lru_unbounded_and_stats():
    c = DeviceLRUCache(budget_bytes=0)
    for i in range(50):
        c[(i,)] = np.zeros(100, np.int64)
    assert len(c) == 50 and c.evictions == 0
    s = c.stats()
    assert s["bytes"] == 50 * 800


def test_scan_cache_eviction_keeps_results_correct():
    cfg = Config(device_cache_bytes=200_000,
                 default_fragment_rows=10_000)
    db = hdt.connect(config=cfg)
    rng = np.random.default_rng(0)
    for t in ("ta", "tb", "tc"):
        db.load_table(
            t, {"x": rng.integers(0, 100, 60_000).astype(np.int32)},
            create=True,
        )
    # cycle through tables repeatedly: buffers evict between queries but
    # every query still answers from the host master copy
    for _ in range(2):
        for t in ("ta", "tb", "tc"):
            r = db.sql(f"SELECT count(*), sum(x) FROM {t}").rows()
            assert r[0][0] == 60_000
    assert db.executor.scan_cache.evictions > 0


def test_streamed_aggregate_parity(rng):
    n = 300_000
    k = rng.integers(0, 250, n).astype(np.int32)
    v = np.where(rng.random(n) < 0.1, np.nan, rng.random(n)).astype(np.float32)
    w = rng.integers(-500, 500, n).astype(np.int32)

    def run(threshold):
        db = hdt.connect(config=Config(
            stream_threshold_bytes=threshold, default_fragment_rows=40_000))
        db.load_table("t", {"k": k, "v": v, "w": w}, create=True)
        return [
            db.sql("SELECT count(*), sum(w), avg(v), min(w), max(v) "
                   "FROM t WHERE w > 0").rows(),
            db.sql("SELECT k, count(v), sum(v), avg(w) FROM t "
                   "GROUP BY k ORDER BY k").rows(),
            db.sql("SELECT k % 9, sum(w) FROM t GROUP BY k % 9 "
                   "HAVING count(*) > 50 ORDER BY 1").rows(),
        ]

    base = run(-1)
    streamed = run(50_000)
    for a, b in zip(base, streamed):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            for x, y in zip(ra, rb):
                if isinstance(x, float):
                    assert y == pytest.approx(x, rel=1e-5, abs=1e-6)
                else:
                    assert x == y


def test_streaming_not_used_for_unsupported_aggs(rng):
    # COUNT(DISTINCT) is not decomposable -> normal path, still correct
    n = 120_000
    k = rng.integers(0, 50, n).astype(np.int32)
    v = rng.integers(0, 1000, n).astype(np.int32)
    db = hdt.connect(config=Config(
        stream_threshold_bytes=10_000, default_fragment_rows=30_000))
    db.load_table("t", {"k": k, "v": v}, create=True)
    rows = db.sql(
        "SELECT k, count(DISTINCT v) FROM t GROUP BY k ORDER BY k"
    ).rows()
    import collections

    ref = collections.defaultdict(set)
    for kk, vv in zip(k, v):
        ref[int(kk)].add(int(vv))
    assert [(r[0], r[1]) for r in rows] == [
        (i, len(ref[i])) for i in sorted(ref)
    ]


def test_streaming_excludes_dict_string_minmax(rng):
    """MIN/MAX over dict strings must NOT stream: the finalized partial is
    a dictionary ID while ordering is by lexicographic rank, so merging
    ids across waves would pick the wrong string.  The query stays on the
    single-pass path and remains correct."""
    n = 150_000
    # intern order deliberately NOT sorted: 'zz' gets id 0
    words = ["zz", "mm", "aa", "qq"]
    s = np.array([words[i] for i in rng.integers(0, 4, n)], object)
    k = rng.integers(0, 20, n).astype(np.int32)

    def run(threshold):
        db = hdt.connect(config=Config(
            stream_threshold_bytes=threshold, default_fragment_rows=30_000))
        db.load_table("t", {"k": k, "s": s}, create=True)
        return db.sql(
            "SELECT k, MIN(s), MAX(s) FROM t GROUP BY k ORDER BY k"
        ).rows()

    assert run(-1) == run(20_000)
    rows = run(20_000)
    assert rows[0][1] == "aa" and rows[0][2] == "zz"


def test_eager_prestage(monkeypatch):
    import jax

    import heavydb_tpu as hdt

    db = hdt.connect()
    db.config.eager_device_staging = True
    db.config.eager_staging_min_rows = 10
    n = 5000
    rng = np.random.default_rng(3)
    db.load_table(
        "stg",
        {"a": rng.integers(0, 9, n).astype(np.int32),
         "b": rng.random(n).astype(np.float32)},
        create=True,
    )
    t = db.catalog.get_table("stg")
    ex = db.executor
    from heavydb_tpu.exec import batch as B

    size = B.bucket(t.num_rows)
    staged = [
        k for k, _ in ex.scan_cache.items()
        if k[0] == t.table_id and k[1] == t.generation and k[3] == size
    ]
    assert len(staged) == 2  # both columns resident before any query
    r = db.sql("SELECT a, count(*), sum(b) FROM stg GROUP BY a").rows()
    assert sum(c for _, c, _ in r) == n
