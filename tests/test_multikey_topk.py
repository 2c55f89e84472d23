"""Multi-column ORDER BY ... LIMIT rides the packed composite-key radix
select (exec/executor._composite_sort_plan + ops/sort.composite_topk_key)
— differential-tested against a numpy lexsort oracle and the engine's own
full-sort path.  Reference role: multi-column StreamingTopN
(QueryEngine/StreamingTopN.h, ResultSetSort.cpp)."""

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def tdb():
    db = hdt.connect()
    rng = np.random.default_rng(11)
    n = 50_000
    k = rng.integers(0, 1000, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    big = rng.integers(-10**12, 10**12, n).astype(np.int64)
    nv = np.where(rng.random(n) < 0.1, np.nan,
                  rng.random(n)).astype(np.float32)
    db.sql("CREATE TABLE mk (k INT, v FLOAT, big BIGINT, nv FLOAT) "
           "WITH (fragment_size=8192)")
    db.catalog.get_table("mk").insert_columns({1: k, 2: v, 3: big, 4: nv})
    return db, {"k": k, "v": v, "big": big, "nv": nv}


def _oracle_order(cols, specs, limit):
    """specs = [(name, asc, nulls_first)] in ORDER BY priority order."""
    keys = []
    for name, asc, nulls_first in reversed(specs):
        a = cols[name].astype(np.float64)
        isnan = np.isnan(a)
        a = np.where(isnan, 0.0, a)
        if not asc:
            a = -a
        keys.append(a)
        keys.append(np.where(isnan, -1.0 if nulls_first else 1.0, 0.0))
    return np.lexsort(keys)[:limit]


def _check(db, cols, sql, specs, out_names, limit):
    rows = db.sql(sql).rows()
    order = _oracle_order(cols, specs, limit)
    assert len(rows) == min(limit, len(order))
    for r, i in zip(rows, order):
        for j, name in enumerate(out_names):
            ref = cols[name][i]
            if isinstance(ref, np.floating) and np.isnan(ref):
                assert r[j] is None
            elif np.issubdtype(type(ref), np.floating):
                assert r[j] == pytest.approx(float(ref), rel=1e-6)
            else:
                assert r[j] == int(ref)


def test_int_asc_float_desc(tdb):
    db, cols = tdb
    _check(db, cols,
           "SELECT k, v FROM mk ORDER BY k ASC, v DESC LIMIT 20",
           [("k", True, False), ("v", False, True)], ["k", "v"], 20)


def test_float_desc_int_asc(tdb):
    db, cols = tdb
    _check(db, cols,
           "SELECT v, k FROM mk ORDER BY v DESC, k ASC LIMIT 15",
           [("v", False, True), ("k", True, False)], ["v", "k"], 15)


def test_bigint_with_int(tdb):
    db, cols = tdb
    # BIGINT narrows via chunk stats (range < 2^41) and packs beside k
    _check(db, cols,
           "SELECT big, k FROM mk ORDER BY big ASC, k DESC LIMIT 25",
           [("big", True, False), ("k", False, True)], ["big", "k"], 25)


@pytest.mark.parametrize("nulls_first", [True, False])
def test_nullable_key(tdb, nulls_first):
    db, cols = tdb
    nf = "NULLS FIRST" if nulls_first else "NULLS LAST"
    _check(db, cols,
           f"SELECT nv, k FROM mk ORDER BY nv ASC {nf}, k ASC LIMIT 30",
           [("nv", True, nulls_first), ("k", True, False)], ["nv", "k"], 30)


def test_three_keys(tdb):
    db, cols = tdb
    _check(db, cols,
           "SELECT k, v, big FROM mk "
           "ORDER BY k DESC, v ASC, big DESC LIMIT 10",
           [("k", False, True), ("v", True, False),
            ("big", False, True)], ["k", "v", "big"], 10)


def test_streamed_multikey_topk(tdb):
    db, cols = tdb
    db.config.stream_threshold_bytes = 1 << 14  # force fragment waves
    _check(db, cols,
           "SELECT k, v FROM mk ORDER BY k ASC, v DESC LIMIT 20",
           [("k", True, False), ("v", False, True)], ["k", "v"], 20)


def test_matches_full_sort_path(tdb):
    db, cols = tdb
    q = "FROM mk ORDER BY k ASC, v DESC, big ASC"
    fast = db.sql(f"SELECT k, v, big {q} LIMIT 40").rows()
    # limit > 16384 falls back to the full lexicographic sort
    slow = db.sql(f"SELECT k, v, big {q} LIMIT 20000").rows()[:40]
    assert fast == slow
