"""Dynamic selectivity probe (reference JoinFilterPushDown.cpp +
DBHandler::execute_rel_alg_with_filter_push_down): post-filter
cardinalities feed the runtime join reorder, so a big table with a
super-selective filter becomes the build side."""

import sqlite3

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture(scope="module")
def pdb():
    db = hdt.connect()
    rng = np.random.default_rng(11)
    n_big, n_mid = 200_000, 5_000
    big = {
        "k": rng.integers(0, n_mid, n_big).astype(np.int32),
        "sel": rng.integers(0, 10_000, n_big).astype(np.int32),
        "v": rng.random(n_big).astype(np.float32),
    }
    mid = {
        "k": np.arange(n_mid, dtype=np.int32),
        "grp": rng.integers(0, 7, n_mid).astype(np.int32),
    }
    db.load_table("big", big, create=True)
    db.load_table("mid", mid, create=True)
    con = sqlite3.connect(":memory:")
    cur = con.cursor()
    cur.execute("CREATE TABLE big (k INT, sel INT, v REAL)")
    cur.executemany("INSERT INTO big VALUES (?,?,?)",
                    zip(big["k"].tolist(), big["sel"].tolist(),
                        big["v"].tolist()))
    cur.execute("CREATE TABLE mid (k INT, grp INT)")
    cur.executemany("INSERT INTO mid VALUES (?,?)",
                    zip(mid["k"].tolist(), mid["grp"].tolist()))
    return db, cur


def test_selective_filter_probed_and_correct(pdb):
    db, cur = pdb
    # big is 40x mid, but the filter keeps ~0.05% of big — the probed
    # count should flip big onto the build side (and results must match
    # the oracle either way)
    q = ("SELECT m.grp, count(*) FROM big b JOIN mid m ON b.k = m.k "
         "WHERE b.sel < 5 GROUP BY m.grp ORDER BY m.grp")
    got = db.sql(q).rows()
    want = cur.execute(q).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any(k[0] == "selprobe" for k in db.executor._sel_cache), \
        "probe did not run (cache empty)"


def test_probe_cached_across_runs(pdb):
    db, _ = pdb
    q = ("SELECT count(*) FROM big b JOIN mid m ON b.k = m.k "
         "WHERE b.sel < 5")
    r1 = db.sql(q).rows()
    size_after_first = len(db.executor._sel_cache)
    r2 = db.sql(q).rows()
    assert r1 == r2
    assert len(db.executor._sel_cache) == size_after_first


def test_probe_disabled_still_correct(pdb):
    db, cur = pdb
    db.config.enable_selectivity_probe = False
    try:
        q = ("SELECT m.grp, sum(b.v) FROM big b JOIN mid m ON b.k = m.k "
             "WHERE b.sel < 100 GROUP BY m.grp ORDER BY m.grp")
        got = db.sql(q).rows()
        want = cur.execute(q).fetchall()
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0]
            assert abs(g[1] - w[1]) < 1e-2
    finally:
        db.config.enable_selectivity_probe = True
