"""Storage shell tests: epoch checkpointing, recovery, rollback,
DUMP/RESTORE (reference Tests/FileMgrTest.cpp / EpochConsistency patterns)."""

import os

import numpy as np
import pytest

import heavydb_tpu as hdt


def test_persist_roundtrip(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT, s TEXT, v DOUBLE)")
    db.sql("INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', NULL)")
    db.sql("INSERT INTO t VALUES (3, 'a', 2.5)")
    del db

    db2 = hdt.connect(p)
    assert db2.sql("SELECT count(*) FROM t").scalar() == 3
    rows = db2.sql("SELECT s, sum(x) FROM t GROUP BY s ORDER BY s").rows()
    assert rows == [("a", 4), ("b", 2)]
    # schema survived
    assert db2.sql("SHOW TABLES").rows() == [("t",)]


def test_epoch_rollback(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    e1 = db.get_table_epoch("t")
    db.sql("INSERT INTO t VALUES (2), (3)")
    assert db.sql("SELECT count(*) FROM t").scalar() == 3
    db.set_table_epoch("t", e1)
    assert db.sql("SELECT count(*) FROM t").scalar() == 1
    # re-open keeps the rolled-back state
    del db
    db2 = hdt.connect(p)
    assert db2.sql("SELECT count(*) FROM t").scalar() == 1


def test_drop_table_removes_storage(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    db.sql("DROP TABLE t")
    del db
    db2 = hdt.connect(p)
    assert db2.sql("SHOW TABLES").rows() == []


def test_update_delete_persist(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1), (2), (3)")
    db.sql("UPDATE t SET x = x * 10 WHERE x > 1")
    db.sql("DELETE FROM t WHERE x = 1")
    del db
    db2 = hdt.connect(p)
    assert sorted(r[0] for r in db2.sql("SELECT x FROM t").rows()) == [20, 30]


def test_dump_restore(tmp_path, db):
    db.sql("CREATE TABLE t (x INT, s TEXT)")
    db.sql("INSERT INTO t VALUES (1, 'hello'), (2, NULL)")
    dump = str(tmp_path / "t.tgz")
    db.sql(f"DUMP TABLE t TO '{dump}'")
    assert os.path.exists(dump)
    db.sql("DROP TABLE t")
    db.sql(f"RESTORE TABLE t FROM '{dump}'")
    rows = db.sql("SELECT * FROM t ORDER BY x").rows()
    assert rows == [(1, "hello"), (2, None)]


def test_crash_recovery_ignores_uncommitted(tmp_path):
    """Chunks written without a committed epoch bump are invisible after
    reopen (reference: pages above last epoch ignored)."""
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    t = db.catalog.get_table("t")
    store = db._table_stores[t.table_id]
    # simulate a crash mid-checkpoint: write orphan chunk + manifest but no
    # epoch commit
    import json

    import numpy as np

    epoch = store.committed_epoch()
    orphan = store._chunk_path(0, 1, epoch + 1)
    with open(orphan, "wb") as f:
        np.save(f, np.array([1, 2, 3, 4], np.int32))
    del db
    db2 = hdt.connect(p)
    assert db2.sql("SELECT count(*) FROM t").scalar() == 1


# ---- fragment-level in-place UPDATE/DELETE (reference UpdelStorage) ------


def test_inplace_update_touches_only_affected_fragments(db):
    import numpy as np

    import heavydb_tpu as hdt

    d = hdt.connect()
    d.sql("CREATE TABLE f (x INT, y DOUBLE) WITH (fragment_size=100)")
    d.load_table("f", {"x": np.arange(250, dtype=np.int32),
                       "y": np.zeros(250)})
    t = d.catalog.get_table("f")
    assert len(t.fragments) == 3
    chunk0_before = t.fragments[0].chunks[2]
    # rows 200..249 live in fragment 2 only
    d.sql("UPDATE f SET y = 1.5 WHERE x >= 200")
    assert t.fragments[0].chunks[2] is chunk0_before  # untouched fragment
    assert t.fragments[2].dirty_cols == {2}
    assert d.sql("SELECT SUM(y) FROM f").scalar() == 75.0
    # guarded evaluation: no division-by-zero on unselected rows
    d.sql("UPDATE f SET y = 100.0 / x WHERE x = 200")
    assert d.sql("SELECT y FROM f WHERE x = 200").scalar() == 0.5


def test_inplace_delete_compacts_fragment(db):
    import numpy as np
    import heavydb_tpu as hdt

    d = hdt.connect()
    d.sql("CREATE TABLE g (x INT) WITH (fragment_size=100)")
    d.load_table("g", {"x": np.arange(250, dtype=np.int32)})
    t = d.catalog.get_table("g")
    c1_before = t.fragments[1].chunks[1]
    d.sql("DELETE FROM g WHERE x < 10")
    assert t.fragments[0].num_rows == 90
    assert t.fragments[1].chunks[1] is c1_before
    assert d.sql("SELECT COUNT(*), MIN(x) FROM g").rows() == [(240, 10)]


def test_inplace_update_persists(tmp_path):
    import heavydb_tpu as hdt

    p = str(tmp_path / "upd")
    db = hdt.connect(p)
    db.sql("CREATE TABLE u (k INT, s TEXT)")
    db.sql("INSERT INTO u VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    db.sql("UPDATE u SET s = 'zz' WHERE k = 2")
    db.sql("DELETE FROM u WHERE k = 3")
    del db
    db2 = hdt.connect(p)
    assert db2.sql("SELECT k, s FROM u ORDER BY k").rows() == [
        (1, "a"), (2, "zz"),
    ]


def test_catalog_migration_v1_to_v2(tmp_path):
    """A v1 catalog (no shard metadata) opens cleanly and is migrated
    (reference MigrationMgr stepwise version upgrades)."""
    import json
    import os

    import heavydb_tpu as hdt

    root = str(tmp_path / "dbv1")
    db = hdt.connect(root)
    db.sql("CREATE TABLE mt (x INT, s TEXT)")
    db.sql("INSERT INTO mt VALUES (1, 'a'), (2, 'b')")
    db.close() if hasattr(db, "close") else None
    # rewrite catalog.json as version 1 without the v2 fields
    path = os.path.join(root, "catalog.json")
    with open(path) as f:
        data = json.load(f)
    data["version"] = 1
    for tm in data["tables"]:
        tm.pop("shard_key", None)
        tm.pop("shard_count", None)
    with open(path, "w") as f:
        json.dump(data, f)
    db2 = hdt.connect(root)
    t = db2.catalog.get_table("mt")
    assert t.shard_key is None and t.shard_count == 0
    assert db2.sql("SELECT count(*) FROM mt").rows()[0][0] == 2


def test_shard_key_persists(tmp_path):
    import heavydb_tpu as hdt

    root = str(tmp_path / "dbshard")
    db = hdt.connect(root)
    db.sql("CREATE TABLE sp (k INT, v INT, SHARD KEY (k)) "
           "WITH (shard_count=8)")
    db2 = hdt.connect(root)
    t = db2.catalog.get_table("sp")
    assert t.shard_key == "k" and t.shard_count == 8


def test_newer_catalog_version_refused(tmp_path):
    import json
    import os

    import pytest

    import heavydb_tpu as hdt

    root = str(tmp_path / "dbnew")
    db = hdt.connect(root)
    db.sql("CREATE TABLE nv (x INT)")
    path = os.path.join(root, "catalog.json")
    with open(path) as f:
        data = json.load(f)
    data["version"] = 99
    with open(path, "w") as f:
        json.dump(data, f)
    with pytest.raises(Exception):
        hdt.connect(root)


def test_chunk_encoders_roundtrip(tmp_path, rng):
    """RL / DIFF chunk encoders (reference RunLength/Diff encoder roles):
    the smallest of raw/rle/diff is chosen per chunk and round-trips."""
    from heavydb_tpu.storage.persist import decode_chunk, encode_chunk

    sorted_lownd = np.repeat(np.arange(50, dtype=np.int32), 200)
    monotonic = (np.arange(10_000, dtype=np.int64) * 60
                 + rng.integers(0, 30, 10_000))
    random_col = rng.integers(-2**40, 2**40, 10_000)
    for arr, want_enc in [
        (sorted_lownd, "rle"),
        (monotonic, "diff"),
        (random_col, "raw"),
    ]:
        enc, parts = encode_chunk(arr)
        assert enc == want_enc, (enc, want_enc)
        back = decode_chunk(enc, parts, arr.dtype)
        np.testing.assert_array_equal(back, arr)
        if enc != "raw":
            assert sum(p.nbytes for p in parts) < arr.nbytes

    # negative / wrapping deltas stay exact
    jumpy = np.array([2**62, -2**62, 0, 2**61, -5], np.int64)
    enc, parts = encode_chunk(np.repeat(jumpy, 100))
    back = decode_chunk(enc, parts, np.dtype(np.int64))
    np.testing.assert_array_equal(back, np.repeat(jumpy, 100))


def test_encoded_chunks_persist_roundtrip(tmp_path, rng):
    import heavydb_tpu as hdt

    d = str(tmp_path / "encdb")
    db = hdt.connect(d)
    n = 20_000
    ts = np.arange(n, dtype=np.int64) * 30 + 1_600_000_000
    g = np.repeat(np.arange(20, dtype=np.int32), n // 20)
    v = rng.random(n)
    db.load_table("ev", {"ts": ts, "g": g, "v": v}, create=True)
    db.checkpoint()
    db2 = hdt.connect(d)
    assert db2.sql("SELECT count(*), min(g), max(g) FROM ev").rows() == \
        [(n, 0, 19)]
    r1 = db.sql("SELECT g, count(*) FROM ev GROUP BY g ORDER BY g").rows()
    r2 = db2.sql("SELECT g, count(*) FROM ev GROUP BY g ORDER BY g").rows()
    assert r1 == r2
