"""Fragment-level in-place UPDATE/DELETE (reference
Fragmenter/UpdelStorage.cpp:55 updateColumn / compactRows:921):
- a 1-row UPDATE must rewrite exactly ONE fragment's SET column;
- DELETE compacts only the fragments that lose rows;
- the device scan cache migrates to the new generation by patching the
  resident arrays (scatter/gather) instead of re-uploading the table.
"""

import numpy as np

import heavydb_tpu as hdt
from heavydb_tpu.config import Config


def _mk(nfrag=8, frag_rows=100):
    db = hdt.connect(config=Config(default_fragment_rows=frag_rows))
    n = nfrag * frag_rows
    db.sql("CREATE TABLE t (id BIGINT, v BIGINT, s TEXT)")
    rows = ",".join(
        f"({i}, {i * 3}, 'name{i % 17}')" for i in range(n)
    )
    db.sql("INSERT INTO t VALUES " + rows)
    return db, db.catalog.get_table("t"), n


def _chunk_ids(t):
    return {
        (f.fragment_id, cid): id(f.chunks[cid])
        for f in t.fragments for cid in f.chunks
    }


def test_update_touches_one_fragment():
    db, t, n = _mk()
    assert len(t.fragments) == 8
    before = _chunk_ids(t)
    db.sql("UPDATE t SET v = -1 WHERE id = 250")  # fragment 2
    after = _chunk_ids(t)
    changed = {k for k in before if before[k] != after[k]}
    # exactly one (fragment, column) chunk replaced: fragment 2, col v(2)
    assert changed == {(2, 2)}, changed
    assert db.sql("SELECT v FROM t WHERE id = 250").rows()[0][0] == -1
    assert db.sql("SELECT count(*) FROM t WHERE v = -1").rows()[0][0] == 1


def test_update_multi_columns_and_fragments():
    db, t, n = _mk()
    before = _chunk_ids(t)
    db.sql("UPDATE t SET v = v + 1000, s = 'patched' "
           "WHERE id IN (50, 450)")
    after = _chunk_ids(t)
    changed = {k for k in before if before[k] != after[k]}
    assert changed == {(0, 2), (0, 3), (4, 2), (4, 3)}, changed
    got = db.sql("SELECT id, v, s FROM t WHERE s = 'patched' "
                 "ORDER BY id").rows()
    assert got == [(50, 1150, "patched"), (450, 2350, "patched")]


def test_delete_compacts_only_touched_fragments():
    db, t, n = _mk()
    before = _chunk_ids(t)
    db.sql("DELETE FROM t WHERE id >= 300 AND id < 310")  # fragment 3
    after = _chunk_ids(t)
    changed = {k for k in before if before[k] != after[k]}
    assert {f for f, _ in changed} == {3}
    assert t.fragments[3].num_rows == 90
    assert db.sql("SELECT count(*) FROM t").rows()[0][0] == n - 10
    assert db.sql("SELECT count(*) FROM t WHERE id >= 300 AND id < 310"
                  ).rows()[0][0] == 0


def test_update_null_predicate_semantics():
    db = hdt.connect()
    db.sql("CREATE TABLE u (a BIGINT, b BIGINT)")
    db.sql("INSERT INTO u VALUES (1, 10), (2, NULL), (3, 30)")
    # NULL predicate rows must not match (cond IS TRUE semantics)
    db.sql("UPDATE u SET a = 99 WHERE b > 15")
    assert sorted(db.sql("SELECT a FROM u").column(0)) == [1, 2, 99]
    db.sql("DELETE FROM u WHERE b > 15")
    assert sorted(db.sql("SELECT a FROM u").column(0)) == [1, 2]


def test_update_guard_no_spurious_division_error():
    db = hdt.connect()
    db.sql("CREATE TABLE d (a DOUBLE, b BIGINT)")
    db.sql("INSERT INTO d VALUES (1.0, 0), (2.0, 4)")
    # rows failing WHERE must not raise on the value expression
    db.sql("UPDATE d SET a = 1.0 / b WHERE b <> 0")
    got = sorted(db.sql("SELECT a FROM d").column(0))
    assert got == [0.25, 1.0]


def test_scan_cache_patched_not_reuploaded():
    db, t, n = _mk()
    ex = db.executor
    db.sql("SELECT sum(v) FROM t")  # populate the cache
    gen0 = t.generation
    keys0 = {k: v for k, v in ex.scan_cache.items()
             if k[0] == t.table_id and k[1] == gen0 and k[4] is None}
    assert keys0, "expected cached full-table columns"
    db.sql("UPDATE t SET v = 0 WHERE id = 10")
    gen1 = t.generation
    assert gen1 != gen0
    # migrated entries exist under the NEW generation without a query
    keys1 = {k: v for k, v in ex.scan_cache.items()
             if k[0] == t.table_id and k[1] == gen1 and k[4] is None}
    assert keys1, "cache was not migrated to the new generation"
    # untouched columns keep the SAME device buffer (no re-upload)
    for k0, v0 in keys0.items():
        cid = k0[2]
        k1 = (k0[0], gen1, cid, k0[3], None)
        if k1 in keys1 and cid != 2:  # col v(2) was patched
            assert keys1[k1] is v0, f"column {cid} was re-uploaded"
    # patched results must be correct straight from the migrated cache
    assert db.sql("SELECT sum(v) FROM t").rows()[0][0] == \
        sum(i * 3 for i in range(n)) - 30


def test_scan_cache_patched_after_delete():
    db, t, n = _mk()
    ex = db.executor
    base = db.sql("SELECT sum(v), count(*) FROM t").rows()[0]
    db.sql("DELETE FROM t WHERE id % 100 = 7")  # one row per fragment
    gen1 = t.generation
    keys1 = [k for k, _ in ex.scan_cache.items()
             if k[0] == t.table_id and k[1] == gen1 and k[4] is None]
    assert keys1, "cache was not migrated after DELETE"
    got = db.sql("SELECT sum(v), count(*) FROM t").rows()[0]
    assert got[1] == n - 8
    assert got[0] == base[0] - sum((f * 100 + 7) * 3 for f in range(8))
    # rowid stays the global physical position after compaction
    rids = db.sql("SELECT max(rowid), count(*) FROM t").rows()[0]
    assert rids[0] == rids[1] - 1


def test_updel_persistence_roundtrip(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p, config=Config(default_fragment_rows=100))
    db.sql("CREATE TABLE t (id BIGINT, v BIGINT)")
    db.sql("INSERT INTO t VALUES " + ",".join(
        f"({i}, {i})" for i in range(300)))
    db.sql("UPDATE t SET v = 7777 WHERE id = 150")
    db.sql("DELETE FROM t WHERE id = 299")
    db2 = hdt.connect(p)
    assert db2.sql("SELECT v FROM t WHERE id = 150").rows()[0][0] == 7777
    assert db2.sql("SELECT count(*) FROM t").rows()[0][0] == 299
