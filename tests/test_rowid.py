"""rowid / SAMPLE_RATIO semantics: the virtual rowid is the GLOBAL
physical row position (reference: Catalog's implicit rowid column), so it
must be stable under fragment skipping, fragment-wave streaming, and join
expansion — and SAMPLE_RATIO (a hash of rowid) inherits that stability."""

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.config import Config
from heavydb_tpu.errors import BinderError

N = 100_000


def _mk(cfg, **extra):
    for k, v in extra.items():
        setattr(cfg, k, v)
    db = hdt.connect(config=cfg)
    db.load_table("t", {"x": np.arange(N, dtype=np.int64)}, create=True)
    return db


def test_rowid_basic():
    db = _mk(Config(default_fragment_rows=10_000))
    assert db.sql("SELECT COUNT(*) FROM t WHERE rowid < 5000").rows() == [(5000,)]
    assert db.sql("SELECT rowid FROM t WHERE x = 7").rows() == [(7,)]


def test_rowid_stable_under_fragment_skipping():
    a = _mk(Config(default_fragment_rows=10_000), enable_fragment_skipping=True)
    b = _mk(Config(default_fragment_rows=10_000), enable_fragment_skipping=False)
    q = "SELECT COUNT(*) FROM t WHERE x >= 50000 AND rowid < 100"
    assert a.sql(q).rows() == b.sql(q).rows() == [(0,)]
    q2 = "SELECT COUNT(*) FROM t WHERE x >= 50000 AND rowid < 50100"
    assert a.sql(q2).rows() == b.sql(q2).rows() == [(100,)]


def test_rowid_stable_under_wave_streaming():
    db = _mk(Config(default_fragment_rows=10_000, stream_threshold_bytes=100_000))
    r = db.sql("SELECT COUNT(*) FROM t WHERE rowid < 5000 AND x >= 0").rows()
    assert r == [(5000,)]


def test_rowid_through_join_expansion():
    db = hdt.connect()
    db.load_table("a", {"x": np.arange(10, dtype=np.int64)}, create=True)
    db.load_table("b", {"y": np.array([3, 3, 4], dtype=np.int64)}, create=True)
    r = db.sql(
        "SELECT a.rowid, a.x FROM a JOIN b ON a.x = b.y ORDER BY a.x"
    ).rows()
    assert r == [(3, 3), (3, 3), (4, 4)]


def test_rowid_bad_qualifier_rejected():
    db = hdt.connect()
    db.load_table("a", {"x": np.arange(3, dtype=np.int64)}, create=True)
    with pytest.raises(BinderError):
        db.sql("SELECT zzz.rowid FROM a")


def test_rowid_excluded_from_star():
    db = hdt.connect()
    db.load_table("a", {"x": np.arange(3, dtype=np.int64)}, create=True)
    rs = db.sql("SELECT * FROM a WHERE rowid = 1")
    assert rs.fields == ["x"]
    assert rs.rows() == [(1,)]


def test_sample_ratio_stable_across_streaming():
    base = _mk(Config(default_fragment_rows=10_000))
    stream = _mk(Config(default_fragment_rows=10_000,
                        stream_threshold_bytes=100_000))
    q = "SELECT COUNT(*) FROM t WHERE SAMPLE_RATIO(0.1) AND x >= 0"
    a = base.sql(q).rows()[0][0]
    b = stream.sql(q).rows()[0][0]
    assert a == b
    assert 0.05 * N < a < 0.15 * N


def test_duplicate_column_csv_export(tmp_path):
    db = hdt.connect()
    db.load_table("a", {"x": np.arange(3, dtype=np.int64)}, create=True)
    p = tmp_path / "dup.csv"
    db.sql(f"COPY (SELECT x, x FROM a) TO '{p}'")
    lines = p.read_text().strip().splitlines()
    assert lines[0].count("x") == 2
    assert lines[1] == "0,0"
