"""Remote FSI wrappers: S3-spooled files and DB-API (ODBC-role) SELECT
imports, driven by fixture transports (this environment has zero egress;
the reference's S3/ODBC wrappers are exercised the same way in its
fixture-backed FSI tests, DataMgr/ForeignStorage/)."""

import os
import shutil
import sqlite3

import pytest

from heavydb_tpu.io import remote


@pytest.fixture()
def s3_fixture(tmp_path):
    """Local-directory S3 stand-in: s3://bucket/key reads
    tmp_path/bucket/key."""
    root = tmp_path / "s3root"

    def fetch(bucket, key, dest, options):
        src = root / bucket / key
        if not src.exists():
            raise remote.SqlError(f"NoSuchKey: s3://{bucket}/{key}")
        shutil.copyfile(src, dest)

    remote.register_s3_transport(fetch)
    yield root
    remote.register_s3_transport(None)


def test_s3_delimited_foreign_table(db, s3_fixture):
    bucket = s3_fixture / "mybucket" / "data"
    bucket.mkdir(parents=True)
    (bucket / "fact.csv").write_text("k,v\n1,10.5\n2,20.5\n1,30.0\n")
    db.sql(
        "CREATE SERVER s3srv FOREIGN DATA WRAPPER delimited_file "
        "WITH (s3_region = 'us-east-1')"
    )
    db.sql(
        "CREATE FOREIGN TABLE f3 (k INT, v DOUBLE) SERVER s3srv "
        "WITH (file_path = 's3://mybucket/data/fact.csv')"
    )
    rows = db.sql(
        "SELECT k, count(*), sum(v) FROM f3 GROUP BY k ORDER BY k"
    ).rows()
    assert rows == [(1, 2, 40.5), (2, 1, 20.5)]


def test_s3_refresh_refetches(db, s3_fixture):
    bucket = s3_fixture / "b2"
    bucket.mkdir(parents=True)
    (bucket / "t.csv").write_text("x\n1\n2\n")
    db.sql("CREATE SERVER s3b FOREIGN DATA WRAPPER delimited_file")
    db.sql(
        "CREATE FOREIGN TABLE fr (x INT) SERVER s3b "
        "WITH (file_path = 's3://b2/t.csv')"
    )
    assert db.sql("SELECT count(*) FROM fr").scalar() == 2
    (bucket / "t.csv").write_text("x\n1\n2\n3\n4\n")
    db.sql("REFRESH FOREIGN TABLES fr")
    assert db.sql("SELECT count(*) FROM fr").scalar() == 4


def test_s3_missing_object_errors(db, s3_fixture):
    db.sql("CREATE SERVER s3c FOREIGN DATA WRAPPER delimited_file")
    from heavydb_tpu.errors import SqlError

    with pytest.raises(SqlError):
        db.sql(
            "CREATE FOREIGN TABLE missing (x INT) SERVER s3c "
            "WITH (file_path = 's3://nowhere/nothing.csv')"
        )


@pytest.fixture()
def sqlite_src(tmp_path):
    p = str(tmp_path / "src.db")
    conn = sqlite3.connect(p)
    conn.execute("CREATE TABLE remote_t (k INTEGER, v REAL, s TEXT)")
    conn.executemany(
        "INSERT INTO remote_t VALUES (?, ?, ?)",
        [(1, 1.5, "a"), (2, 2.5, "b"), (1, 3.5, None), (3, None, "a")],
    )
    conn.commit()
    conn.close()
    return p


def test_dbapi_foreign_table_declared_schema(db, sqlite_src):
    db.sql(
        "CREATE SERVER odbc1 FOREIGN DATA WRAPPER sql_select "
        f"WITH (dbapi = 'sqlite3', database = '{sqlite_src}')"
    )
    db.sql(
        "CREATE FOREIGN TABLE ext (k INT, v DOUBLE, s TEXT) SERVER odbc1 "
        "WITH (remote_table = 'remote_t')"
    )
    rows = db.sql(
        "SELECT k, count(*), sum(v) FROM ext GROUP BY k ORDER BY k"
    ).rows()
    assert rows == [(1, 2, 5.0), (2, 1, 2.5), (3, 1, None)]
    assert db.sql(
        "SELECT count(*) FROM ext WHERE s = 'a'"
    ).scalar() == 2


def test_dbapi_foreign_table_inferred_schema(db, sqlite_src):
    db.sql(
        "CREATE SERVER odbc2 FOREIGN DATA WRAPPER sql_select "
        f"WITH (dbapi = 'sqlite3', database = '{sqlite_src}')"
    )
    db.sql(
        "CREATE FOREIGN TABLE ext2 SERVER odbc2 "
        "WITH (sql_select = 'SELECT k, v FROM remote_t WHERE k < 3')"
    )
    rows = db.sql("SELECT k, v FROM ext2 ORDER BY k, v").rows()
    assert [r[0] for r in rows] == [1, 1, 2]


def test_dbapi_refresh_sees_source_changes(db, sqlite_src):
    db.sql(
        "CREATE SERVER odbc3 FOREIGN DATA WRAPPER sql_select "
        f"WITH (dbapi = 'sqlite3', database = '{sqlite_src}')"
    )
    db.sql(
        "CREATE FOREIGN TABLE ext3 (k INT, v DOUBLE, s TEXT) SERVER odbc3 "
        "WITH (remote_table = 'remote_t')"
    )
    assert db.sql("SELECT count(*) FROM ext3").scalar() == 4
    conn = sqlite3.connect(sqlite_src)
    conn.execute("INSERT INTO remote_t VALUES (9, 9.0, 'z')")
    conn.commit()
    conn.close()
    db.sql("REFRESH FOREIGN TABLES ext3")
    assert db.sql("SELECT count(*) FROM ext3").scalar() == 5


def test_dbapi_registered_factory(db, tmp_path):
    calls = []

    def factory(options):
        calls.append(options.get("tag"))
        conn = sqlite3.connect(":memory:")
        conn.execute("CREATE TABLE t (a INTEGER)")
        conn.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(5)])
        conn.commit()
        return conn

    remote.register_dbapi_factory("mydriver", factory)
    try:
        db.sql(
            "CREATE SERVER odbc4 FOREIGN DATA WRAPPER sql_select "
            "WITH (dbapi = 'mydriver', tag = 'hello')"
        )
        db.sql(
            "CREATE FOREIGN TABLE ext4 (a INT) SERVER odbc4 "
            "WITH (remote_table = 't')"
        )
        assert db.sql("SELECT sum(a) FROM ext4").scalar() == 10
        assert calls == ["hello"]
    finally:
        remote._dbapi_factories.pop("mydriver", None)


def test_foreign_write_rejected(db, sqlite_src):
    db.sql(
        "CREATE SERVER odbc5 FOREIGN DATA WRAPPER sql_select "
        f"WITH (dbapi = 'sqlite3', database = '{sqlite_src}')"
    )
    db.sql(
        "CREATE FOREIGN TABLE ext5 (k INT, v DOUBLE, s TEXT) SERVER odbc5 "
        "WITH (remote_table = 'remote_t')"
    )
    from heavydb_tpu.errors import SqlError

    with pytest.raises(SqlError):
        db.sql("INSERT INTO ext5 VALUES (1, 1.0, 'x')")
