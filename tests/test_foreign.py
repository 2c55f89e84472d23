"""FSI foreign table tests — reference DataMgr/ForeignStorage wrappers
(CsvDataWrapper, ParquetDataWrapper, RegexParserDataWrapper), CREATE
SERVER / CREATE FOREIGN TABLE / REFRESH FOREIGN TABLES DDL."""

import os

import numpy as np
import pytest


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("a,b,c\n1,x,1.5\n2,y,2.5\n3,x,3.5\n")
    return str(p)


def test_delimited_foreign_table(db, csv_file):
    db.sql(
        f"CREATE FOREIGN TABLE ft (a INT, b TEXT, c DOUBLE) "
        f"SERVER default_local_delimited WITH (file_path='{csv_file}')"
    )
    assert db.sql(
        "SELECT b, SUM(c) FROM ft GROUP BY b ORDER BY b"
    ).rows() == [("x", 5.0), ("y", 2.5)]


def test_refresh_picks_up_changes(db, csv_file):
    db.sql(
        f"CREATE FOREIGN TABLE ft (a INT, b TEXT, c DOUBLE) "
        f"SERVER default_local_delimited WITH (file_path='{csv_file}')"
    )
    assert db.sql("SELECT COUNT(*) FROM ft").scalar() == 3
    with open(csv_file, "a") as f:
        f.write("4,z,9.0\n")
    # without refresh: stale snapshot
    assert db.sql("SELECT COUNT(*) FROM ft").scalar() == 3
    db.sql("REFRESH FOREIGN TABLES ft")
    assert db.sql("SELECT COUNT(*) FROM ft").scalar() == 4


def test_foreign_tables_are_read_only(db, csv_file):
    from heavydb_tpu.errors import SqlError

    db.sql(
        f"CREATE FOREIGN TABLE ft (a INT, b TEXT, c DOUBLE) "
        f"SERVER default_local_delimited WITH (file_path='{csv_file}')"
    )
    for stmt in [
        "INSERT INTO ft VALUES (9, 'w', 0.0)",
        "UPDATE ft SET a = 0",
        "DELETE FROM ft WHERE a = 1",
    ]:
        with pytest.raises(SqlError):
            db.sql(stmt)


def test_parquet_schema_inference(db, tmp_path):
    import pandas as pd

    pq = str(tmp_path / "d.parquet")
    pd.DataFrame({"k": [10, 20], "s": ["p", "q"]}).to_parquet(pq)
    db.sql(
        f"CREATE FOREIGN TABLE fp SERVER default_local_parquet "
        f"WITH (file_path='{pq}')"
    )
    assert db.sql("SELECT * FROM fp ORDER BY k").rows() == [
        (10, "p"), (20, "q"),
    ]


def test_custom_server_base_path(db, csv_file):
    base = os.path.dirname(csv_file)
    db.sql(
        f"CREATE SERVER s1 FOREIGN DATA WRAPPER delimited_file "
        f"WITH (base_path='{base}')"
    )
    db.sql(
        "CREATE FOREIGN TABLE ft2 (a INT, b TEXT, c DOUBLE) SERVER s1 "
        "WITH (file_path='data.csv')"
    )
    assert db.sql("SELECT COUNT(*) FROM ft2").scalar() == 3
    names = [r[0] for r in db.sql("SHOW SERVERS").rows()]
    assert any(n.startswith("s1 ") for n in names)
    db.sql("DROP TABLE ft2")
    db.sql("DROP SERVER s1")
    from heavydb_tpu.errors import SqlError

    with pytest.raises(SqlError):
        db.sql("DROP SERVER s1")
    db.sql("DROP SERVER IF EXISTS s1")


def test_regex_parser_wrapper(db, tmp_path):
    log = tmp_path / "app.log"
    log.write_text("header\n2024-01-01 ERROR boom\n2024-01-02 INFO ok\n")
    db.sql(
        f"CREATE FOREIGN TABLE fl (d TEXT, lvl TEXT, msg TEXT) "
        f"SERVER default_local_regex_parsed "
        f"WITH (file_path='{log}', line_regex='(\\S+) (\\S+) (.*)')"
    )
    assert db.sql("SELECT lvl, msg FROM fl ORDER BY d").rows() == [
        ("ERROR", "boom"), ("INFO", "ok"),
    ]


def test_foreign_table_persists_definition(tmp_path, csv_file):
    import heavydb_tpu as hdt

    d = str(tmp_path / "db")
    db = hdt.connect(d)
    db.sql(
        f"CREATE FOREIGN TABLE ft (a INT, b TEXT, c DOUBLE) "
        f"SERVER default_local_delimited WITH (file_path='{csv_file}')"
    )
    assert db.sql("SELECT COUNT(*) FROM ft").scalar() == 3
    del db
    # file grows while the DB is down; reopen re-imports lazily
    with open(csv_file, "a") as f:
        f.write("4,z,9.0\n")
    db2 = hdt.connect(d)
    assert db2.sql("SELECT COUNT(*) FROM ft").scalar() == 4


def test_fsi_disk_cache_and_server_persistence(tmp_path):
    """Reference CachingFileMgr: foreign chunks cached on disk; a cold
    restart serves reads from the cache even when the source is gone.
    Foreign servers persist with the catalog."""
    import os

    import heavydb_tpu as hdt

    src = tmp_path / "src.csv"
    src.write_text("a,s\n1,x\n2,y\n3,x\n")
    root = str(tmp_path / "db")
    db = hdt.connect(root)
    db.sql(
        "CREATE SERVER cs FOREIGN DATA WRAPPER delimited_file "
        f"WITH (storage_type='LOCAL_FILE', base_path='{tmp_path}')"
    )
    db.sql("CREATE FOREIGN TABLE cft (a INT, s TEXT) SERVER cs "
           "WITH (file_path='src.csv')")
    assert db.sql("SELECT sum(a) FROM cft").rows()[0][0] == 6
    os.remove(src)
    db2 = hdt.connect(root)
    rows = db2.sql("SELECT s, count(*) FROM cft GROUP BY s ORDER BY s").rows()
    assert rows == [("x", 2), ("y", 1)]


def test_fsi_cache_invalidated_on_source_change(tmp_path):
    import heavydb_tpu as hdt

    src = tmp_path / "src2.csv"
    src.write_text("a\n1\n2\n")
    root = str(tmp_path / "db2")
    db = hdt.connect(root)
    db.sql(
        "CREATE SERVER cs2 FOREIGN DATA WRAPPER delimited_file "
        f"WITH (storage_type='LOCAL_FILE', base_path='{tmp_path}')"
    )
    db.sql("CREATE FOREIGN TABLE cft2 (a INT) SERVER cs2 "
           "WITH (file_path='src2.csv')")
    assert db.sql("SELECT count(*) FROM cft2").rows()[0][0] == 2
    import os
    import time as _t

    _t.sleep(0.01)
    src.write_text("a\n1\n2\n3\n4\n")
    db2 = hdt.connect(root)
    assert db2.sql("SELECT count(*) FROM cft2").rows()[0][0] == 4


def test_scheduled_refresh(db, tmp_path):
    """Reference RefreshTimeCalculator + scheduled refresh: tables with
    REFRESH_TIMING_TYPE='SCHEDULED' re-import when their interval
    elapses; MANUAL tables never auto-refresh."""
    import time

    from heavydb_tpu.storage.refresh import next_refresh_time, parse_interval

    assert parse_interval("30S") == 30
    assert parse_interval("2H") == 7200
    assert parse_interval("1d") == 86400
    # alignment: next = start + k*interval strictly after now
    nxt = next_refresh_time(
        {"refresh_timing_type": "SCHEDULED", "refresh_interval": "10S",
         "refresh_start_date_time": "1970-01-01T00:00:00+00:00"},
        None, now=1005.0,
    )
    assert nxt == 1010.0
    assert next_refresh_time({"refresh_timing_type": "MANUAL"}, None, 0) \
        is None

    p = tmp_path / "feed.csv"
    p.write_text("a\n1\n2\n")
    db.sql(f"CREATE SERVER s_sched FOREIGN DATA WRAPPER delimited_file "
           f"WITH (base_path='{tmp_path}')")
    db.sql("CREATE FOREIGN TABLE ft_sched (a INT) SERVER s_sched WITH ("
           "file_path='feed.csv', refresh_timing_type='SCHEDULED', "
           "refresh_interval='1S')")
    assert db.sql("SELECT count(*) FROM ft_sched").rows() == [(2,)]
    p.write_text("a\n1\n2\n3\n")
    sched = db.refresh_scheduler
    now = time.time()
    assert sched.poll(now) == 0          # not due yet
    assert sched.poll(now + 2.0) == 1    # 1S interval elapsed → refreshed
    assert db.sql("SELECT count(*) FROM ft_sched").rows() == [(3,)]
    # manual tables are never picked up
    db.sql("CREATE FOREIGN TABLE ft_man (a INT) SERVER s_sched WITH ("
           "file_path='feed.csv')")
    db.sql("SELECT count(*) FROM ft_man")
    assert all(t.name != "ft_man" for t in sched.due_tables(now + 9999))
