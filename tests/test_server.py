"""Server/client integration tests (role of the reference's
DBHandlerTestFixture, Tests/DBHandlerTestHelpers.h — in-process server,
real sockets)."""

import threading

import numpy as np
import pytest

from heavydb_tpu.client.client import Connection, ServerError
from heavydb_tpu.server.server import serve


@pytest.fixture()
def server():
    srv = serve(port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def conn(server):
    host, port = server.server_address
    with Connection(host, port) as c:
        yield c


def test_roundtrip(conn):
    conn.sql("CREATE TABLE t (x INT, s TEXT)")
    conn.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (NULL, NULL)")
    rs = conn.sql("SELECT s, count(*) FROM t GROUP BY s ORDER BY s NULLS LAST")
    assert rs.rows() == [["a", 1], ["b", 1], [None, 1]] or rs.rows() == [
        ("a", 1), ("b", 1), (None, 1)
    ]
    assert rs.execution_time_ms is not None


def test_metadata(conn):
    conn.sql("CREATE TABLE m (x INT, v DOUBLE)")
    assert "m" in conn.get_tables()
    det = conn.get_table_details("m")
    assert det["columns"][0]["name"] == "x"
    mem = conn.get_memory()
    assert "m" in mem["tables"]
    assert conn.get_status()["sessions"] >= 1


def test_binary_load(conn):
    conn.sql("CREATE TABLE big (k INT, v DOUBLE)")
    n = 10_000
    rng = np.random.default_rng(0)
    loaded = conn.load_table(
        "big", {"k": rng.integers(0, 5, n), "v": rng.normal(size=n)}
    )
    assert loaded == n
    assert conn.sql("SELECT count(*) FROM big").scalar() == n
    assert conn.sql("SELECT count(DISTINCT k) FROM big").scalar() == 5


def test_errors_propagate(conn):
    with pytest.raises(ServerError) as ei:
        conn.sql("SELECT * FROM nope")
    assert ei.value.type == "CatalogError"
    with pytest.raises(ServerError) as ei:
        conn.sql("FROB")
    assert ei.value.type == "ParserError"


def test_two_sessions(server):
    host, port = server.server_address
    with Connection(host, port) as a, Connection(host, port) as b:
        a.sql("CREATE TABLE shared (x INT)")
        a.sql("INSERT INTO shared VALUES (1)")
        assert b.sql("SELECT count(*) FROM shared").scalar() == 1
        assert a.session != b.session


def test_dates_over_wire(conn):
    conn.sql("CREATE TABLE d (dt DATE, ts TIMESTAMP)")
    conn.sql("INSERT INTO d VALUES ('2024-03-01', '2024-03-01 12:30:00')")
    rows = conn.sql("SELECT dt, ts FROM d").rows()
    assert list(rows[0]) == ["2024-03-01", "2024-03-01 12:30:00"]


def test_arrow_over_wire(conn):
    conn.sql("CREATE TABLE arr (x INT, s TEXT)")
    conn.sql("INSERT INTO arr VALUES (1, 'a'), (2, NULL)")
    tbl = conn.sql_df("SELECT * FROM arr ORDER BY x")
    assert tbl.num_rows == 2
    assert tbl.column("s").to_pylist() == ["a", None]


def test_queries_info_empty_when_idle(conn):
    assert conn.get_queries_info() == []


# ---- HTTP transport (reference --http-port DBHandler sharing) ------------


def test_http_server():
    import json
    import threading
    import urllib.request

    from heavydb_tpu.server.http_server import serve_http

    srv = serve_http(port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    host, port = srv.server_address
    base = f"http://{host}:{port}"
    try:
        # status without a session
        with urllib.request.urlopen(f"{base}/status") as r:
            st = json.loads(r.read())
        assert "version" in st

        def post(path, payload):
            req = urllib.request.Request(
                base + path, json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post("/", {"method": "connect", "params": {}, "id": 1})
        assert code == 200
        sid = out["result"]
        code, _ = post("/sql", {"session": sid,
                                "query": "CREATE TABLE h (x INT)"})
        assert code == 200
        post("/sql", {"session": sid,
                      "query": "INSERT INTO h VALUES (1), (2), (41)"})
        code, res = post("/sql", {"session": sid,
                                  "query": "SELECT SUM(x) FROM h"})
        assert code == 200
        assert res["columns"] == [[44]]
        # malformed request → clean 400, not a hung socket
        code, res = post("/sql", {"session": "nope", "query": "SELECT 1"})
        assert code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_session_idle_eviction():
    import time as _t

    from heavydb_tpu.config import Config
    from heavydb_tpu.server.server import HeavyTpuServer

    srv = HeavyTpuServer(config=Config(idle_session_duration_s=1))
    sid = srv.rpc_connect()
    assert srv.rpc_sql_execute(sid, "SHOW TABLES")["row_count"] >= 0
    srv.sessions[sid].last_used -= 5  # simulate idleness
    sid2 = srv.rpc_connect()  # triggers the sweep
    import pytest

    from heavydb_tpu.errors import HeavyTpuError

    with pytest.raises(HeavyTpuError):
        srv.rpc_sql_execute(sid, "SHOW TABLES")
    assert srv.rpc_sql_execute(sid2, "SHOW TABLES") is not None


def test_table_level_write_locks_allow_disjoint_tables():
    import threading

    from heavydb_tpu.server.server import HeavyTpuServer

    srv = HeavyTpuServer()
    sid = srv.rpc_connect()
    srv.rpc_sql_execute(sid, "CREATE TABLE wa (x INT)")
    srv.rpc_sql_execute(sid, "CREATE TABLE wb (x INT)")
    ka = srv._write_lock_keys("INSERT INTO wa VALUES (1)")
    kb = srv._write_lock_keys("INSERT INTO wb VALUES (1)")
    srv._locks_for_keys(ka), srv._locks_for_keys(kb)
    assert ka == [("wa", "w")] and kb == [("wb", "w")]
    assert srv.table_locks["wa"] is not srv.table_locks["wb"]
    # same table -> same underlying lock (serialized)
    assert srv._write_lock_keys("INSERT INTO wa VALUES (2)") == ka
    # reads take SHARED locks; ALTER/COMMENT/OPTIMIZE route to the
    # table write lock
    assert srv._write_lock_keys("SELECT * FROM wa") == [("wa", "r")]
    assert srv._write_lock_keys("COMMENT ON TABLE wa IS 'x'") \
        == [("wa", "w")]
    assert srv._write_lock_keys(
        "ALTER TABLE wa ALTER COLUMN x TYPE BIGINT") == [("wa", "w")]
    assert srv._write_lock_keys("OPTIMIZE TABLE wa") == [("wa", "w")]
    assert srv._write_lock_keys("CREATE USER zz (password='p')") \
        == [("#sys", "w")]
    # INSERT..SELECT: write target, shared source
    assert srv._write_lock_keys(
        "INSERT INTO wa SELECT x FROM wb") == [("wa", "w"), ("wb", "r")]
    # concurrent writers to different tables both complete
    errs = []

    def w(tname):
        try:
            for i in range(5):
                srv.rpc_sql_execute(sid, f"INSERT INTO {tname} VALUES ({i})")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=w, args=(t,)) for t in ("wa", "wb")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert srv.rpc_sql_execute(sid, "SELECT count(*) FROM wa")[
        "columns"][0][0] == 5


def test_epoch_validate_meta_rpcs(tmp_path):
    from heavydb_tpu.server.server import HeavyTpuServer

    srv = HeavyTpuServer(str(tmp_path / "d"))
    sid = srv.rpc_connect()
    srv.rpc_sql_execute(sid, "CREATE TABLE et (x INT, s TEXT)")
    srv.rpc_sql_execute(sid, "INSERT INTO et VALUES (1, 'a')")
    e1 = srv.rpc_get_table_epoch(sid, "et")
    srv.rpc_sql_execute(sid, "INSERT INTO et VALUES (2, 'b')")
    assert srv.rpc_get_table_epoch(sid, "et") > e1
    srv.rpc_set_table_epoch(sid, "et", e1)
    assert srv.rpc_sql_execute(sid, "SELECT count(*) FROM et")[
        "columns"][0][0] == 1
    v = srv.rpc_sql_validate(sid, "SELECT x + 1 AS y, s FROM et")
    assert v["fields"] == ["y", "s"]
    assert v["types"][0] in ("INT", "INTEGER", "BIGINT")
    meta = srv.rpc_get_tables_meta(sid)
    assert any(m["name"] == "et" and m["num_cols"] == 2 for m in meta)
    import pytest

    from heavydb_tpu.errors import HeavyTpuError

    with pytest.raises(Exception):
        srv.rpc_sql_validate(sid, "SELECT nope FROM et")


def test_warmup_file(tmp_path):
    from heavydb_tpu.server.server import serve

    wf = tmp_path / "warm.sql"
    wf.write_text(
        "CREATE TABLE wtab (x INT);\n"
        "INSERT INTO wtab VALUES (1), (2);\n"
        "-- comment line\n"
        "SELECT count(*) FROM wtab;\n"
        "SELECT broken syntax here;\n"  # best-effort: must not abort startup
    )
    srv = serve(port=0, warmup_file=str(wf))
    try:
        sid = srv.engine.rpc_connect()
        out = srv.engine.rpc_sql_execute(sid, "SELECT sum(x) FROM wtab")
        assert out["columns"][0][0] == 3
    finally:
        srv.server_close()


def test_session_and_cluster_info_rpcs(conn):
    """heavy.thrift:686-716 surface: session info, clone/switch,
    hardware info, users/roles."""
    info = conn.call("get_session_info", session=conn.session)
    assert info["user"] == "admin" and info["database"] == "heavyai"
    sid2 = conn.call("clone_session", session=conn.session)
    assert sid2 != conn.session
    assert conn.call("get_session_info", session=sid2)["user"] == "admin"
    assert conn.call("switch_database", session=conn.session,
                     dbname="heavyai") is True
    with pytest.raises(ServerError):
        conn.call("switch_database", session=conn.session, dbname="nope")
    hw = conn.call("get_hardware_info", session=conn.session)
    assert hw["num_cpu_hw_threads"] >= 1 and len(hw["devices"]) >= 1
    assert "admin" in conn.call("get_users", session=conn.session)
    conn.sql("CREATE USER bob (password='pw')")
    conn.sql("CREATE ROLE analyst")
    conn.sql("GRANT analyst TO bob")
    assert "analyst" in conn.call("get_roles", session=conn.session)
    assert conn.call("get_all_roles_for_user", session=conn.session,
                     user="bob") == ["analyst"]


def test_completion_hints(conn):
    conn.sql("CREATE TABLE flights (carrier TEXT, delay INT)")
    hints = conn.call("get_completion_hints", session=conn.session,
                      sql="SELECT car", cursor=10)
    assert {"hint": "carrier", "type": "COLUMN"} in hints
    hints = conn.call("get_completion_hints", session=conn.session,
                      sql="SELECT * FROM fli", cursor=18)
    assert {"hint": "flights", "type": "TABLE"} in hints
    hints = conn.call("get_completion_hints", session=conn.session,
                      sql="SELECT * FROM t WHE", cursor=19)
    assert {"hint": "WHERE", "type": "KEYWORD"} in hints


def test_dashboard_crud(conn):
    did = conn.call("create_dashboard", session=conn.session,
                    name="sales", state="eyJ2IjoxfQ==", metadata="{}")
    assert did == 1
    boards = conn.call("get_dashboards", session=conn.session)
    assert len(boards) == 1 and boards[0]["name"] == "sales"
    assert "state" not in boards[0]  # list omits the (big) state blob
    d = conn.call("get_dashboard", session=conn.session, dashboard_id=did)
    assert d["state"] == "eyJ2IjoxfQ=="
    conn.call("replace_dashboard", session=conn.session, dashboard_id=did,
              name="sales2", state="e30=", metadata="{}")
    d = conn.call("get_dashboard", session=conn.session, dashboard_id=did)
    assert d["name"] == "sales2" and d["state"] == "e30="
    conn.call("delete_dashboard", session=conn.session, dashboard_id=did)
    assert conn.call("get_dashboards", session=conn.session) == []
    with pytest.raises(ServerError):
        conn.call("get_dashboard", session=conn.session, dashboard_id=did)


def test_query_timings_rpc(conn):
    """reference QueryState / DEBUG_TIMER tree via get_query_timings."""
    conn.call("sql_execute", session=conn.session,
              query="ALTER SESSION SET enable_debug_timer='true'")
    conn.call("sql_execute", session=conn.session, query="SELECT 1+1")
    tree = conn.call("get_query_timings", session=conn.session)
    assert tree.get("name") == "query"
    names = [c["name"] for c in tree.get("children", [])]
    assert "plan" in names and "execute" in names


def test_reader_writer_isolation(server):
    """A concurrent reader must never observe a half-applied
    multi-statement write batch (reference LockMgr read-write
    hierarchy: readers share, writers exclude)."""
    host, port = server.server_address
    with Connection(host, port) as c:
        c.sql("CREATE TABLE rw (x INT)")
        c.sql("INSERT INTO rw VALUES (1), (2), (3), (4)")

    errors = []
    stop = threading.Event()

    def writer():
        try:
            with Connection(host, port) as cw:
                for i in range(12):
                    # delete-then-reinsert as ONE batch: the intermediate
                    # empty state must be invisible to readers
                    cw.sql("DELETE FROM rw WHERE x > 0; "
                           "INSERT INTO rw VALUES (1), (2), (3), (4)")
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            with Connection(host, port) as cr:
                while not stop.is_set():
                    n = cr.sql("SELECT count(*) FROM rw").rows()[0][0]
                    if n != 4:
                        errors.append(AssertionError(f"saw count {n}"))
                        return
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors


def test_readers_do_not_serialize_each_other(server):
    """Shared mode: N concurrent readers of one table all proceed
    (writer-preferring RWLock must not degrade reads to exclusive)."""
    host, port = server.server_address
    with Connection(host, port) as c:
        c.sql("CREATE TABLE rr (x INT)")
        c.sql("INSERT INTO rr VALUES (1), (2)")
    inside = []
    gate = threading.Barrier(3, timeout=60)

    from heavydb_tpu.server.server import RWLock

    engine = server.engine
    lock = engine.table_locks.setdefault("rr", RWLock())

    def reader():
        with lock.read():
            inside.append(1)
            gate.wait()  # all three must be inside simultaneously

    ts = [threading.Thread(target=reader) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert len(inside) == 3
