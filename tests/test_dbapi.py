"""PEP-249 DB-API driver tests (reference role: java/heavyaijdbc — the
standard-connector surface; ours is DB-API over the TCP protocol)."""
import threading

import pytest

import heavydb_tpu.client.dbapi as dbapi
from heavydb_tpu.server.server import serve


@pytest.fixture()
def server():
    srv = serve(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def con(server):
    host, port = server.server_address
    with dbapi.connect(host=host, port=port) as c:
        yield c


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "pyformat"
    assert dbapi.threadsafety >= 1
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_execute_fetch(con):
    cur = con.cursor()
    cur.execute("CREATE TABLE t (a INT, b TEXT)")
    cur.executemany("INSERT INTO t VALUES (%s, %s)",
                    [(1, "x"), (2, "y"), (3, None)])
    cur.execute("SELECT a, b FROM t ORDER BY a")
    assert cur.description[0][0] == "a"
    assert cur.rowcount == 3
    assert cur.fetchone() == (1, "x")
    assert cur.fetchmany(1) == [(2, "y")]
    assert cur.fetchall() == [(3, None)]
    assert cur.fetchone() is None


def test_params_and_quoting(con):
    cur = con.cursor()
    cur.execute("CREATE TABLE q (a INT, s TEXT)")
    cur.execute("INSERT INTO q VALUES (%s, %s)", (5, "o'neil"))
    cur.execute("SELECT s FROM q WHERE a = %(a)s", {"a": 5})
    assert cur.fetchall() == [("o'neil",)]
    cur.execute("SELECT count(*) FROM q WHERE s = %s", ("o'neil",))
    assert cur.fetchone() == (1,)


def test_iteration_and_types(con):
    cur = con.cursor()
    cur.execute("CREATE TABLE it2 (d DATE, v DOUBLE)")
    import datetime

    cur.execute("INSERT INTO it2 VALUES (%s, %s)",
                (datetime.date(2024, 3, 1), 2.5))
    cur.execute("SELECT d, v FROM it2")
    rows = list(cur)
    assert len(rows) == 1
    assert str(rows[0][0]).startswith("2024-03-01")
    assert rows[0][1] == 2.5
    assert cur.description[1][1] in dbapi.NUMBER
    assert cur.description[0][1] in dbapi.DATETIME


def test_errors_translate(con):
    cur = con.cursor()
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELECT * FROM missing_table")
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("NOT SQL AT ALL")


def test_closed_connection(server):
    host, port = server.server_address
    con = dbapi.connect(host=host, port=port)
    con.close()
    with pytest.raises(dbapi.InterfaceError):
        con.cursor()
    with pytest.raises(dbapi.InterfaceError):
        con.commit()


def test_commit_noop_rollback_unsupported(con):
    con.commit()
    with pytest.raises(dbapi.NotSupportedError):
        con.rollback()
