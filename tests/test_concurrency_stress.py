"""Concurrency stress suite: N threads hammer one live server with mixed
SELECT / INSERT / UPDATE / DELETE / CTAS / DDL, asserting isolation, no
deadlock under the sorted table-lock order, and exact final counts.

Reference model: java/utility/.../CtasItasSelectUpdelConcurrencyTest.java,
SelectUpdateDeleteDifferentTables.java, EagainConcurrencyTest.java — the
reference stresses its LockMgr + ExecutorResourceMgr from live clients;
we do the same over real sockets against server/server.py.
"""

import random
import threading
import time

import pytest

from heavydb_tpu.client.client import Connection, ServerError
from heavydb_tpu.server.server import serve


@pytest.fixture()
def server():
    srv = serve(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _addr(server):
    return server.server_address


def _worker(host, port, fn, errors, barrier):
    try:
        with Connection(host, port) as c:
            barrier.wait(timeout=30)
            fn(c)
    except Exception as e:  # noqa: BLE001
        errors.append(e)


def _run_threads(server, fns, timeout=240):
    host, port = _addr(server)
    errors = []
    barrier = threading.Barrier(len(fns))
    threads = [
        threading.Thread(
            target=_worker, args=(host, port, fn, errors, barrier),
            daemon=True,
        )
        for fn in fns
    ]
    for t in threads:
        t.start()
    deadline = time.monotonic() + timeout
    for t in threads:
        t.join(max(0.1, deadline - time.monotonic()))
    alive = [t for t in threads if t.is_alive()]
    assert not alive, f"deadlock/timeout: {len(alive)} threads still running"
    assert not errors, errors[:3]


def test_concurrent_inserts_single_table(server):
    """N writers append to one table; total row count is exact (per-table
    write lock serializes appenders without losing rows)."""
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE ci (w INT, x INT)")
    n_threads, per = 8, 25

    def writer(tid):
        def go(c):
            for i in range(per):
                c.sql(f"INSERT INTO ci VALUES ({tid}, {i})")
        return go

    _run_threads(server, [writer(t) for t in range(n_threads)])
    with Connection(host, port) as c:
        assert c.sql("SELECT count(*) FROM ci").rows()[0][0] \
            == n_threads * per
        rows = c.sql(
            "SELECT w, count(*) FROM ci GROUP BY w ORDER BY w"
        ).rows()
        assert [tuple(r) for r in rows] == [(t, per) for t in range(n_threads)]


def test_select_vs_updel_different_tables(server):
    """Readers on one table never block or break while another table is
    updated/deleted (reference SelectUpdateDeleteDifferentTables)."""
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE r_tab (k INT, v DOUBLE)")
        c.sql("CREATE TABLE w_tab (k INT, v DOUBLE)")
        for t in ("r_tab", "w_tab"):
            c.sql(
                f"INSERT INTO {t} VALUES "
                + ", ".join(f"({i % 10}, {i})" for i in range(100))
            )

    stop = threading.Event()

    def reader(c):
        while not stop.is_set():
            rows = c.sql(
                "SELECT k, count(*) FROM r_tab GROUP BY k"
            ).rows()
            assert sum(r[1] for r in rows) == 100

    def mutator(c):
        try:
            for i in range(15):
                c.sql(f"UPDATE w_tab SET v = v + 1 WHERE k = {i % 10}")
                c.sql(f"DELETE FROM w_tab WHERE k = {i % 10} AND v < 0")
                c.sql(f"INSERT INTO w_tab VALUES ({i % 10}, {i})")
        finally:
            stop.set()

    _run_threads(server, [reader, reader, mutator])


def test_mixed_select_insert_update_ddl(server):
    """The full mixed workload: per-thread random SELECT/INSERT/UPDATE/
    DELETE over shared tables plus CTAS/DROP of thread-private tables.
    No deadlock, no lost writes, no internal errors (user errors like
    'table exists' are tolerated where raced)."""
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE mx_a (k INT, v DOUBLE, s TEXT)")
        c.sql("CREATE TABLE mx_b (k INT, v DOUBLE)")
        c.sql(
            "INSERT INTO mx_a VALUES "
            + ", ".join(f"({i % 7}, {i}.5, 'tag{i % 3}')" for i in range(50))
        )
        c.sql(
            "INSERT INTO mx_b VALUES "
            + ", ".join(f"({i % 7}, {i})" for i in range(50))
        )

    counters = [0] * 6

    def chaos(tid):
        rng = random.Random(tid)

        def go(c):
            for step in range(20):
                op = rng.randrange(6)
                counters[op] += 1
                if op == 0:
                    c.sql(
                        "SELECT k, count(*), sum(v) FROM mx_a "
                        "GROUP BY k ORDER BY k"
                    ).rows()
                elif op == 1:
                    c.sql(
                        "SELECT a.k, count(*) FROM mx_a a JOIN mx_b b "
                        "ON a.k = b.k GROUP BY a.k"
                    ).rows()
                elif op == 2:
                    c.sql(
                        f"INSERT INTO mx_b VALUES ({rng.randrange(7)}, "
                        f"{rng.random():.3f})"
                    )
                elif op == 3:
                    c.sql(
                        f"UPDATE mx_a SET v = v + 1 "
                        f"WHERE k = {rng.randrange(7)}"
                    )
                elif op == 4:
                    c.sql(
                        f"DELETE FROM mx_b WHERE v < {rng.random() * 0.05:.3f}"
                    )
                else:
                    name = f"priv_{tid}_{step}"
                    c.sql(
                        f"CREATE TABLE {name} AS SELECT k, v FROM mx_a "
                        "WHERE k < 3"
                    )
                    c.sql(f"DROP TABLE {name}")
        return go

    _run_threads(server, [chaos(t) for t in range(6)])
    with Connection(host, port) as c:
        # mx_a never gains/loses rows (only UPDATE touches it)
        assert c.sql("SELECT count(*) FROM mx_a").rows()[0][0] == 50
        # no private tables leak
        names = c.get_tables()
        assert not [n for n in names if n.startswith("priv_")]


def test_ctas_itas_concurrency(server):
    """Concurrent CTAS from + ITAS into the same source table (reference
    CtasItasSelectUpdelConcurrencyTest)."""
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE src (k INT, v DOUBLE)")
        c.sql(
            "INSERT INTO src VALUES "
            + ", ".join(f"({i % 5}, {i})" for i in range(40))
        )
        c.sql("CREATE TABLE sink (k INT, v DOUBLE)")

    def ctas(tid):
        def go(c):
            for step in range(8):
                name = f"ct_{tid}_{step}"
                c.sql(f"CREATE TABLE {name} AS SELECT * FROM src")
                got = c.sql(f"SELECT count(*) FROM {name}").rows()[0][0]
                assert got == 40, f"CTAS snapshot lost rows: {got}"
                c.sql(f"DROP TABLE {name}")
        return go

    def itas(c):
        for _ in range(8):
            c.sql("INSERT INTO sink SELECT * FROM src WHERE k < 2")

    def selector(c):
        for _ in range(20):
            rows = c.sql(
                "SELECT k, count(*) FROM src GROUP BY k ORDER BY k"
            ).rows()
            assert sum(r[1] for r in rows) == 40

    _run_threads(server, [ctas(0), ctas(1), itas, selector])
    with Connection(host, port) as c:
        per_pass = 16  # k in {0,1} → 8 rows each × 2 keys
        assert c.sql("SELECT count(*) FROM sink").rows()[0][0] \
            == 8 * per_pass


def test_admission_output_buffer_estimate(server):
    """ALTER SYSTEM SET max_exec_bytes gates admission on the scan +
    OUTPUT buffer estimate (group-by slots / join expansion), not scan
    bytes alone (reference ExecutorResourcePool output-buffer grants)."""
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE adm (k INT, v DOUBLE)")
        c.sql(
            "INSERT INTO adm VALUES "
            + ", ".join(f"({i}, {i})" for i in range(200))
        )
        # tiny budget: single queries must still run (the pool always
        # admits one query regardless of size — reference
        # allow_cpu_result_mem_oversubscription for lone queries)
        c.sql("ALTER SYSTEM SET max_exec_bytes = 4096")
        rows = c.sql(
            "SELECT k, count(*) FROM adm GROUP BY k ORDER BY k"
        ).rows()
        assert len(rows) == 200
        c.sql("ALTER SYSTEM SET max_exec_bytes = 0")  # back to unlimited

    # concurrent queries under the tiny budget serialize but all finish
    with Connection(host, port) as c:
        c.sql("ALTER SYSTEM SET max_exec_bytes = 65536")

    def q(c):
        for _ in range(5):
            c.sql("SELECT k, count(*), sum(v) FROM adm GROUP BY k").rows()

    _run_threads(server, [q, q, q, q])
    with Connection(host, port) as c:
        c.sql("ALTER SYSTEM SET max_exec_bytes = 0")
        info = c.get_status().get("resource_pool") or {}
        assert info.get("total_timed_out", 0) == 0
