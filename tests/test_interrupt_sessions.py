"""Session-scoped interrupts under concurrency.

Round-4 verdict confirmed a live bug: the server installed ONE shared
`executor.interrupt_check` lambda on a ThreadingTCPServer, so with
concurrent queries the last arrival's lambda won and KILL QUERY could
kill the wrong session's query.  The executor now keeps per-query state
thread-local (reference: per-session interrupt registry on the
Executor, QueryEngine/Execute.h:688).  These tests interrupt a SUBSET of
concurrent sessions and assert exactly that subset dies.
"""
import threading
import time

import numpy as np
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


def _seed(server, rows=200_000):
    host, port = _addr(server)
    with Connection(host, port) as c:
        c.sql("CREATE TABLE it (k INT, v FLOAT)")
        rng = np.random.default_rng(0)
        c.load_table("it", {
            "k": rng.integers(0, 5000, rows).astype(np.int32),
            "v": rng.random(rows).astype(np.float32),
        })


BATCH = ";\n".join(
    "SELECT k, count(*), sum(v), avg(v) FROM it GROUP BY k "
    f"HAVING count(*) > {i}" for i in range(250)
)


def test_interrupt_kills_exactly_the_targeted_sessions(server):
    _seed(server)
    host, port = _addr(server)
    n = 5
    victims = {1, 3}
    conns = [Connection(host, port) for _ in range(n)]
    try:
        outcomes = [None] * n
        started = threading.Barrier(n + 1)

        def run(i):
            try:
                started.wait(timeout=30)
                conns[i].sql(BATCH)
                outcomes[i] = "done"
            except ServerError as e:
                outcomes[i] = e.args[0]
            except Exception as e:  # noqa: BLE001
                outcomes[i] = f"other:{e!r}"

        threads = [
            threading.Thread(target=run, args=(i,), daemon=True)
            for i in range(n)
        ]
        for t in threads:
            t.start()
        started.wait(timeout=30)
        time.sleep(1.0)
        with Connection(host, port) as killer:
            for i in sorted(victims):
                killer.call("interrupt", session=conns[i].session)
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads)
        for i in range(n):
            if i in victims:
                assert str(outcomes[i]).startswith("QueryInterrupted"), (i, outcomes)
            else:
                assert outcomes[i] == "done", (i, outcomes)
    finally:
        for c in conns:
            c.close()


def test_kill_query_statement_targets_one_session(server):
    """KILL QUERY '<sid>' from an admin session interrupts that session
    only (reference kill_query → interrupt(session))."""
    _seed(server)
    host, port = _addr(server)
    conns = [Connection(host, port) for _ in range(3)]
    try:
        outcomes = [None] * 3
        started = threading.Barrier(4)

        def run(i):
            try:
                started.wait(timeout=30)
                conns[i].sql(BATCH)
                outcomes[i] = "done"
            except ServerError as e:
                outcomes[i] = e.args[0]

        threads = [
            threading.Thread(target=run, args=(i,), daemon=True)
            for i in range(3)
        ]
        for t in threads:
            t.start()
        started.wait(timeout=30)
        time.sleep(1.0)
        with Connection(host, port) as admin:
            admin.sql(f"KILL QUERY '{conns[2].session}'")
        for t in threads:
            t.join(timeout=600)
        assert str(outcomes[2]).startswith("QueryInterrupted"), outcomes
        assert outcomes[0] == "done" and outcomes[1] == "done", outcomes
    finally:
        for c in conns:
            c.close()
