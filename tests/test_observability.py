"""EXPLAIN variants, debug timers, hints, watchdog, interrupt."""

import pytest

import heavydb_tpu as hdt
from heavydb_tpu.config import Config
from heavydb_tpu.errors import QueryInterrupted, WatchdogException


def test_explain_kinds(db):
    db.sql("CREATE TABLE t (x INT, s TEXT)")
    db.sql("INSERT INTO t VALUES (1, 'a')")
    plan = "\n".join(
        r[0] for r in db.sql("EXPLAIN SELECT s, count(*) FROM t GROUP BY s").rows()
    )
    assert "Compound" in plan
    calcite = "\n".join(
        r[0]
        for r in db.sql("EXPLAIN CALCITE SELECT s, count(*) FROM t GROUP BY s").rows()
    )
    assert "Aggregate" in calcite and "Scan" in calcite
    ir = "\n".join(
        r[0]
        for r in db.sql(
            "EXPLAIN OPTIMIZED SELECT s, count(*) FROM t GROUP BY s"
        ).rows()
    )
    assert "jaxpr" in ir and "lambda" in ir


def test_debug_timer():
    db = hdt.connect(config=Config(enable_debug_timer=True))
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1), (2)")
    db.sql("SELECT sum(x) FROM t")
    info = db.last_query_timings
    assert info["name"] == "query"
    names = [c["name"] for c in info["children"]]
    assert "plan" in names and "execute" in names and "fetch" in names
    ex = next(c for c in info["children"] if c["name"] == "execute")
    assert any("Compound" in c["name"] for c in ex["children"])


def test_hints_parsed(db):
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    # hint accepted and query runs
    assert db.sql("SELECT /*+ cpu_mode */ count(*) FROM t").scalar() == 1


def test_watchdog():
    db = hdt.connect(config=Config(enable_watchdog=True,
                                   watchdog_max_projected_rows=100))
    db.sql("CREATE TABLE t (x INT)")
    import numpy as np

    db.load_table("t", {"x": np.arange(1000)})
    with pytest.raises(WatchdogException):
        db.sql("SELECT x FROM t WHERE x > 1")
    # aggregates are allowed
    assert db.sql("SELECT count(*) FROM t").scalar() == 1000
    # hint can disable the watchdog for one query
    assert db.sql("SELECT /*+ no_watchdog */ x FROM t LIMIT 5") is not None


def test_interrupt(db):
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    db.executor.interrupt_check = lambda: True
    with pytest.raises(QueryInterrupted):
        db.sql("SELECT count(*) FROM t")
    db.executor.interrupt_check = None
    assert db.sql("SELECT count(*) FROM t").scalar() == 1


def test_alter_session_set(db):
    from heavydb_tpu.errors import SqlError
    import pytest as _pt

    db.sql("ALTER SESSION SET enable_watchdog = true")
    assert db.config.enable_watchdog is True
    db.sql("ALTER SYSTEM SET max_concurrent_queries = 2")
    assert db.executor.resource_mgr.max_concurrent == 2
    db.sql("ALTER SESSION SET watchdog_max_projected_rows = 1000")
    assert db.config.watchdog_max_projected_rows == 1000
    with _pt.raises(SqlError):
        db.sql("ALTER SESSION SET bogus_flag = 1")


def test_dynamic_watchdog_time_limit():
    """Reference DynamicWatchdog.cpp: a time-budget deadline aborts the
    query at the next execution checkpoint (here: streaming waves)."""
    import numpy as np
    import time
    import pytest

    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config
    from heavydb_tpu.errors import WatchdogException

    rng = np.random.default_rng(0)
    db = hdt.connect(config=Config(
        stream_threshold_bytes=50_000, default_fragment_rows=30_000))
    db.load_table("wd", {
        "k": rng.integers(0, 50, 200_000).astype(np.int32),
        "v": rng.random(200_000).astype(np.float32),
    }, create=True)
    assert db.sql("SELECT count(*) FROM wd").rows()[0][0] == 200_000
    t0 = time.time()
    with pytest.raises(WatchdogException):
        db.sql("SELECT /*+ query_time_limit(1) */ k, sum(v), avg(v) "
               "FROM wd GROUP BY k").rows()
    assert time.time() - t0 < 5.0
    # deadline does not leak into later queries
    assert db.sql("SELECT count(*) FROM wd WHERE k < 10").rows()[0][0] > 0


def test_interrupt_mid_streamed_query(db):
    """A streamed (fragment-wave) query polls the interrupt flag BETWEEN
    waves (executor._checkpoint) — cancellation lands mid-query, not
    only between DAG steps (reference DynamicWatchdog + check_interrupt,
    RuntimeFunctions.cpp:2548)."""
    import numpy as np

    db.config.stream_threshold_bytes = 1 << 12  # force many waves
    db.sql("CREATE TABLE big_s (k INT, v FLOAT) WITH (fragment_size=500)")
    rng = np.random.default_rng(2)
    db.catalog.get_table("big_s").insert_columns({
        1: rng.integers(0, 100, 20_000).astype(np.int32),
        2: rng.random(20_000).astype(np.float32),
    })
    calls = {"n": 0}

    def trip_after_three():
        calls["n"] += 1
        return calls["n"] > 3

    db.executor.interrupt_check = trip_after_three
    with pytest.raises(QueryInterrupted):
        db.sql("SELECT k, count(*), sum(v) FROM big_s GROUP BY k")
    assert calls["n"] > 3  # polled repeatedly, tripped mid-stream
    db.executor.interrupt_check = None
    assert len(db.sql("SELECT k, count(*) FROM big_s GROUP BY k").rows()) == 100
