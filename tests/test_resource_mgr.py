"""Admission control tests — reference ExecutorResourceMgr queue/admit
behavior (request_resources, QueryTimedOutWaitingInQueue)."""

import threading
import time

import numpy as np
import pytest

from heavydb_tpu.exec.resource_mgr import QueryTimedOut, ResourceMgr


def test_serializes_at_capacity():
    mgr = ResourceMgr(max_concurrent=1, queue_timeout_s=10)
    order = []
    g1 = mgr.acquire(0)
    done = threading.Event()

    def second():
        with mgr.acquire(0):
            order.append("second-admitted")
        done.set()

    th = threading.Thread(target=second)
    th.start()
    time.sleep(0.1)
    assert not done.is_set()  # queued behind g1
    order.append("first-released")
    g1.__exit__(None, None, None)
    th.join(timeout=5)
    assert order == ["first-released", "second-admitted"]
    assert mgr.info()["total_admitted"] == 2


def test_queue_timeout():
    mgr = ResourceMgr(max_concurrent=1, queue_timeout_s=0.1)
    with mgr.acquire(0):
        with pytest.raises(QueryTimedOut):
            mgr.acquire(0)
    assert mgr.info()["total_timed_out"] == 1


def test_byte_limit_admission():
    mgr = ResourceMgr(max_concurrent=8, max_bytes=100, queue_timeout_s=0.1)
    with mgr.acquire(80):
        # second query alone would fit, but pool is near-full
        with pytest.raises(QueryTimedOut):
            mgr.acquire(50)
        with mgr.acquire(20):
            pass
    # a single over-limit query still runs when the pool is empty
    # (reference: oversubscription allowed for the lone query)
    with mgr.acquire(500):
        pass


def test_estimate_and_engine_integration(db):
    rng = np.random.default_rng(0)
    db.sql("CREATE TABLE r (x INT, y DOUBLE)")
    db.load_table("r", {
        "x": rng.integers(0, 10, 1000).astype(np.int32),
        "y": rng.random(1000),
    })
    rm = db.executor.resource_mgr
    assert rm is not None
    before = rm.info()["total_admitted"]
    assert db.sql("SELECT COUNT(*) FROM r WHERE x > 5").scalar() > 0
    info = rm.info()
    assert info["total_admitted"] > before
    assert info["running"] == 0  # released after the query

    from heavydb_tpu.plan.optimizer import optimize

    plan = optimize(db._plan_select(
        __import__("heavydb_tpu.sql.parser", fromlist=["parse"]).parse(
            "SELECT x FROM r"
        )
    ))
    est = rm.estimate_scan_bytes(plan)
    assert est == 1000 * (4 + 8)  # int32 + float64 columns


def test_concurrent_queries_through_engine(db):
    db.sql("CREATE TABLE c (x INT)")
    db.load_table("c", {"x": np.arange(100, dtype=np.int32)})
    db.sql("SELECT SUM(x) FROM c")  # warm kernel
    results = []

    def run():
        results.append(db.sql("SELECT SUM(x) FROM c").scalar())

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert results == [4950] * 6
    assert db.executor.resource_mgr.info()["running"] == 0
