"""Multi-host execution rig: spawns N real processes joined via
jax.distributed (CPU/Gloo) and checks distributed query parity against a
full-data oracle.  The reference ships no OSS cluster test backend
(SURVEY §4: Tests/ClusterTester.h is an empty husk) — this rig is the
TPU build's own."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_cluster(nprocs: int, timeout: int = 300):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
        )
        for p in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.timeout(600)
def test_two_process_cluster_parity():
    outs = _run_cluster(2)
    for rc, out in outs:
        assert "PARITY_OK" in out, out[-3000:]
        assert rc == 0, out[-3000:]


@pytest.mark.timeout(600)
def test_four_process_cluster_parity():
    outs = _run_cluster(4)
    for rc, out in outs:
        assert "PARITY_OK" in out, out[-3000:]
        assert rc == 0, out[-3000:]


PERSIST_WORKER = os.path.join(os.path.dirname(__file__),
                              "multihost_persist_worker.py")


def _run_persist_phase(phase: str, nprocs: int, root: str,
                       timeout: int = 300):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, PERSIST_WORKER, phase, str(p), str(nprocs),
             str(port), root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
        )
        for p in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.timeout(900)
def test_cluster_restart_parity(tmp_path):
    """Distributed persistence: per-host epoch checkpoints + the
    dist_meta partition record survive a full cluster restart
    (reference: per-leaf FileMgr epochs + check_table_consistency)."""
    root = str(tmp_path)
    for rc, out in _run_persist_phase("load", 4, root):
        assert rc == 0 and "LOAD_OK" in out, out[-3000:]
    for rc, out in _run_persist_phase("restart", 4, root):
        assert rc == 0 and "RESTART_OK" in out, out[-3000:]


@pytest.mark.timeout(900)
def test_cluster_consistency_detects_divergence(tmp_path):
    root = str(tmp_path)
    for rc, out in _run_persist_phase("load", 2, root):
        assert rc == 0 and "LOAD_OK" in out, out[-3000:]
    for rc, out in _run_persist_phase("diverge", 2, root):
        assert rc == 0 and "DIVERGENCE_DETECTED" in out, out[-3000:]
