"""Session-scoped interrupts under concurrency.

Round-4 verdict confirmed a live bug: the server installed ONE shared
`executor.interrupt_check` lambda on a ThreadingTCPServer, so with
concurrent queries the last arrival's lambda won and KILL QUERY could
kill the wrong session's query.  The executor now keeps per-query state
thread-local (reference: per-session interrupt registry on the
Executor, QueryEngine/Execute.h:688).  These tests interrupt a SUBSET of
concurrent sessions and assert exactly that subset dies.

Each scenario runs in a SUBPROCESS (tests/interrupt_scenario.py has the
why: back-to-back in-process scenario runs destabilize later XLA CPU
compiles in this container — a native-layer interaction, and isolation
is the established suite pattern for such bodies)."""
import os
import subprocess
import sys


def _run(which: str):
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "interrupt_scenario.py"),
         which],
        env=env, capture_output=True, text=True, timeout=900,
        cwd="/root/repo",
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "OK" in r.stdout


def test_interrupt_kills_exactly_the_targeted_sessions():
    _run("interrupt")


def test_kill_query_statement_targets_one_session():
    _run("kill")
