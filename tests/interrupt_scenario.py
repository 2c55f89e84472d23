"""Subprocess body for tests/test_interrupt_sessions.py.

Runs one interrupt scenario end-to-end and exits 0 on success.  Run in
a SUBPROCESS because back-to-back in-process runs of these scenarios
(two ThreadingTCPServer instances × N concurrent interrupted queries)
leave the process in a state where LATER XLA CPU compiles segfault
inside backend_compile_and_load — reproduced deterministically with
2×scenario + any compile-heavy test, never with 1×scenario; a native
interaction below the Python layer (this container loads the axon PJRT
plugin into every interpreter), not engine state.
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(which: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from heavydb_tpu.client.client import Connection, ServerError
    from heavydb_tpu.server.server import serve

    srv = serve(port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address

    with Connection(host, port) as c:
        c.sql("CREATE TABLE it (k INT, v FLOAT)")
        rng = np.random.default_rng(0)
        rows = 200_000
        c.load_table("it", {
            "k": rng.integers(0, 5000, rows).astype(np.int32),
            "v": rng.random(rows).astype(np.float32),
        })

    batch = ";\n".join(
        "SELECT k, count(*), sum(v), avg(v) FROM it GROUP BY k "
        f"HAVING count(*) > {i}" for i in range(250)
    )

    n = 5 if which == "interrupt" else 3
    victims = {1, 3} if which == "interrupt" else {2}
    conns = [Connection(host, port) for _ in range(n)]
    outcomes = [None] * n
    started = threading.Barrier(n + 1)

    def run(i):
        try:
            started.wait(timeout=30)
            conns[i].sql(batch)
            outcomes[i] = "done"
        except ServerError as e:
            outcomes[i] = str(e.args[0])
        except Exception as e:  # noqa: BLE001
            outcomes[i] = f"other:{e!r}"

    threads = [threading.Thread(target=run, args=(i,), daemon=True)
               for i in range(n)]
    for t in threads:
        t.start()
    started.wait(timeout=30)
    time.sleep(1.0)
    with Connection(host, port) as admin:
        for i in sorted(victims):
            if which == "interrupt":
                admin.call("interrupt", session=conns[i].session)
            else:
                admin.sql(f"KILL QUERY '{conns[i].session}'")
    for t in threads:
        t.join(timeout=600)
    for c in conns:
        c.close()
    srv.shutdown()
    srv.server_close()
    if any(t.is_alive() for t in threads):
        print("FAIL: threads still alive", flush=True)
        return 1
    for i in range(n):
        if i in victims:
            if not str(outcomes[i]).startswith("QueryInterrupted"):
                print(f"FAIL: victim {i} outcome {outcomes[i]!r}",
                      flush=True)
                return 1
        elif outcomes[i] != "done":
            print(f"FAIL: survivor {i} outcome {outcomes[i]!r}", flush=True)
            return 1
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "interrupt"))
