"""Worker process for the multi-host CPU rig (tests/test_multihost.py).

Each worker joins a jax.distributed cluster on the CPU backend, loads its
row partition of a shared synthetic dataset, runs distributed queries via
DistEngine, and checks parity against a numpy oracle over the FULL data.
Prints PARITY_OK on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, nprocs: int, port: int):

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    import heavydb_tpu as hdt
    from heavydb_tpu.parallel.dist_engine import DistEngine
    from heavydb_tpu.parallel.multihost import MultiHostRuntime

    rt = MultiHostRuntime()
    rt.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    # full dataset from a shared seed; this host takes rows pid::nprocs
    rng = np.random.default_rng(42)
    n = 200_000
    k = rng.integers(0, 400, n).astype(np.int32)
    g = rng.integers(0, 37, n).astype(np.int32)
    v = np.where(rng.random(n) < 0.1, np.nan, rng.random(n)).astype(np.float32)
    names = np.array([f"name_{i % 23}" for i in range(n)], object)
    sel = slice(pid, None, nprocs)

    db = hdt.connect()
    dist = DistEngine(db, rt)
    dist.load_table(
        "fact",
        {"k": k[sel], "g": g[sel], "v": v[sel], "s": names[sel]},
    )
    dim_k = np.arange(400, dtype=np.int32)
    dim_nm = (dim_k % 11).astype(np.int32)
    dist.load_table("dim", {"k": dim_k, "nm": dim_nm}, replicated=True)

    snap = dist.snapshot()
    assert snap["fact"]["num_rows_global"] == n, snap["fact"]

    ok = True

    def check(label, got, want, approx=False):
        nonlocal ok
        good = True
        if len(got) != len(want):
            good = False
        else:
            for a, b in zip(got, want):
                for x, y in zip(a, b):
                    if approx and isinstance(y, float):
                        if not (abs((x or 0) - y) <= max(abs(y), 1) * 1e-4):
                            good = False
                    elif x != y:
                        good = False
        if not good:
            ok = False
            print(f"[{pid}] MISMATCH {label}: got={got[:3]} want={want[:3]}",
                  flush=True)

    m = ~np.isnan(v)

    # 1. keyless aggregate with filter
    r = dist.sql(
        "SELECT count(*), sum(v), avg(v), min(v), max(v) FROM fact "
        "WHERE k < 200"
    ).rows()
    f = k < 200
    fv = v[f & m]
    check("keyless", r, [(
        int(f.sum()), float(fv.sum()), float(fv.mean()),
        float(fv.min()), float(fv.max()),
    )], approx=True)

    # 2. group-by
    r = dist.sql(
        "SELECT g, count(*), sum(v), avg(v) FROM fact GROUP BY g ORDER BY g"
    ).rows()
    want = []
    for gg in sorted(set(g.tolist())):
        selg = g == gg
        vv = v[selg & m]
        want.append((gg, int(selg.sum()), float(vv.sum()), float(vv.mean())))
    check("groupby", r, want, approx=True)

    # 3. join (replicated dim) + group-by
    r = dist.sql(
        "SELECT d.nm, count(*), sum(f.v) FROM fact f JOIN dim d "
        "ON f.k = d.k GROUP BY d.nm ORDER BY d.nm"
    ).rows()
    nm_of = dim_nm[k]
    want = []
    for u in sorted(set(nm_of.tolist())):
        s2 = nm_of == u
        want.append((int(u), int(s2.sum()), float(v[s2 & m].sum())))
    check("join_groupby", r, want, approx=True)

    # 4. dict-string group-by (global dictionary ids)
    r = dist.sql(
        "SELECT s, count(*) FROM fact GROUP BY s ORDER BY s"
    ).rows()
    import collections

    cnt = collections.Counter(names.tolist())
    want = [(s2, cnt[s2]) for s2 in sorted(cnt)]
    check("string_groupby", r, want)

    # 5. distributed top-k
    r = dist.sql(
        "SELECT k, v FROM fact ORDER BY v DESC NULLS LAST LIMIT 25"
    ).rows()
    order = np.argsort(-np.where(m, v, -np.inf), kind="stable")[:25]
    want = [(int(k[i]), float(v[i])) for i in order]
    check("topk", r, want, approx=True)

    # 5a. distributed FULL sort (no LIMIT): gather + aggregator sort
    r = dist.sql(
        "SELECT k, v FROM fact WHERE v > 1.5 ORDER BY v DESC NULLS LAST, k"
    ).rows()
    sel = np.flatnonzero(m & (v > 1.5))
    fo = sel[np.lexsort((k[sel], -v[sel]))]
    want = [(int(k[i]), float(v[i])) for i in fo]
    check("full_sort", r, want, approx=True)

    # 5b. non-decomposable aggregates: repartition-by-group-key path
    r = dist.sql(
        "SELECT g, count(DISTINCT k), count(*) FROM fact "
        "GROUP BY g ORDER BY g"
    ).rows()
    want = []
    for gg in sorted(set(g.tolist())):
        selg = g == gg
        want.append((gg, len(set(k[selg].tolist())), int(selg.sum())))
    check("groupby_count_distinct", r, want)

    r = dist.sql(
        "SELECT g, approx_median(v) FROM fact WHERE g < 5 "
        "GROUP BY g ORDER BY g"
    ).rows()
    want = []
    for gg in range(5):
        vv = v[(g == gg) & m]
        want.append((gg, float(np.median(vv))))
    check("groupby_median", r, want, approx=True)

    # dict-string MIN/MAX (excluded from the decomposable path: merged
    # ids order by id, not lexicographic rank)
    r = dist.sql(
        "SELECT g, min(s), max(s) FROM fact GROUP BY g ORDER BY g"
    ).rows()
    want = []
    for gg in sorted(set(g.tolist())):
        ss = sorted(names[g == gg].tolist())
        want.append((gg, ss[0], ss[-1]))
    check("groupby_minmax_string", r, want)

    # 5c. keyless DISTINCT: value-partitioned, merged by exact SUM
    r = dist.sql(
        "SELECT count(DISTINCT k), approx_count_distinct(k) FROM fact "
        "WHERE g < 30"
    ).rows()
    nd = len(set(k[g < 30].tolist()))
    got_exact, got_approx = r[0]
    if got_exact != nd or not (0.9 * nd <= got_approx <= 1.1 * nd):
        ok = False
        print(f"[{pid}] MISMATCH keyless_distinct: {r} want {nd}",
              flush=True)

    # 5d. fact-fact distributed hash join: BOTH sides partitioned → the
    # engine hash-repartitions probe and build by the join key so
    # matching rows co-locate (DistEngine._colocate_joins).  Keys are
    # SKEWED (half of all orders on key 0) — correctness must hold with
    # a hot key resident wholly on one host.
    n_o = 2_000
    ok_keys = np.where(
        rng.random(n_o) < 0.5, 0, rng.integers(0, 400, n_o)
    ).astype(np.int32)
    o_w = rng.random(n_o).astype(np.float32)
    osel = slice(pid, None, nprocs)
    dist.load_table("orders", {"ok": ok_keys[osel], "w": o_w[osel]})

    r = dist.sql(
        "SELECT count(*), sum(f.v), sum(o.w) FROM fact f JOIN orders o "
        "ON f.k = o.ok"
    ).rows()
    # numpy oracle over the FULL data
    import collections as C

    per_key_cnt = C.Counter(ok_keys.tolist())
    per_key_w = C.defaultdict(float)
    for kk, ww in zip(ok_keys.tolist(), o_w.tolist()):
        per_key_w[kk] += ww
    cnt_j = sum(per_key_cnt.get(int(kk), 0) for kk in k)
    sv = float(sum(
        (0.0 if np.isnan(vv) else vv) * per_key_cnt.get(int(kk), 0)
        for kk, vv in zip(k, v)
    ))
    sw = float(sum(per_key_w.get(int(kk), 0.0) for kk in k))
    check("fact_fact_join", r, [(cnt_j, sv, sw)], approx=True)

    r = dist.sql(
        "SELECT f.g, count(*) FROM fact f JOIN orders o ON f.k = o.ok "
        "WHERE o.w > 0.5 GROUP BY f.g ORDER BY f.g"
    ).rows()
    hot = C.Counter(ok_keys[o_w > 0.5].tolist())
    want_map = C.defaultdict(int)
    for kk, gg in zip(k.tolist(), g.tolist()):
        want_map[gg] += hot.get(kk, 0)
    want = [(gg, want_map[gg]) for gg in sorted(want_map) if want_map[gg]]
    check("fact_fact_join_groupby", r, want)

    # 5e. distributed WINDOW functions: partition-key repartition →
    # complete partitions per host → local window, vs numpy oracle
    r = dist.sql(
        "SELECT g, k, sum(v) OVER (PARTITION BY g ORDER BY k, s), "
        "row_number() OVER (PARTITION BY g ORDER BY k, s) "
        "FROM fact WHERE g < 6 ORDER BY g, k, s"
    ).rows()
    sel6 = np.flatnonzero(g < 6)
    order6 = sel6[np.lexsort((names[sel6], k[sel6], g[sel6]))]
    ordered = [
        (int(g[i]), int(k[i]), names[i],
         None if np.isnan(v[i]) else float(v[i]))
        for i in order6
    ]
    # RANGE-peer semantics: rows tied on (k, s) within a partition share
    # the running sum at their LAST peer; row_number stays per-row.
    # SUM over zero non-null contributions is NULL.
    want = []
    acc = {}
    cntn = {}
    rnc = {}
    j = 0
    while j < len(ordered):
        gg, kk, ss, _ = ordered[j]
        e = j
        run_sum = 0.0
        run_cnt = 0
        while e < len(ordered) and ordered[e][:3] == (gg, kk, ss):
            if ordered[e][3] is not None:
                run_sum += ordered[e][3]
                run_cnt += 1
            e += 1
        acc[gg] = acc.get(gg, 0.0) + run_sum
        cntn[gg] = cntn.get(gg, 0) + run_cnt
        for _t in range(j, e):
            rnc[gg] = rnc.get(gg, 0) + 1
            want.append((gg, kk, acc[gg] if cntn[gg] else None, rnc[gg]))
        j = e
    if len(r) != len(want):
        ok = False
        print(f"[{pid}] MISMATCH window rows: {len(r)} != {len(want)}",
              flush=True)
    else:
        # rows tied on the final ORDER BY (g, k, s) may appear in any
        # order; (g, row_number) is unique — compare on that order
        r_s = sorted(r, key=lambda x: (x[0], x[3]))
        w_s = sorted(want, key=lambda x: (x[0], x[3]))
        for got_row, want_row in zip(r_s, w_s):
            bad = (got_row[0] != want_row[0] or got_row[1] != want_row[1]
                   or got_row[3] != want_row[3]
                   or (got_row[2] is None) != (want_row[2] is None))
            if not bad and want_row[2] is not None:
                bad = abs(got_row[2] - want_row[2]) \
                    > max(abs(want_row[2]), 1) * 1e-3
            if bad:
                ok = False
                print(f"[{pid}] MISMATCH window: {got_row} vs {want_row}",
                      flush=True)
                break

    # 5e2. LAG + RANK over the repartitioned windows (navigation +
    # ranking functions distribute through the same exchange)
    r = dist.sql(
        "SELECT g, k, lag(k) OVER (PARTITION BY g ORDER BY k, s, v), "
        "rank() OVER (PARTITION BY g ORDER BY k) "
        "FROM fact WHERE g < 4 AND v IS NOT NULL ORDER BY g, k, s, v"
    ).rows()
    sel4 = np.flatnonzero((g < 4) & m)
    o4 = sel4[np.lexsort((v[sel4], names[sel4], k[sel4], g[sel4]))]
    want = []
    prev_k = {}
    kcount = {}
    krank = {}
    for i in o4:
        gg, kk = int(g[i]), int(k[i])
        if gg not in kcount:
            kcount[gg] = 0
            krank[gg] = {}
        kcount[gg] += 1
        if kk not in krank[gg]:
            krank[gg][kk] = kcount[gg]
        want.append((gg, kk, prev_k.get(gg), krank[gg][kk]))
        prev_k[gg] = kk
    check("window_lag_rank", r, want)

    # 5f. GLOBAL window (no PARTITION BY): aggregator-window fallback
    r = dist.sql(
        "SELECT k, row_number() OVER (ORDER BY k, s, v) "
        "FROM fact WHERE k < 3 AND v IS NOT NULL ORDER BY k, s, v"
    ).rows()
    selg = np.flatnonzero((k < 3) & m)
    og = selg[np.lexsort((v[selg], names[selg], k[selg]))]
    wantg = [(int(k[i]), rn + 1) for rn, i in enumerate(og)]
    check("global_window", r, wantg)

    # 6. SHARD KEY routed loading: identical full data passed on every
    # host; hash routing keeps disjoint row partitions covering all rows
    db.sql("CREATE TABLE sharded (k INT, v FLOAT, SHARD KEY (k)) "
           "WITH (shard_count=8)")
    dist.load_table(
        "sharded", {"k": k, "v": v}, create=False, route_by_shard_key=True
    )
    local_n = db.catalog.get_table("sharded").num_rows
    total = sum(rt.allgather_scalar(local_n))
    r = dist.sql("SELECT count(*) FROM sharded").rows()
    if total != n or r[0][0] != n:
        ok = False
        print(f"[{pid}] MISMATCH shard_load: local={local_n} total={total} "
              f"sql={r}", flush=True)

    print(f"[{pid}] " + ("PARITY_OK" if ok else "PARITY_FAILED"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
