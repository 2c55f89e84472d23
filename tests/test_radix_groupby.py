"""Correctness tests for the radix-partition sparse group-by kernel
(kernels/radix_groupby.sparse_groupby) in interpret mode — the
TPU-native counterpart of the reference's baseline-hash group-by
(QueryEngine/GroupByRuntime.cpp:25 get_group_value).  On-hardware
parity is covered by the engine-level differential tests once the
executor routes the sparse tier here (tests/test_sparse_tier.py)."""

import collections
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heavydb_tpu.kernels import radix_groupby as RG

# interpret-mode Pallas compiles minutes-scale XLA emulation graphs on
# CPU; the full stream-vocabulary matrix is gated for nightly/pre-bench
# runs (HEAVYDB_TPU_SLOW_TESTS=1) while a smoke subset always runs
# interpret-mode Pallas under the 8-virtual-device conftest costs
# ~5min PER compile; the whole file is opt-in (the always-on engine
# coverage is tests/test_sparse_tier.py via the numpy reference, and
# the real kernel is exercised on hardware by bench.py every round)
pytestmark = pytest.mark.skipif(
    not os.environ.get("HEAVYDB_TPU_SLOW_TESTS"),
    reason="interpret-mode Pallas matrix (set HEAVYDB_TPU_SLOW_TESTS=1)",
)


def _run(gid, streams, slots, ops, cap):
    out = RG.sparse_groupby(
        jnp.asarray(gid), [jnp.asarray(s) for s in streams], slots,
        tuple(ops), cap, interpret=True)
    g_out, len_out, totals, ng, ovf = out
    return (np.asarray(g_out), np.asarray(len_out),
            [np.asarray(t) for t in totals], int(ng), int(ovf))


def _oracle(gid):
    return collections.Counter(gid.tolist())


def test_count_only_single_level():
    rng = np.random.default_rng(0)
    n, slots = 40_000, 1000
    gid = rng.integers(0, slots, n).astype(np.int32)
    go, lo, _, ng, ovf = _run(gid, [], slots, (), 2048)
    cnt = _oracle(gid)
    assert ovf == 0
    assert ng == len(cnt)
    assert len(set(go[:ng].tolist())) == ng
    for g, l in zip(go[:ng].tolist(), lo[:ng].tolist()):
        assert cnt[g] == l


def test_sumf_and_validity_stream():
    rng = np.random.default_rng(1)
    n, slots = 50_000, 30_000
    gid = rng.integers(0, slots, n).astype(np.int32)
    v = rng.uniform(-3, 3, n).astype(np.float32)
    valid = rng.random(n) > 0.2
    vm = np.where(valid, v, 0).astype(np.float32)
    cap = 1 << 15
    go, lo, (s, c), ng, ovf = _run(
        gid, [vm, valid.astype(np.int32)], slots,
        ("sumf", "sumi32"), cap)
    cnt = _oracle(gid)
    assert ovf == 0 and ng == len(cnt)
    es, ec = {}, {}
    for g, x, ok in zip(gid.tolist(), v.tolist(), valid.tolist()):
        if ok:
            es[g] = es.get(g, 0.0) + x
            ec[g] = ec.get(g, 0) + 1
    for g, l, sv, cv in zip(go[:ng], lo[:ng], s[:ng], c[:ng]):
        assert cnt[g] == l
        assert ec.get(g, 0) == cv
        assert abs(es.get(g, 0.0) - sv) < 1e-2


def test_minmax_two_level(monkeypatch):
    rng = np.random.default_rng(2)
    # force the two-level partition path at a CI-friendly size: 4 tiles,
    # 4 L1 regions x 2 tiles capacity, 4 L2 buckets each (interpret-mode
    # emulation of the natural >786k-row threshold costs minutes)
    monkeypatch.setattr(RG, "_plan", lambda ntiles: (2, 2, 1, 2 * RG._R))
    n, slots = 120_000, 90_000
    gid = rng.integers(0, slots, n).astype(np.int32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    go, lo, (mn, mx), ng, ovf = _run(
        gid, [vi, vi], slots, ("min", "max"), 1 << 17)
    cnt = _oracle(gid)
    assert ovf == 0 and ng == len(cnt)
    emn, emx = {}, {}
    for g, x in zip(gid.tolist(), vi.tolist()):
        emn[g] = min(emn.get(g, 1 << 30), x)
        emx[g] = max(emx.get(g, -(1 << 30)), x)
    bad = sum(
        1 for g, l, a, b in zip(go[:ng], lo[:ng], mn[:ng], mx[:ng])
        if cnt[g] != l or emn[g] != a or emx[g] != b
    )
    assert bad == 0


def test_limb_sums_exact():
    rng = np.random.default_rng(3)
    n, slots = 60_000, 20_000
    gid = rng.integers(0, slots, n).astype(np.int32)
    v = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64)
    # 16-bit limbs of the sign-flipped value
    u = (v + (1 << 31)).astype(np.uint32)
    l0 = (u & 0xFFFF).astype(np.int32)
    l1 = (u >> 16).astype(np.int32)
    go, lo, (s0, s1), ng, ovf = _run(
        gid, [l0, l1], slots, ("sumi32_limb", "sumi32_limb"), 1 << 15)
    cnt = _oracle(gid)
    assert ovf == 0 and ng == len(cnt)
    esum = {}
    for g, x in zip(gid.tolist(), v.tolist()):
        esum[g] = esum.get(g, 0) + int(x)
    for g, l, a, b in zip(go[:ng], lo[:ng], s0[:ng], s1[:ng]):
        got = int(a) + (int(b) << 16) - int(l) * (1 << 31)
        assert esum[g] == got, (g, esum[g], got)


def test_limb_overflow_flag():
    # one group with > MAX_SEG_INT rows must set the overflow flag
    n = RG.MAX_SEG_INT + 2000
    gid = np.zeros(n, np.int32)
    l0 = np.ones(n, np.int32)
    _, _, _, _, ovf = _run(gid, [l0], 10, ("sumi32_limb",), 128)
    assert ovf != 0


def test_cap_overflow_flag_and_exact_count():
    rng = np.random.default_rng(4)
    n, slots = 40_000, 30_000
    gid = rng.integers(0, slots, n).astype(np.int32)
    cnt = _oracle(gid)
    cap = 4096  # far below the ~23k distinct groups
    _, _, _, ng, ovf = _run(gid, [], slots, (), cap)
    assert ovf & 2  # cap-overflow bit
    assert not (ovf & 1)  # no hard failure: retry with cap >= ng works
    # num_groups stays EXACT past cap — it sizes the retry
    assert ng == len(cnt)


def test_masked_rows_dropped():
    rng = np.random.default_rng(5)
    n, slots = 40_000, 5000
    gid = rng.integers(0, slots, n).astype(np.int32)
    # executor encodes filtered rows as gid == num_slots (out of range)
    mask = rng.random(n) > 0.5
    g2 = np.where(mask, gid, slots).astype(np.int32)
    go, lo, _, ng, ovf = _run(g2, [], slots, (), 8192)
    cnt = _oracle(gid[mask])
    assert ovf == 0 and ng == len(cnt)
    for g, l in zip(go[:ng], lo[:ng]):
        assert cnt[g] == l


def test_sumds_f64_accuracy():
    rng = np.random.default_rng(6)
    n, slots = 50_000, 3000
    gid = rng.integers(0, slots, n).astype(np.int32)
    v = rng.uniform(-1e6, 1e6, n)
    hi = v.astype(np.float32)
    lo_ = (v - hi.astype(np.float64)).astype(np.float32)
    go, ln, (th, tl), ng, ovf = _run(
        gid, [hi, lo_], slots, ("sumds_hi", "sumds_lo"), 4096)
    cnt = _oracle(gid)
    assert ovf == 0 and ng == len(cnt)
    esum = {}
    for g, x in zip(gid.tolist(), v.tolist()):
        esum[g] = esum.get(g, 0.0) + x
    for g, a, b in zip(go[:ng], th[:ng], tl[:ng]):
        got = float(a) + float(b)
        # double-single keeps ~2^-48 relative error
        assert abs(esum[g] - got) <= 1e-6 + 1e-9 * abs(esum[g])
