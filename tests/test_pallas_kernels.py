"""Interpret-mode correctness for the Pallas VMEM one-hot group-by kernels
(kernels/groupby_pallas.py) — round-1 verdict flagged these as untested
dead code.  interpret=True runs the kernel logic on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heavydb_tpu.kernels import groupby_pallas as GP


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n, slots = 10_000, 700
    gid = rng.integers(0, slots, n).astype(np.int32)
    mask = rng.random(n) < 0.9
    return n, slots, gid, mask, rng


def test_count_per_slot_interpret(data):
    n, slots, gid, mask, rng = data
    out = GP.count_per_slot(
        jnp.asarray(gid), jnp.asarray(mask), slots, interpret=True
    )
    ref = np.bincount(gid[mask], minlength=slots)
    assert (np.asarray(out) == ref).all()


def test_sum_f32_per_slot_interpret(data):
    n, slots, gid, mask, rng = data
    v = rng.normal(size=n).astype(np.float32)
    out = GP.sum_f32_per_slot(
        jnp.asarray(gid), jnp.asarray(v), jnp.asarray(mask), slots,
        interpret=True,
    )
    ref = np.zeros(slots, np.float64)
    np.add.at(ref, gid[mask], v[mask].astype(np.float64))
    assert np.allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_sum_int_per_slot_interpret_exact(data):
    n, slots, gid, mask, rng = data
    v = rng.integers(-(2**31) + 1, 2**31 - 1, n).astype(np.int32)
    out = GP.sum_int_per_slot(
        jnp.asarray(gid), jnp.asarray(v), jnp.asarray(mask), slots,
        interpret=True,
    )
    ref = np.zeros(slots, np.int64)
    np.add.at(ref, gid[mask], v[mask].astype(np.int64))
    assert (np.asarray(out) == ref).all(), "int sums must be EXACT"


@pytest.mark.parametrize("is_min", [True, False])
def test_minmax_per_slot_interpret(data, is_min):
    n, slots, gid, mask, rng = data
    v = rng.integers(-10**6, 10**6, n).astype(np.int32)
    out = GP.minmax_per_slot(
        jnp.asarray(gid), jnp.asarray(v), jnp.asarray(mask), slots, is_min,
        interpret=True,
    )
    info = np.iinfo(np.int32)
    ref = np.full(slots, info.max if is_min else info.min, np.int64)
    if is_min:
        np.minimum.at(ref, gid[mask], v[mask])
    else:
        np.maximum.at(ref, gid[mask], v[mask])
    got = np.asarray(out)
    present = np.bincount(gid[mask], minlength=slots) > 0
    assert (got[present] == ref[present]).all()


def test_minmax_float_interpret(data):
    n, slots, gid, mask, rng = data
    v = rng.normal(size=n).astype(np.float32)
    out = GP.minmax_per_slot(
        jnp.asarray(gid), jnp.asarray(v), jnp.asarray(mask), slots, True,
        interpret=True,
    )
    ref = np.full(slots, np.inf, np.float32)
    np.minimum.at(ref, gid[mask], v[mask])
    got = np.asarray(out)
    present = np.bincount(gid[mask], minlength=slots) > 0
    assert (got[present] == ref[present]).all()


# ---------------------------------------------------------------------------
# round-3 kernels: radix_hist (fused MXU hist), lane_agg, tile_sort
# ---------------------------------------------------------------------------

from heavydb_tpu.kernels.lane_agg import lane_agg
from heavydb_tpu.kernels.radix_hist import fused_hist
from heavydb_tpu.kernels.tile_sort import sort_tiles


def test_fused_hist_all_stream_classes(data):
    n, slots, gid, mask, rng = data
    v = rng.random(n).astype(np.float32)
    cm = (rng.random(n) > 0.3) & mask
    limb = (rng.integers(0, 256, n) * cm).astype(np.float32)
    cmf = cm.astype(np.float32)
    vm = np.where(cm, v, 0).astype(np.float32)
    res = fused_hist(
        jnp.asarray(gid), jnp.asarray(mask),
        [jnp.asarray(cmf), jnp.asarray(limb), jnp.asarray(vm),
         jnp.asarray(vm)],
        slots, exact_accs=("count", True, False, True),
        bf16_ok=(False, True, False, False), interpret=True)
    counts, c_cnt, c_limb, c_sum, c_d = [np.asarray(r) for r in res]
    assert (counts == np.bincount(gid[mask], minlength=slots)).all()
    assert (c_cnt == np.bincount(gid[cm], minlength=slots)).all()
    assert (c_limb == np.bincount(gid, weights=limb, minlength=slots)).all()
    exp = np.bincount(gid, weights=vm.astype(np.float64), minlength=slots)
    assert np.allclose(c_sum, exp, rtol=1e-5, atol=1e-5)
    assert np.allclose(c_d, exp, rtol=5e-6, atol=1e-6)


def test_fused_hist_int8_path(data):
    n, slots, gid, mask, rng = data
    cm = (rng.random(n) > 0.4) & mask
    limb = (rng.integers(0, 256, n) * cm).astype(np.float32)
    res = fused_hist(
        jnp.asarray(gid), jnp.asarray(mask),
        [jnp.asarray(cm.astype(np.float32)), jnp.asarray(limb)],
        slots, exact_accs=("count", True), bf16_ok=(False, True),
        interpret=True)
    counts, c_cnt, c_limb = [np.asarray(r) for r in res]
    assert (counts == np.bincount(gid[mask], minlength=slots)).all()
    assert (c_cnt == np.bincount(gid[cm], minlength=slots)).all()
    assert (c_limb == np.bincount(gid, weights=limb, minlength=slots)).all()


def test_lane_agg_sums_minmax(data):
    n, slots, gid, mask, rng = data
    slots = 128
    gid = (gid % slots).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    cm = (rng.random(n) > 0.3) & mask
    iv = rng.integers(-50, 50, n).astype(np.int32)
    vm = np.where(cm, v, 0).astype(np.float32)
    vmin = np.where(cm, v, np.inf).astype(np.float32)
    imax = np.where(cm, iv, np.iinfo(np.int32).min).astype(np.int32)
    limb = (rng.integers(0, 256, n) * cm).astype(np.float32)
    out = lane_agg(
        jnp.asarray(gid), jnp.asarray(mask),
        [(jnp.asarray(vm), "sumf", 0), (jnp.asarray(limb), "sumi", 0),
         (jnp.asarray(vmin), "min", np.inf),
         (jnp.asarray(imax), "max", np.iinfo(np.int32).min)],
        slots, interpret=True)
    counts, s, li, mn, mx = [np.asarray(r) for r in out]
    assert (counts == np.bincount(gid[mask], minlength=slots)).all()
    assert np.allclose(
        s, np.bincount(gid, weights=vm.astype(np.float64), minlength=slots),
        rtol=1e-6)
    assert (li == np.bincount(gid, weights=limb, minlength=slots)).all()
    for sl in range(slots):
        rows = (gid == sl) & cm
        if rows.any():
            assert mn[sl] == v[rows].min()
            assert mx[sl] == iv[rows].max()


def test_tile_sort_with_payload():
    rng = np.random.default_rng(5)
    T = 1024
    n = 3 * T
    k = rng.integers(0, 2**31 - 1, n).astype(np.int32)
    p = rng.integers(0, 10**6, n).astype(np.int32)
    out = sort_tiles(jnp.asarray(k), [jnp.asarray(p)], rows_per_tile=T,
                     n_payloads=1, interpret=True)
    ks, ps = np.asarray(out[0]), np.asarray(out[1])
    for t in range(3):
        sl = slice(t * T, (t + 1) * T)
        assert (np.diff(ks[sl]) >= 0).all()
        pair = dict(zip(k[sl].tolist(), p[sl].tolist()))
        assert all(pair[int(kk)] == int(pp)
                   for kk, pp in zip(ks[sl].tolist(), ps[sl].tolist()))
