"""Bitcast-free f64 bit codec (ops/f64bits) — exactness vs numpy views.

Some TPU compile services reject 64-bit bitcast_convert_type/frexp; the
engine derives f64 sort keys, group keys and hashes through this codec
instead.  Subnormals flatten to zero by design (XLA FTZ — module header).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from heavydb_tpu.ops.f64bits import (
    bits_to_f64,
    f64_orderable_u64,
    f64_to_bits,
    i64_to_u64,
    u64_to_i64,
)

TINY = np.finfo(np.float64).tiny


@pytest.fixture(scope="module")
def vals(rng):
    v = np.concatenate([
        rng.random(50_000),
        -rng.random(5_000),
        np.exp(rng.normal(0, 200, 20_000)) * np.where(
            rng.random(20_000) < 0.5, 1.0, -1.0),
        np.array([0.0, 1.0, -1.0, 2.0, 0.5, np.pi,
                  np.finfo(np.float64).max, -np.finfo(np.float64).max,
                  TINY, -TINY, 1e308, 123456789.123456789]),
    ])
    return v[np.isfinite(v) & ((v == 0) | (np.abs(v) >= TINY))]


def test_bits_exact(vals):
    got = np.asarray(f64_to_bits(jnp.asarray(vals)))
    assert (got == vals.view(np.int64)).all()


def test_bits_roundtrip(vals):
    back = np.asarray(bits_to_f64(jnp.asarray(vals.view(np.int64))))
    assert (back == vals).all()


def test_specials():
    v = np.array([np.inf, -np.inf])
    assert (np.asarray(f64_to_bits(jnp.asarray(v)))
            == v.view(np.int64)).all()
    assert np.isnan(np.asarray(
        bits_to_f64(f64_to_bits(jnp.asarray(np.array([np.nan]))))
    ))[0]
    back = np.asarray(bits_to_f64(f64_to_bits(jnp.asarray(v))))
    assert back[0] == np.inf and back[1] == -np.inf
    # -0.0 canonicalizes to +0.0; subnormals flatten to 0 (documented)
    z = np.asarray(f64_to_bits(jnp.asarray(np.array([-0.0, 1e-310]))))
    assert z[0] == 0 and z[1] == 0


def test_orderable(vals):
    u = np.asarray(f64_orderable_u64(jnp.asarray(vals)))
    order_v = np.argsort(vals, kind="stable")
    order_u = np.argsort(u, kind="stable")
    assert (vals[order_v] == vals[order_u]).all()


def test_int_reinterpret(rng):
    ints = rng.integers(-(2 ** 63), 2 ** 63 - 1, 100_000)
    u = np.asarray(i64_to_u64(jnp.asarray(ints)))
    assert (u == ints.view(np.uint64)).all()
    back = np.asarray(u64_to_i64(jnp.asarray(u)))
    assert (back == ints).all()
