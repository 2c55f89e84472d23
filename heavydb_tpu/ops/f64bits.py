"""Exact f64 <-> IEEE-754 bit conversions WITHOUT 64-bit bitcasts.

Some TPU compile services reject any `bitcast_convert_type` (and frexp)
touching f64 — their X64-rewrite pass lacks the lowering — while f64
arithmetic, comparisons, gathers and 64-bit integer converts all work.
These helpers reconstruct the EXACT IEEE-754 bit pattern arithmetically:

  exponent  : one `searchsorted` against the exact power-of-two table
  mantissa  : v / 2^e is exact (power-of-two division), (m-1)*2^52 is an
              integer <= 2^52 so the int64 convert is exact
  subnormals: FLATTEN to +/-0 — XLA evaluates f64 subnormal
              arithmetic with flush-to-zero, so their bits are
              unrecoverable arithmetically; values below 2.23e-308
              therefore key/hash/group as zero (their stored column
              values remain exact — only derived keys flatten)
  inf/nan/0 : explicit cases (-0.0 canonicalizes to +0.0 — engine
              callers already canonicalize zeros and NaNs)

The engine's sort-key packing, f64 group-key packing, and f64 hashing
route through here (they previously bitcast f64<->i64 directly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# exact powers of two 2^-1074 .. 2^1023 (min subnormal .. top binade)
_POW2 = np.ldexp(1.0, np.arange(-1074, 1024))
_EXP0 = 1074  # table index of 2^0

_SIGN = np.int64(np.uint64(1 << 63).astype(np.int64))  # INT64_MIN
_EXPM = np.int64(0x7FF) << np.int64(52)
_MANM = (np.int64(1) << np.int64(52)) - np.int64(1)


def i64_to_u64(v):
    """Reinterpret int64 bits as uint64 (convert wraps two's-complement)."""
    return jnp.asarray(v, jnp.int64).astype(jnp.uint64)


def u64_to_i64(u):
    """Reinterpret uint64 bits as int64 without relying on overflow UB."""
    u = jnp.asarray(u, jnp.uint64)
    hi = u >> jnp.uint64(63)
    low = (u & jnp.uint64((1 << 63) - 1)).astype(jnp.int64)
    return jnp.where(hi > 0, low + jnp.int64(_SIGN), low)


def f64_to_bits(v):
    """IEEE-754 bit pattern of float64 `v` as int64 — exact, bitcast-free.
    -0.0 maps to +0.0's pattern (callers canonicalize zeros)."""
    v = jnp.asarray(v, jnp.float64)
    tab = jnp.asarray(_POW2)
    av = jnp.abs(v)
    neg = v < 0
    finite_pos = jnp.isfinite(av) & (av > 0)
    safe_av = jnp.where(finite_pos, av, 1.0)
    # tab[eidx] <= safe_av < tab[eidx+1]; table entries are exact
    eidx = jnp.clip(
        jnp.searchsorted(tab, safe_av, side="right") - 1,
        0, tab.shape[0] - 1,
    )
    uexp = eidx - _EXP0 + 1023  # IEEE biased exponent (>= 1 for normals)
    is_sub = uexp < 1  # subnormal: flatten to zero (FTZ — see header)
    # normal: mantissa = av / 2^e in [1, 2); (m - 1) * 2^52 is integral
    m = safe_av / tab[eidx]
    mbits = ((m - 1.0) * np.float64(1 << 52)).astype(jnp.int64)
    bits_norm = (uexp.astype(jnp.int64) << jnp.int64(52)) | mbits
    bits = jnp.where(is_sub | (av == 0), jnp.int64(0), bits_norm)
    bits = jnp.where(jnp.isinf(v), _EXPM, bits)
    bits = jnp.where(
        jnp.isnan(v), _EXPM | (jnp.int64(1) << jnp.int64(51)), bits
    )
    return jnp.where(neg & ~jnp.isnan(v), bits | jnp.int64(_SIGN), bits)


def bits_to_f64(b):
    """Inverse of f64_to_bits: int64 IEEE-754 pattern → float64 — exact."""
    b = jnp.asarray(b, jnp.int64)
    tab = jnp.asarray(_POW2)
    neg = b < 0
    mag = b & ~jnp.int64(_SIGN)
    ef = (mag >> jnp.int64(52)) & jnp.int64(0x7FF)
    man = mag & _MANM
    # normal: (1 + man*2^-52) * 2^(ef-1023) — both factors exact
    frac = man.astype(jnp.float64) * np.float64(2.0 ** -52)
    nidx = jnp.clip(ef + jnp.int64(_EXP0 - 1023), 0, tab.shape[0] - 1)
    v_norm = (1.0 + frac) * tab[nidx]
    # ef == 0 (zero/subnormal patterns) → 0.0 (FTZ — see header)
    v = jnp.where(ef == 0, jnp.float64(0.0), v_norm)
    v = jnp.where(
        ef == jnp.int64(0x7FF),
        jnp.where(man == 0, jnp.float64(jnp.inf), jnp.float64(jnp.nan)),
        v,
    )
    return jnp.where(neg, -v, v)


def f64_orderable_u64(v):
    """uint64 whose natural order equals f64 total order (sign-flip trick
    over the exact bit pattern) — the bitcast-free replacement for the
    classic `bitcast ^ mask` sort-key transform."""
    u = i64_to_u64(f64_to_bits(v))
    mask = jnp.where(
        (u >> jnp.uint64(63)) > 0,
        jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(0x8000000000000000),
    )
    return u ^ mask
