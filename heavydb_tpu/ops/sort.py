"""ORDER BY / top-k kernels.

Reference: ResultSet::sort (QueryEngine/ResultSetSort.cpp — GPU thrust
sort_by_key + permutation apply; CPU parallelTop k-heaps; StreamingTopN).
TPU-native: one `lax.sort` over (sort-key operands..., row index) gives the
permutation; columns are gathered through it.  NULLS FIRST/LAST and DESC are
encoded by transforming each key into an ascending-sortable operand pair
(null_rank, canonical_value) so a single lexicographic sort handles any key
combination.  LIMIT applies as a static slice of the permutation (top-k).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from heavydb_tpu.ops import scan as SC

TV = Tuple[object, Optional[object]]


def _sortable_operands(val, valid, asc: bool, nulls_first: bool):
    """Key column → (null_rank int8, value) ascending-sort operands."""
    v = jnp.asarray(val)
    if v.dtype.kind == "f":
        v = jnp.where(jnp.isnan(v), jnp.asarray(0, v.dtype), v)
    if not asc:
        if v.dtype.kind == "f":
            v = -v
        else:
            v = jnp.asarray(-jnp.asarray(v, jnp.int64), jnp.int64)
    if valid is None:
        nullr = jnp.zeros(v.shape, jnp.int8)
    else:
        nullr = jnp.where(valid, jnp.int8(0), jnp.int8(-1 if nulls_first else 1))
        v = jnp.where(valid, v, jnp.asarray(0, v.dtype))
    return nullr, v


def _orderable_bits(key):
    """Map key → unsigned ints whose natural order equals the key order.
    f32/f64 use the sign-flip trick; ints get the bias flip."""
    dt = np.dtype(key.dtype)
    if dt == np.float32:
        u = lax.bitcast_convert_type(key, jnp.uint32)
        mask = jnp.where(
            (u >> jnp.uint32(31)) > 0,
            jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000),
        )
        return u ^ mask, 32
    if dt == np.float64:
        # NO f64 bitcast: some TPU compile services reject the X64
        # bitcast rewrite — reconstruct the exact sign-flipped bit
        # pattern arithmetically (ops/f64bits; subnormals flatten to 0)
        from heavydb_tpu.ops.f64bits import f64_orderable_u64

        return f64_orderable_u64(key), 64
    if dt.kind in "iu":
        if dt.itemsize <= 4:
            u = key.astype(jnp.int32).astype(jnp.uint32)
            return u ^ jnp.uint32(0x80000000), 32
        u = key.astype(jnp.int64).astype(jnp.uint64)
        return u ^ jnp.uint64(0x8000000000000000), 64
    raise TypeError(f"no orderable bits for {dt}")


def composite_topk_key(key_tvs: Sequence[TV], specs, total_bits: int,
                       in_domain=None):
    """Pack multi-column ORDER BY keys into ONE orderable uint where a
    LARGER packed value means EARLIER in the output order (descending-
    priority, the convention of the radix select).

    specs: per key (wv, lo, asc, nulls_first, nullable) — wv = value bit
    width (range-narrowed via chunk stats when lo is not None), lo = int
    bias or None for full-width orderable bits.  Nullable keys spend one
    extra bit: real codes shift up by 1, null maps to the all-ones code
    (nulls first) or 0 (nulls last).  Caller guarantees Σ widths ≤ 63.

    in_domain (optional bool[n]) spends the TOP bit so padding rows rank
    strictly below every real row (padding carries null sentinels, and a
    NULLS FIRST key would otherwise rank it above everything).
    Returns (u, bits)."""
    bits = total_bits + (1 if in_domain is not None else 0)
    udt = jnp.uint32 if bits <= 32 else jnp.uint64
    acc = None
    for (val, valid), (wv, lo, asc, nulls_first, nullable) in zip(
            key_tvs, specs):
        if lo is None:
            u, full = _orderable_bits(val)
            assert full == wv
            u = u.astype(udt)
        else:
            u = (jnp.asarray(val, jnp.int64) - lo).astype(jnp.uint64)
            u = jnp.clip(u, 0, (np.uint64(1) << np.uint64(wv)) - 1)
            u = u.astype(udt)
        top = (np.int64(1) << np.int64(wv)) - 1
        if asc:  # earlier = smaller value → flip within width
            u = jnp.asarray(top, udt) - u
        w = wv
        if nullable:
            w = wv + 1
            u = u + jnp.asarray(1, udt)
            null_code = (np.int64(1) << np.int64(w)) - 1 if nulls_first else 0
            if valid is not None:
                u = jnp.where(valid, u, jnp.asarray(null_code, udt))
        acc = u if acc is None else (
            (acc << jnp.asarray(w, udt)) | u
        )
    if in_domain is not None:
        acc = acc | (
            in_domain.astype(udt) << jnp.asarray(total_bits, udt)
        )
    return acc, bits


def topk_indices_u(u, bits: int, k: int):
    """topk_indices over precomputed orderable bits (composite keys)."""
    n = u.shape[0]
    kk = jnp.asarray(k, jnp.int32)
    if n <= 16384 or k >= n:
        _, idx = lax.top_k(u, min(k, n))
        return idx
    return _select_topk(u, bits, kk, k)


def topk_indices(key, k: int):
    """Indices of the k largest `key` values — EXACT radix-select: ~bits
    masked-count passes to find the k-th value's bit pattern, then one
    compaction pass.  Pure memory-bandwidth VPU work; lax.top_k and lax.sort
    over tens of millions of rows measured 17-27s on TPU, this is O(32)
    cheap reductions (reference role: thrust radix select / TopKSort.cu)."""
    n = key.shape[0]
    if n <= 16384 or k >= n:
        _, idx = lax.top_k(key, min(k, n))
        return idx
    u, bits = _orderable_bits(key)
    kk = jnp.asarray(k, jnp.int32)
    return _select_topk(u, bits, kk, k)


def _select_topk(u, bits: int, kk, k: int):
    threshold, _ = _radix_loop(u, bits, kk)
    above = u > threshold
    at = u == threshold
    n_above = above.sum(dtype=jnp.int32)
    # take all strictly-above plus enough ties to reach k
    tie_rank = SC.cumsum(at.astype(jnp.int32))
    sel = above | (at & (tie_rank <= (kk - n_above)))
    pos = SC.cumsum(sel.astype(jnp.int32)) - 1
    out = _compact_selected(sel, pos, k)
    # order the k winners among themselves (k is small)
    ksel = u[out]
    _, order = lax.top_k(ksel, k)
    return out[order]


def _compact_selected(sel, pos, k: int):
    """Row indices of the k selected rows (sel has exactly k Trues, pos is
    their output slot).  A scatter would serialize: the n-k rejected rows
    all collide on one drop slot (TPU scatter with colliding indices is
    serial — measured seconds at 20M rows).  Instead: chunked one-hot
    matmul — each slot receives exactly ONE contribution, and row indices
    are split hi/lo so each f32 dot is exact (< 2^24)."""
    n = sel.shape[0]
    gid = jnp.where(sel, pos, k).astype(jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
    # chunk so the [chunk, k] one-hot tile stays ~128MB max
    ch = 1 << 22
    while ch * max(k, 1) > (1 << 25) and ch > (1 << 12):
        ch //= 2
    nch = -(-n // ch)
    pad = nch * ch - n
    if pad:
        gid = jnp.concatenate([gid, jnp.full(pad, k, jnp.int32)])
        rows = jnp.concatenate([rows, jnp.zeros(pad, jnp.int32)])
    hi = (rows >> 12).astype(jnp.float32).reshape(nch, ch)
    lo = (rows & 0xFFF).astype(jnp.float32).reshape(nch, ch)
    gid = gid.reshape(nch, ch)
    slots = lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(carry, chunk):
        g, h, l = chunk
        oh = (g[:, None] == slots[None, :]).astype(jnp.float32)
        a_hi, a_lo = carry
        return (a_hi + h @ oh, a_lo + l @ oh), None

    (a_hi, a_lo), _ = lax.scan(
        body, (jnp.zeros(k, jnp.float32), jnp.zeros(k, jnp.float32)),
        (gid, hi, lo),
    )
    return (a_hi.astype(jnp.int32) << 12) | a_lo.astype(jnp.int32)


def _radix_loop(u, bits: int, kk):
    one = jnp.asarray(1, u.dtype)

    def body(i, carry):
        prefix = carry
        b = bits - 1 - i
        test = prefix | (one << jnp.asarray(b, u.dtype))
        cnt = (u >= test).sum(dtype=jnp.int32)
        return jnp.where(cnt >= kk, test, prefix)

    prefix = lax.fori_loop(0, bits, body, jnp.zeros((), u.dtype))
    return prefix, None


def sort_permutation(
    key_tvs: Sequence[TV],
    specs: Sequence[Tuple[bool, bool]],  # (asc, nulls_first) per key
    mask,  # valid-row mask or None
    payloads: Sequence = (),
):
    """Returns (perm[N] int32, valid_sorted[N] bool, sorted_payloads):
    row indices in output order, invalid rows pushed to the end.
    `payloads` ride the sort as extra operands (~10-15ms each at 2^25)
    instead of being gathered through the permutation afterwards (one
    random gather costs ~480ms at the same size — round-5 measurement,
    same economics as the window kernel's payload plan)."""
    n = key_tvs[0][0].shape[0] if key_tvs else mask.shape[0]
    in_domain = mask if mask is not None else jnp.ones(n, jnp.bool_)
    operands = [(~in_domain).astype(jnp.int8)]
    for (val, valid), (asc, nulls_first) in zip(key_tvs, specs):
        nullr, v = _sortable_operands(val, valid, asc, nulls_first)
        operands.append(nullr)
        operands.append(v)
    rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
    res = lax.sort(operands + [rows] + list(payloads),
                   num_keys=len(operands), is_stable=True)
    k = len(operands)
    return res[k], res[0] == 0, tuple(res[k + 1:])
