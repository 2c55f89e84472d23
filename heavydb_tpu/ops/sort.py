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


def topk_indices(key, k: int):
    """Indices of the k largest `key` values — EXACT two-stage block top-k
    (single lax.top_k over 20M rows measured 20s on TPU; per-block top-k
    then top-k of the block winners is massively parallel)."""
    n = key.shape[0]
    block = 4096
    if k >= block or n <= block:
        _, idx = lax.top_k(key, min(k, n))
        return idx
    nb = -(-n // block)
    n_p = nb * block
    if n_p != n:
        if key.dtype.kind == "f":
            fill = jnp.asarray(-np.inf, key.dtype)
        else:
            fill = jnp.asarray(np.iinfo(key.dtype).min, key.dtype)
        key = jnp.concatenate([key, jnp.full(n_p - n, fill, key.dtype)])
    k2 = min(k, block)
    vals2, idx2 = lax.top_k(key.reshape(nb, block), k2)
    base = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    flat_idx = (base + idx2).reshape(-1)
    flat_vals = vals2.reshape(-1)
    _, sel = lax.top_k(flat_vals, k)
    return flat_idx[sel]


def sort_permutation(
    key_tvs: Sequence[TV],
    specs: Sequence[Tuple[bool, bool]],  # (asc, nulls_first) per key
    mask,  # valid-row mask or None
):
    """Returns (perm[N] int32, valid_sorted[N] bool): row indices in output
    order, invalid rows pushed to the end."""
    n = key_tvs[0][0].shape[0] if key_tvs else mask.shape[0]
    in_domain = mask if mask is not None else jnp.ones(n, jnp.bool_)
    operands = [(~in_domain).astype(jnp.int8)]
    for (val, valid), (asc, nulls_first) in zip(key_tvs, specs):
        nullr, v = _sortable_operands(val, valid, asc, nulls_first)
        operands.append(nullr)
        operands.append(v)
    rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
    res = lax.sort(operands + [rows], num_keys=len(operands), is_stable=True)
    return res[-1], res[0] == 0
