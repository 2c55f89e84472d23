"""Hash-join kernels, TPU-native.

The reference builds open-addressing hash tables with CPU/GPU atomics
(QueryEngine/JoinHashTable/: PerfectJoinHashTable for dense int keys,
BaselineJoinHashTable for the rest, layout Keys/Offsets/Counts/Payloads per
docs/source/execution/hash_joins.rst).  TPUs have no global atomics, so we
keep the same two-path structure with device-native builds:

- **Perfect join** (dense key range): the "hash table" is a positional array
  indexed by (key - min): id array for 1:1, counts+offsets+payload (CSR) for
  1:N — built with scatters, probed with gathers.  Exactly the reference's
  perfect layout, minus atomics.
- **Sorted join** (baseline): build side is sorted by key (lax.sort); probes
  binary-search (searchsorted) for the run of matches.  Replaces MurmurHash
  open addressing — sort+search is the static-shape TPU strategy.

1:N fan-out uses the static-capacity expansion trick: per-probe-row match
counts → prefix-sum offsets → each output slot j finds its (probe row,
match ordinal) via searchsorted(offsets, j).  The kernel returns the exact
needed capacity so the executor's retry ladder can re-trace once if the
static cap was too small (reference ERR_OUT_OF_SLOTS analogue).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from heavydb_tpu.ops import scan as SC

# small-table lookup via one-hot MXU matmul: an XLA TPU gather costs
# ~14ns/row REGARDLESS of table size (measured: 21M-row gathers through
# 1K-entry join build tables were 150ms apiece — 0.6s of a 0.62s warm
# PK-FK join wall), while a chunked one-hot f32 matmul over a ≤2K-entry
# table runs ~0.6-1.3ns/row on the MXU (the engine's one-hot group-by
# tier cost model).  int32 values split into two 16-bit limbs so every
# f32 product/sum is exact (each output receives exactly ONE non-zero
# contribution).
_LUT_MAX_TABLE = 2048
_LUT_MIN_ROWS = 1 << 18


def lut_gather(tables, idx):
    """[t[idx] for t in tables] via one-hot matmuls; idx must be int32
    and pre-clipped to [0, B).  Returns None when shapes/dtypes don't
    qualify (caller falls back to plain gathers)."""
    if not tables:
        return []
    B = int(tables[0].shape[0])
    n = int(idx.shape[0])
    if B > _LUT_MAX_TABLE or n < _LUT_MIN_ROWS:
        return None
    # every limb column is bf16 and the dot runs at DEFAULT precision
    # (single MXU pass, ~1.9x the 6-pass HIGHEST f32 protocol measured at
    # 20M rows) — EXACT regardless: one-hot entries are 0/1 (exact in
    # bf16), 8-bit integer limbs are <= 255 (exact in bf16), and every
    # output element receives exactly ONE non-zero product into the f32
    # accumulator.  f32 tables split into three bf16 limbs (Dekker-style:
    # hi = bf16(x), mid = bf16(x - hi), lo = x - hi - mid; the three
    # mantissa fields are disjoint so the f32 sum hi+mid+lo is exact).
    cols = []
    spec = []
    for t in tables:
        dt = np.dtype(t.dtype)
        if t.shape[0] != B:
            return None
        if dt.kind == "f" and dt.itemsize == 4:
            x = jnp.asarray(t, jnp.float32)
            hi = x.astype(jnp.bfloat16)
            r1 = x - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            cols += [hi, mid, lo]
            spec.append(("f32", 3))
        elif dt.kind in "iub" and dt.itemsize <= 4:
            u = jnp.asarray(t, jnp.int32)
            cols += [
                (jnp.right_shift(u, s) & jnp.int32(0xFF)).astype(jnp.bfloat16)
                for s in (24, 16, 8, 0)
            ]
            spec.append(("i32", 4, dt))
        else:
            return None
    Bp = (B + 127) // 128 * 128
    rhs = jnp.stack(cols, axis=1)  # (B, L) bf16
    if Bp != B:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Bp - B, rhs.shape[1]), jnp.bfloat16)]
        )
    L = rhs.shape[1]
    ch = 1 << 22
    while ch * Bp > (1 << 25) and ch > 256:
        ch //= 2
    nch = -(-n // ch)
    pad = nch * ch - n
    idx_p = jnp.concatenate([idx, jnp.zeros(pad, jnp.int32)]) if pad else idx
    slots = lax.broadcasted_iota(jnp.int32, (Bp,), 0)

    def body(_, ic):
        oh = (ic[:, None] == slots[None, :]).astype(jnp.bfloat16)
        return None, lax.dot(oh, rhs, precision=lax.Precision.DEFAULT,
                             preferred_element_type=jnp.float32)

    _, parts = lax.scan(body, None, idx_p.reshape(nch, ch))
    flat = parts.reshape(nch * ch, L)[:n]
    out = []
    c = 0
    for sp in spec:
        if sp[0] == "f32":
            out.append(flat[:, c] + flat[:, c + 1] + flat[:, c + 2])
            c += 3
        else:
            v = jnp.zeros(n, jnp.int32)
            for j, s in enumerate((24, 16, 8, 0)):
                v = v | jnp.left_shift(
                    flat[:, c + j].astype(jnp.int32), s
                )
            out.append(v.astype(sp[2]))
            c += 4
    return out


class SortedBuild(NamedTuple):
    """Build-side index: rows sorted by key."""

    keys_sorted: object  # [B] int64 key values in sorted order
    rows_sorted: object  # [B] int32 original build-row index
    valid_sorted: object  # [B] bool — invalid rows sorted to the end


def build_sorted(keys, valid, num_rows_scalar):
    """Sort build side by key; invalid/out-of-domain rows get key INT64_MAX so
    the array stays globally sorted for searchsorted (probe_counts clamps the
    match window to the valid prefix)."""
    b = keys.shape[0]
    in_domain = lax.broadcasted_iota(jnp.int32, (b,), 0) < num_rows_scalar
    ok = in_domain if valid is None else (in_domain & valid)
    k = jnp.where(ok, jnp.asarray(keys, jnp.int64), jnp.iinfo(jnp.int64).max)
    rows = lax.broadcasted_iota(jnp.int32, (b,), 0)
    skeys, sflag, srows = lax.sort(
        [k, (~ok).astype(jnp.int8), rows], num_keys=2, is_stable=False
    )
    return SortedBuild(skeys, srows, sflag == 0)


def probe_counts(build: SortedBuild, probe_keys, probe_valid):
    """For each probe row: (first match position, match count)."""
    pk = jnp.asarray(probe_keys, jnp.int64)
    nvalid = build.valid_sorted.sum()
    lo = jnp.searchsorted(build.keys_sorted, pk, side="left")
    hi = jnp.searchsorted(build.keys_sorted, pk, side="right")
    # clamp matches into the valid prefix of the sorted build array
    lo = jnp.minimum(lo, nvalid)
    hi = jnp.minimum(hi, nvalid)
    cnt = (hi - lo).astype(jnp.int32)
    if probe_valid is not None:
        cnt = jnp.where(probe_valid, cnt, 0)
    return lo.astype(jnp.int32), cnt


class HashJoinTable(NamedTuple):
    keys: object      # int64 [rounds*slots] — key per claimed slot
    lo: object        # int32 [rounds*slots] — first match pos in sorted build
    cnt: object       # int32 [rounds*slots] — run length
    rows_sorted: object
    slots: int
    rounds: int
    unresolved: object  # device scalar — build keys that failed to claim


def _mix32(lo32, hi32, r: int):
    h = lo32 * jnp.uint32(0x85EBCA6B) + hi32 * jnp.uint32(0xC2B2AE35) + \
        jnp.uint32(0x9E3779B9 * (r + 1) & 0xFFFFFFFF)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    return h ^ (h >> jnp.uint32(15))


def build_hash_table(build: SortedBuild, slots: int, rounds: int = 4):
    """Open-addressing join table from a sorted build (reference
    BaselineJoinHashTable / fill_baseline_hash_join_buff_64): each UNIQUE
    build key claims a hashed slot (winner-takes-slot min-claim, losers
    re-hash) and stores its (first position, run length) in the sorted
    array.  Probing is then O(rounds) gathers — no binary search
    (searchsorted over large arrays costs seconds on TPU)."""
    b = build.keys_sorted.shape[0]
    first = jnp.concatenate([
        jnp.ones(1, jnp.bool_),
        build.keys_sorted[1:] != build.keys_sorted[:-1],
    ]) & build.valid_sorted
    pos = lax.broadcasted_iota(jnp.int32, (b,), 0)
    # run length: next unique start − own start
    nvalid = build.valid_sorted.sum().astype(jnp.int32)
    # index of next first ≥ i: reverse min-scan over first positions
    s = jnp.where(first, pos, b)
    rev = SC.assoc_scan(jnp.minimum, s, reverse=True)
    nxt_first = jnp.concatenate([rev[1:], jnp.full(1, b, jnp.int32)])
    run = jnp.minimum(nxt_first, nvalid) - pos
    big = jnp.int64(np.iinfo(np.int64).max)
    uk = jnp.where(first, build.keys_sorted, big)
    lo32 = (uk & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    hi32 = lax.shift_right_logical(uk, jnp.int64(32)).astype(jnp.uint32)
    unresolved = first
    keys_t, lo_t, cnt_t = [], [], []
    for r in range(rounds):
        slot = (_mix32(lo32, hi32, r) & jnp.uint32(slots - 1)).astype(
            jnp.int32
        )
        idx = jnp.where(unresolved, slot, slots)
        val = jnp.where(unresolved, uk, big)
        buf = jnp.full(slots + 1, big, jnp.int64).at[idx].min(val)
        owner = unresolved & (buf[jnp.clip(slot, 0, slots)] == uk)
        widx = jnp.where(owner, slot, slots)
        lo_buf = jnp.zeros(slots + 1, jnp.int32).at[widx].set(
            pos, mode="drop"
        )[:slots]
        cnt_buf = jnp.zeros(slots + 1, jnp.int32).at[widx].set(
            run.astype(jnp.int32), mode="drop"
        )[:slots]
        keys_t.append(buf[:slots])
        lo_t.append(lo_buf)
        cnt_t.append(cnt_buf)
        unresolved = unresolved & ~owner
    return HashJoinTable(
        jnp.concatenate(keys_t), jnp.concatenate(lo_t),
        jnp.concatenate(cnt_t), build.rows_sorted, slots, rounds,
        unresolved.sum(dtype=jnp.int32),
    )


def probe_counts_hash(table: HashJoinTable, probe_keys, probe_valid):
    """(first match position, match count) per probe row via O(rounds)
    table gathers (reference probe side of codegenMatchingSet)."""
    pk = jnp.asarray(probe_keys, jnp.int64)
    lo32 = (pk & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    hi32 = lax.shift_right_logical(pk, jnp.int64(32)).astype(jnp.uint32)
    n = pk.shape[0]
    hit_at = jnp.full(n, -1, jnp.int32)
    for r in range(table.rounds):
        slot = (
            _mix32(lo32, hi32, r) & jnp.uint32(table.slots - 1)
        ).astype(jnp.int32) + r * table.slots
        k = table.keys[slot]
        hit = (k == pk) & (hit_at < 0)
        hit_at = jnp.where(hit, slot, hit_at)
    found = hit_at >= 0
    sl = jnp.clip(hit_at, 0, table.rounds * table.slots - 1)
    lo = jnp.where(found, table.lo[sl], 0)
    cnt = jnp.where(found, table.cnt[sl], 0)
    if probe_valid is not None:
        cnt = jnp.where(probe_valid, cnt, 0)
    return lo, cnt


def expand_matches(
    lo, cnt, build_rows_sorted, probe_mask, cap: int, left_outer: bool
):
    """Expand 1:N matches into output row pairs with static capacity `cap`.

    Slot ownership is computed with unique-index scatters + int32 prefix
    sums — NOT searchsorted: binary search over a 20M-offset array costs
    log(n) rounds of large random gathers (~40s measured on TPU), while
    scatters with unique indices and i32 cumsums run at memory speed.

    Returns (probe_idx[cap], build_idx[cap], out_mask[cap],
             build_matched[cap] bool — False for LEFT-join null rows,
             needed — exact required capacity, device scalar).
    """
    n = cnt.shape[0]
    eff_cnt = cnt
    if probe_mask is not None:
        eff_cnt = jnp.where(probe_mask, eff_cnt, 0)
    if left_outer:
        base = jnp.maximum(eff_cnt, 1)
        if probe_mask is not None:
            base = jnp.where(probe_mask, base, 0)
        eff = base
    else:
        eff = eff_cnt
    # i32 prefix sums (i64 scans are emulated and ~100x slower on TPU);
    # per-chip row counts stay below 2^31
    offsets32 = SC.cumsum(eff.astype(jnp.int32))
    needed = offsets32[-1].astype(jnp.int64) if n else jnp.asarray(0, jnp.int64)
    starts = offsets32 - eff.astype(jnp.int32)  # start slot per probe row
    has = eff > 0
    # compact the contributing probe rows; mark each one's start slot
    kpos = SC.cumsum(has.astype(jnp.int32)) - 1
    rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
    rowmap = jnp.zeros(n + 1, jnp.int32).at[
        jnp.where(has, kpos, n)
    ].set(rows, mode="drop")[:n]
    marks = jnp.zeros(cap + 1, jnp.int32).at[
        jnp.where(has, starts, cap)
    ].set(1, mode="drop")[:cap]
    pj = SC.cumsum(marks) - 1  # ordinal among contributing rows per slot
    pidx = rowmap[jnp.clip(pj, 0, n - 1)]
    slot = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    ordinal = slot - starts[pidx]
    out_mask = slot < needed.astype(jnp.int32)
    matched = ordinal < eff_cnt[pidx]
    bpos = lo[pidx] + jnp.where(matched, ordinal, 0)
    bpos = jnp.clip(bpos, 0, build_rows_sorted.shape[0] - 1)
    bidx = build_rows_sorted[bpos]
    return pidx, bidx, out_mask, matched & out_mask, needed


def build_matched_flags(lo, cnt, build_rows_sorted, contributing, n_build: int):
    """FULL OUTER support: which BUILD rows matched ≥ 1 probe row.

    Interval coverage over the slot-grouped payload order: +1 at each
    contributing probe row's [lo, lo+cnt) start, -1 past its end, prefix
    sum > 0 → covered payload positions → scatter through the payload to
    per-build-row flags.  All unique/duplicate-index scatters + one i32
    cumsum — no sorts, no searches (same cost shape as expand_matches)."""
    m = build_rows_sorted.shape[0]
    has = cnt > 0
    if contributing is not None:
        has = has & contributing
    diff = jnp.zeros(m + 1, jnp.int32)
    diff = diff.at[jnp.where(has, lo, m)].add(1, mode="drop")
    diff = diff.at[jnp.where(has, lo + cnt, m)].add(-1, mode="drop")
    covered = SC.cumsum(diff[:m]) > 0
    tgt = jnp.where(covered, build_rows_sorted, n_build)
    flags = jnp.zeros(n_build + 1, jnp.bool_).at[tgt].set(
        True, mode="drop"
    )
    return flags[:n_build]


def probe_unique(lo, cnt, build_rows_sorted, mask):
    """Identity-domain probe for UNIQUE-key builds (each probe row matches
    ≤ 1 build row — the PK side of a PK-FK join): no expansion at all.
    Returns (build_idx[n], matched[n])."""
    bpos = jnp.clip(lo, 0, build_rows_sorted.shape[0] - 1)
    lut = lut_gather([build_rows_sorted], bpos.astype(jnp.int32))
    bidx = lut[0] if lut is not None else build_rows_sorted[bpos]
    matched = cnt > 0
    if mask is not None:
        matched = matched & mask
    return bidx, matched


# ---------------------------------------------------------------------------
# Perfect (dense-range positional) join — reference PerfectJoinHashTable
# ---------------------------------------------------------------------------


class PerfectBuild(NamedTuple):
    counts: object  # [R] int32 — rows per key slot
    offsets: object  # [R] int64 — CSR offsets into payload
    payload: object  # [B] int32 — build row ids grouped by key slot
    key_min: int


def build_perfect(keys, valid, num_rows_scalar, key_min: int, key_range: int):
    """CSR build over dense key space [key_min, key_min+key_range)."""
    b = keys.shape[0]
    in_domain = lax.broadcasted_iota(jnp.int32, (b,), 0) < num_rows_scalar
    ok = in_domain if valid is None else (in_domain & valid)
    slot = jnp.asarray(keys, jnp.int64) - key_min
    slot = jnp.where(ok & (slot >= 0) & (slot < key_range), slot, key_range)
    counts = jnp.zeros(key_range + 1, jnp.int32).at[slot].add(1, mode="drop")[
        :key_range
    ]
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), SC.cumsum(counts.astype(jnp.int64))[:-1]]
    )
    # place rows: sort by slot, payload = row ids in slot order
    rows = lax.broadcasted_iota(jnp.int32, (b,), 0)
    sslot, srows = lax.sort([slot, rows], num_keys=1, is_stable=True)
    return PerfectBuild(counts, offsets, srows, key_min)


def probe_perfect(build: PerfectBuild, probe_keys, probe_valid, key_range: int):
    pk = jnp.asarray(probe_keys, jnp.int64) - build.key_min
    ok = (pk >= 0) & (pk < key_range)
    if probe_valid is not None:
        ok = ok & probe_valid
    slot = jnp.clip(pk, 0, key_range - 1)
    lut = lut_gather(
        [build.offsets.astype(jnp.int32), build.counts],
        slot.astype(jnp.int32),
    )
    if lut is not None:
        lo, cnt_raw = lut
    else:
        lo = build.offsets[slot].astype(jnp.int32)
        cnt_raw = build.counts[slot]
    cnt = jnp.where(ok, cnt_raw, 0)
    return lo, cnt


def probe_perfect_unique(build: PerfectBuild, probe_keys, probe_valid,
                         key_range: int, mask):
    """Perfect-hash probe for UNIQUE builds, fully composed: the build
    side precomputes slot → build_row (payload[offsets], a key_range-size
    gather — trivial), so the per-probe-row fetch is ONE lut/gather of
    [build_row, count] instead of probe_perfect's [offset, count] pass
    followed by probe_unique's second payload pass.  Halves the dominant
    per-row lookup cost of a PK-FK join (measured: each one-hot LUT pass
    is ~3.3ns/row at 20M rows; the old 14ns/row XLA gathers are why this
    runs as matmuls at all).  Returns (build_idx[n], cnt[n], matched[n])."""
    pk = jnp.asarray(probe_keys, jnp.int64) - build.key_min
    ok = (pk >= 0) & (pk < key_range)
    if probe_valid is not None:
        ok = ok & probe_valid
    slot = jnp.clip(pk, 0, key_range - 1)
    off_c = jnp.clip(build.offsets, 0, build.payload.shape[0] - 1)
    direct = build.payload[off_c.astype(jnp.int32)]  # [R] slot → build row
    lut = lut_gather([direct, build.counts], slot.astype(jnp.int32))
    if lut is not None:
        bidx, cnt_raw = lut
    else:
        bidx = direct[slot]
        cnt_raw = build.counts[slot]
    cnt = jnp.where(ok, cnt_raw, 0)
    matched = cnt > 0
    if mask is not None:
        matched = matched & mask
    return bidx, cnt, matched
