"""Group-by kernels — the TPU-native equivalent of the reference's
GroupByAndAggregate (QueryEngine/GroupByAndAggregate.cpp) and its two hash
schemes (QueryEngine/enums.h:52):

- **Perfect hash** (GroupByPerfectHash): dense key space → group id is a
  positional index computed arithmetically from per-key ranges (reference
  get_group_value_fast / codegenPerfectHashFunction).  On TPU this is a pure
  vector op + scatter-adds — no hash table at all.
- **Sort-based grouping** (replacing GroupByBaselineHash): rows are sorted by
  key tuple with `lax.sort` (multi-operand lexicographic), group boundaries
  become change flags, and group ids are a prefix sum.  This replaces the
  reference's MurmurHash open-addressing table (GroupByRuntime.cpp:
  get_group_value) because TPUs have no global atomics — a sort + segmented
  reduce is the device-native strategy, fully static-shaped.  Capacity
  overflow returns the exact needed count so the executor's retry ladder
  (reference ERR_OUT_OF_SLOTS retry) converges in one extra attempt.

All functions here are shape-static and jit-traceable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from heavydb_tpu.ops import scan as SC

TV = Tuple[object, Optional[object]]


def _canonical_key(val, valid):
    """(null_flag, canonical_value) sort operands for one key column.
    Nulls form their own group; float keys are canonicalized so NaN payloads
    can't split groups."""
    if val.dtype.kind == "f":
        v = jnp.where(jnp.isnan(val), jnp.asarray(0, val.dtype), val)
        # canonicalize -0.0 == 0.0
        v = jnp.where(v == 0, jnp.asarray(0, val.dtype), v)
    else:
        v = val
    if valid is None:
        nullf = jnp.zeros(val.shape, jnp.int8)
    else:
        nullf = (~valid).astype(jnp.int8)
        v = jnp.where(valid, v, jnp.asarray(0, v.dtype))
    return nullf, v


def _minmax_scan(gid, mask, values, num_slots: int, is_min: bool, ident, dt):
    """Chunked [chunk, slots] masked min/max under lax.scan (mid-slot TPU
    path; scatter-min/max serializes like scatter-add)."""
    n = gid.shape[0]
    slots_p = ((max(num_slots, 128) + 127) // 128) * 128
    chunk = _onehot_chunk(slots_p)
    n_p = ((n + chunk - 1) // chunk) * chunk
    pad = n_p - n
    g = jnp.concatenate([gid, jnp.full(pad, -1, jnp.int32)]) if pad else gid
    m = jnp.concatenate([mask, jnp.zeros(pad, jnp.bool_)]) if pad else mask
    v = jnp.concatenate([values, jnp.full(pad, ident, dt)]) if pad else values
    nchunks = n_p // chunk
    gg = g.reshape(nchunks, chunk)
    mm = m.reshape(nchunks, chunk)
    vv = v.reshape(nchunks, chunk)
    iota = jnp.arange(slots_p, dtype=jnp.int32)
    red = (jnp.minimum if is_min else jnp.maximum)

    def body(acc, xs):
        gc, mc, vc = xs
        hit = (gc[:, None] == iota[None, :]) & mc[:, None]
        tile = jnp.where(hit, vc[:, None], jnp.asarray(ident, dt))
        r = tile.min(axis=0) if is_min else tile.max(axis=0)
        return red(acc, r), None

    init = jnp.full(slots_p, ident, dt)
    out, _ = jax.lax.scan(body, init, (gg, mm, vv))
    return out[:num_slots]


def perfect_group_ids(
    key_tvs: Sequence[TV],
    # (min, extent, has_nulls, bucket) per key — bucket > 1 for DATE_TRUNC
    # style keys whose distinct values are ≥ bucket apart (reference
    # ExpressionRange bucket / get_group_value_fast_with_original_key)
    ranges: Sequence[Tuple[int, int, bool, int]],
    mask,
):
    """Positional group id for dense key spaces.  Null (when has_nulls) maps
    to the extra slot `extent`.  Returns (gid[N] int32, total_slots)."""
    gid = None
    total = 1
    for (val, valid), (mn, extent, has_nulls, bucket) in zip(key_tvs, ranges):
        iv = jnp.asarray(val, jnp.int64) - mn
        if bucket > 1:
            iv = jnp.floor_divide(iv, bucket)
        iv = jnp.clip(iv, 0, extent - 1)
        span = extent + (1 if has_nulls else 0)
        if has_nulls and valid is not None:
            iv = jnp.where(valid, iv, extent)
        gid = iv if gid is None else gid * span + iv
        total *= span
    gid = gid.astype(jnp.int32)
    if mask is not None:
        gid = jnp.where(mask, gid, total)
    return gid, total


def sort_group_rows(key_tvs: Sequence[TV], mask, cap: int, payloads=(),
                    need_rows: bool = True):
    """Sort-based grouping that KEEPS the sorted row domain.  Extra row
    arrays (agg arguments, validity masks) ride the SAME sort as
    payloads: multi-operand lax.sort measures FLAT ~56-69ms at 20M rows
    on v5e while each 20M random gather/scatter costs 150-230ms — the
    round-1 sort tier's scatter-back and the per-arg gathers were the
    whole cost.

    Returns (sgid, s_rows, s_domain, changed, num_groups, sorted_keys,
    sorted_payloads):
      sgid[N] int32       — contiguous group id per SORTED row
      s_rows[N] int32     — original row index per sorted position
      s_domain[N] bool    — in-domain rows (sorted first)
      changed[N] bool     — first sorted row of each group
      num_groups          — device scalar, EXACT (valid even if > cap)
      sorted_keys         — per key (canonical_value, null_flag==0) TVs
      sorted_payloads     — the payload arrays, sorted
    """
    n = key_tvs[0][0].shape[0]
    # constant sort operands are pure cost (each adds ~20-40% to the
    # bitonic's payload movement at 20M rows): skip the domain flag when
    # every row is in-domain, per-key null flags for non-nullable keys,
    # and the row-index payload when the caller never gathers by it
    operands = []
    dom_idx = None
    if mask is not None:
        dom_idx = len(operands)
        operands.append((~mask).astype(jnp.int8))
    key_ops = []  # (null_idx or None, value_idx)
    for val, valid in key_tvs:
        nullf, v = _canonical_key(jnp.asarray(val), valid)
        ni = None
        if valid is not None:
            ni = len(operands)
            operands.append(nullf)
        vi = len(operands)
        operands.append(v)
        key_ops.append((ni, vi))
    num_keys = len(operands)
    pl = [jnp.asarray(p) for p in payloads]
    pl = [p.astype(jnp.int8) if p.dtype == jnp.bool_ else p for p in pl]
    rows_op = [lax.broadcasted_iota(jnp.int32, (n,), 0)] if need_rows \
        else []
    sorted_ops = lax.sort(
        operands + rows_op + pl, num_keys=num_keys, is_stable=True
    )
    s_domain = (sorted_ops[dom_idx] == 0) if dom_idx is not None \
        else jnp.ones(n, jnp.bool_)
    if need_rows:
        s_rows = sorted_ops[num_keys]
        sorted_pl = list(sorted_ops[num_keys + 1:])
    else:
        s_rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
        sorted_pl = list(sorted_ops[num_keys:])
    for i, p in enumerate(payloads):
        if jnp.asarray(p).dtype == jnp.bool_:
            sorted_pl[i] = sorted_pl[i] != 0
    changed = jnp.zeros(n, jnp.bool_).at[0].set(True)
    for opnd in sorted_ops[1 if dom_idx is not None else 0:num_keys]:
        diff = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), opnd[1:] != opnd[:-1]]
        )
        changed = changed | diff
    changed = changed & s_domain
    sgid = SC.cumsum(changed.astype(jnp.int32)) - 1
    num_groups = changed.sum().astype(jnp.int32)
    sgid = jnp.where(s_domain, jnp.minimum(sgid, cap), cap)
    sorted_keys = []
    for ni, vi in key_ops:
        v = sorted_ops[vi]
        valid_s = (sorted_ops[ni] == 0) if ni is not None \
            else jnp.ones(n, jnp.bool_)
        sorted_keys.append((v, valid_s))
    return (sgid, s_rows, s_domain, changed, num_groups, sorted_keys,
            sorted_pl)


class _Deferred:
    """Placeholder for a per-group array that materializes after the
    shared compaction sort (SortedSegments.flush)."""

    def __init__(self, idx: int, post):
        self.idx = idx
        self.post = post


class SortedSegments:
    """Sorted-domain drop-in for the ops.groupby segment_* functions
    (ops.agg.LoweredAgg.accumulate's `segs` hook).  gid arguments are the
    contiguous SORTED sgid; values/masks arrive in sorted order (the
    kernel seeds its compiler with sort-payload results).

    Sums/counts become prefix sums whose value at each group's FIRST row
    is deferred; min/max become reverse segmented scans (group total at
    the first row).  ONE stable compaction sort (boundary rows first,
    group order preserved) then materializes every deferred array at
    [cap]; totals are adjacent diffs in the compacted domain.  No
    per-slot scatters, no random gathers."""

    def __init__(self, changed, s_domain, num_groups, cap: int):
        self.changed = changed
        self.s_domain = s_domain
        self.num_groups = num_groups
        self.cap = cap
        self._pending = []   # sorted-domain arrays, valid at start rows

    # -- deferral plumbing --
    def defer(self, start_vals, post=None):
        self._pending.append(jnp.asarray(start_vals))
        return _Deferred(len(self._pending) - 1, post)

    def flush(self):
        """One stable sort compacts every pending start-row array."""
        if not self._pending:
            self._compacted = []
            return
        key = (~self.changed).astype(jnp.int8)  # boundary rows first
        pl = [p.astype(jnp.int8) if p.dtype == jnp.bool_ else p
              for p in self._pending]
        out = lax.sort([key] + pl, num_keys=1, is_stable=True)
        comp = []
        for o, p in zip(out[1:], self._pending):
            c = o[: self.cap]
            if c.shape[0] < self.cap:
                # row domain shorter than the slot cap (a small
                # intermediate feeding a pow2-capped aggregation):
                # entries past num_groups are garbage anyway — zero-pad
                c = jnp.concatenate([
                    c, jnp.zeros(self.cap - c.shape[0], c.dtype)
                ])
            if p.dtype == jnp.bool_:
                c = c != 0
            comp.append(c)
        self._compacted = comp

    def resolve(self, obj):
        if isinstance(obj, _Deferred):
            c = self._compacted[obj.idx]
            return obj.post(c) if obj.post is not None else c
        return obj

    # -- helpers --
    def _prefix_total(self, c):
        """Defer a prefix sum: compacted entry g = prefix BEFORE group g;
        per-group total = next entry − mine (last group closes against
        the grand total)."""
        cprev = jnp.concatenate([jnp.zeros(1, c.dtype), c[:-1]])
        total = c[-1]
        ng = self.num_groups

        def post(cp):
            gi = lax.broadcasted_iota(jnp.int32, (self.cap,), 0)
            nxt = jnp.where(
                gi + 1 < ng,
                jnp.concatenate([cp[1:], jnp.zeros(1, cp.dtype)]),
                total,
            )
            return nxt - cp

        return self.defer(cprev, post)

    # -- the segment_* surface --
    def segment_count(self, gid, contrib_mask, num_slots: int):
        cm = contrib_mask if contrib_mask is not None \
            else jnp.ones(gid.shape[0], jnp.bool_)
        cm = cm & self.s_domain
        c = SC.cumsum(cm.astype(jnp.int32))
        d = self._prefix_total(c)
        d.post = (lambda f: (lambda cp: f(cp).astype(jnp.int64)))(d.post)
        return d

    def segment_sum(self, gid, values, contrib_mask, num_slots: int,
                    acc_dtype):
        acc_dtype = np.dtype(acc_dtype)
        v = jnp.asarray(values)
        # f32 accumulators upgrade to f64 prefix sums: a diff of two
        # 20M-row f32 prefixes carries O(eps·prefix) error, comparable to
        # whole elements for small groups
        cum_dt = np.dtype(np.float64) if acc_dtype.kind == "f" \
            else acc_dtype
        cm = contrib_mask if contrib_mask is not None \
            else jnp.ones(gid.shape[0], jnp.bool_)
        cm = cm & self.s_domain
        v = jnp.where(cm, v.astype(cum_dt), jnp.asarray(0, cum_dt))
        c = SC.cumsum(v)
        d = self._prefix_total(c)
        if np.dtype(cum_dt) != acc_dtype:
            d.post = (lambda f: (lambda cp: f(cp).astype(acc_dtype)))(
                d.post)
        return d

    def segment_minmax(self, gid, values, contrib_mask, num_slots: int,
                       is_min: bool):
        from heavydb_tpu.ops.window import _seg_running_op

        dt = values.dtype
        if dt.kind == "f":
            ident = jnp.asarray(np.inf if is_min else -np.inf, dt)
        else:
            info = np.iinfo(dt.name)
            ident = jnp.asarray(info.max if is_min else info.min, dt)
        v = values
        cm = contrib_mask if contrib_mask is not None else None
        cm = (cm & self.s_domain) if cm is not None else self.s_domain
        v = jnp.where(cm, v, ident)
        op = jnp.minimum if is_min else jnp.maximum
        # REVERSE segmented scan (reset at group ends): value at each
        # group's FIRST row = reduction over the whole group
        ends = jnp.concatenate(
            [self.changed[1:], jnp.ones(1, jnp.bool_)]
        )
        run = _seg_running_op(v[::-1], ends[::-1], op)[::-1]
        return self.defer(run)

    # non-decomposable kinds keep their generic formulations — the
    # contiguous sorted sgid is a valid gid for them
    def distinct_count_per_group(self, gid, val_tv, mask, num_slots,
                                 allow_hash=True):
        m = mask if mask is not None else self.s_domain
        return distinct_count_per_group(
            gid, val_tv, m & self.s_domain, num_slots,
            allow_hash=allow_hash,
        )

    def distinct_sum_per_group(self, gid, val_tv, mask, num_slots, acc_dt):
        m = mask if mask is not None else self.s_domain
        return distinct_sum_per_group(
            gid, val_tv, m & self.s_domain, num_slots, acc_dt
        )

    def hll_registers(self, gid, val_tv, mask, num_slots):
        m = mask if mask is not None else self.s_domain
        return hll_registers(gid, val_tv, m & self.s_domain, num_slots)

    def quantile_per_group(self, gid, val_tv, mask, num_slots, q):
        m = mask if mask is not None else self.s_domain
        return quantile_per_group(
            gid, val_tv, m & self.s_domain, num_slots, q
        )

    def mode_per_group(self, gid, val_tv, mask, num_slots):
        m = mask if mask is not None else self.s_domain
        return mode_per_group(gid, val_tv, m & self.s_domain, num_slots)


def pack_group_keys(key_tvs: Sequence[TV], spec):
    """Fold a key tuple into ONE int64 for hash grouping.

    spec None → single key, identity packing (nulls ride in-band; floats
    are canonicalized-NaN bitcast so equal keys have equal bits).
    spec = ((lo, span), ...) → range packing with a reserved 0 for NULL
    per key (requires the product of (span+2) to fit 63 bits — checked by
    the planner)."""
    if spec is None:
        val, valid = key_tvs[0]
        v = jnp.asarray(val)
        if v.dtype.kind == "f":
            # canonical NaN = the NULL group (floats' in-band sentinel);
            # unpacking bitcasts back so the representation roundtrips
            isnull = jnp.isnan(v)
            if valid is not None:
                isnull = isnull | ~valid
            canon = jnp.where(isnull, jnp.asarray(jnp.nan, v.dtype), v)
            canon = jnp.where(canon == 0, jnp.asarray(0, v.dtype), canon)
            if v.dtype == jnp.float64:
                from heavydb_tpu.ops.f64bits import f64_to_bits

                # bitcast-free exact bits (some TPU compile services
                # reject f64 bitcasts; ops/f64bits header)
                p = f64_to_bits(canon)
            else:
                p = lax.bitcast_convert_type(
                    canon.astype(jnp.float32), jnp.int32
                ).astype(jnp.int64)
        else:
            p = jnp.asarray(v, jnp.int64)
            if valid is not None:
                # the VALUE dtype's sentinel, so narrowing on unpack
                # recovers it
                p = jnp.where(
                    valid, p, jnp.int64(int(np.iinfo(v.dtype).min))
                )
        return p
    packed = None
    for (val, valid), (lo, span) in zip(key_tvs, spec):
        iv = jnp.asarray(val, jnp.int64) - jnp.int64(lo) + 1
        iv = jnp.clip(iv, 1, span + 1)
        if valid is not None:
            iv = jnp.where(valid, iv, jnp.int64(0))
        packed = iv if packed is None else packed * jnp.int64(span + 2) + iv
    return packed


def hash_group_ids(packed, mask, slots: int, rounds: int = 4):
    """Hash grouping for SPARSE key spaces — the TPU restatement of the
    reference BaselineHash open-addressing table (BaselineJoinHashTable /
    GroupByBaselineHash): no atomics, so each round every unresolved row
    scatter-mins its KEY into its hashed slot and rows whose key owns the
    slot are resolved; distinct keys that collided re-hash next round.
    All rows of one key follow the same probe sequence, so a key resolves
    exactly once.  Collisions are rare at ≤50% fill → the scatters stay
    near-unique (the colliding-scatter serialization pathology needs
    heavy collision).

    All claim scatters are 32-bit (int64 scatter-min is emulated on TPU and
    measured ~25x slower): each round writes min AND max of the key's hi/lo
    halves; a slot is cleanly claimed iff min==max for both halves (exactly
    one distinct key hashed there) — contested slots resolve nobody that
    round and their keys re-hash.

    Returns (gid[N] int32 in [0, rounds*slots] — rounds*slots for masked/
    unresolved rows, total_slots, unresolved count (device scalar) for the
    retry ladder, slot_keys[total] int64 — the packed key per claimed
    slot, for direct key materialization)."""
    n = packed.shape[0]
    total = (rounds + 2) * slots  # + the two winner-claim cleanup rounds
    in_domain = mask if mask is not None else jnp.ones(n, jnp.bool_)
    unresolved = in_domain
    gid = jnp.full(n, total, jnp.int32)
    lo32 = (packed & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    hi32 = lax.shift_right_logical(
        packed, jnp.int64(32)
    ).astype(jnp.uint32)
    umax = jnp.uint32(0xFFFFFFFF)
    key_tables = []
    for r in range(rounds):
        # 32-bit murmur-style mix (64-bit multiplies are emulated on TPU)
        h = lo32 * jnp.uint32(0x85EBCA6B) + hi32 * jnp.uint32(
            0xC2B2AE35
        ) + jnp.uint32(0x9E3779B9 * (r + 1) & 0xFFFFFFFF)
        h = h ^ (h >> jnp.uint32(16))
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> jnp.uint32(15))
        slot = (h & jnp.uint32(slots - 1)).astype(jnp.int32)
        idx = jnp.where(unresolved, slot, slots)
        # dump-slot writes use CONSTANT values: identical-value scatter
        # collisions don't serialize, varying ones do
        vlo = jnp.where(unresolved, lo32, umax)
        vhi = jnp.where(unresolved, hi32, umax)
        lo_mn = jnp.full(slots + 1, umax, jnp.uint32).at[idx].min(vlo)
        lo_mx = jnp.zeros(slots + 1, jnp.uint32).at[idx].max(
            jnp.where(unresolved, lo32, jnp.uint32(0))
        )
        hi_mn = jnp.full(slots + 1, umax, jnp.uint32).at[idx].min(vhi)
        hi_mx = jnp.zeros(slots + 1, jnp.uint32).at[idx].max(
            jnp.where(unresolved, hi32, jnp.uint32(0))
        )
        clean = (lo_mn == lo_mx) & (hi_mn == hi_mx)
        sc = jnp.clip(slot, 0, slots)
        owner = clean[sc] & (lo_mn[sc] == lo32) & (hi_mn[sc] == hi32)
        won = unresolved & owner
        gid = jnp.where(won, r * slots + slot, gid)
        unresolved = unresolved & ~owner
        key_tables.append(
            lax.shift_left(hi_mn[:slots].astype(jnp.int64), jnp.int64(32))
            | lo_mn[:slots].astype(jnp.int64)
        )
    # contested-slot semantics leaves a geometric tail (a key stays
    # unresolved only if EVERY round's slot was contested) — two final
    # winner-takes-slot rounds with an int64 min-claim clear it; by now the
    # residue is tiny, so the emulated 64-bit scatter touches few real
    # slots (dump writes are constant-valued and cheap)
    big = jnp.int64(np.iinfo(np.int64).max)
    for r in range(rounds, rounds + 2):
        h = lo32 * jnp.uint32(0x85EBCA6B) + hi32 * jnp.uint32(
            0xC2B2AE35
        ) + jnp.uint32(0x9E3779B9 * (r + 1) & 0xFFFFFFFF)
        h = h ^ (h >> jnp.uint32(16))
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> jnp.uint32(15))
        slot = (h & jnp.uint32(slots - 1)).astype(jnp.int32)
        idx = jnp.where(unresolved, slot, slots)
        val = jnp.where(unresolved, packed, big)
        buf = jnp.full(slots + 1, big, jnp.int64).at[idx].min(val)
        owner = buf[jnp.clip(slot, 0, slots)] == packed
        won = unresolved & owner
        gid = jnp.where(won, r * slots + slot, gid)
        unresolved = unresolved & ~owner
        key_tables.append(buf[:slots])
    slot_keys = jnp.concatenate(key_tables)
    return gid, total, unresolved.sum(dtype=jnp.int32), slot_keys


# Scatter with massively-colliding indices serializes on TPU (XLA lowers
# conflicting scatter-adds to sequential updates) — 100M rows into 2 slots
# took 33.8s; 20M rows into 1k slots took 1.28s.  Strategy by slot count
# (the TPU analogue of the reference's shared-memory vs global-memory
# aggregation split, GpuSharedMemoryUtils):
#   slots == 1             → plain masked reductions (VPU, one pass)
#   slots ≤ SMALL_SLOTS    → per-slot masked reductions (fused cheap passes)
#   slots ≤ PALLAS_MAX     → Pallas VMEM one-hot MXU kernel (TPU only)
#   otherwise              → scatter (collisions rare at high cardinality)
# per-slot masked reductions: each slot is one fused pass over the data —
# XLA compiles these in seconds and runs them memory-bound, while the
# exact-int one-hot scan kernels compile in MINUTES for f64/limb
# accumulators (876s measured for a 6-agg 10-slot query); 32 masked
# passes are still cheaper than that at 20M rows
SMALL_SLOTS = 32


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_PALLAS_OK: dict = {}
_PALLAS_LOCK = None


def warm_pallas_probe_async():
    """Run the Pallas availability probe on a background thread — the
    probe costs ~1.5s (pallas import + a tiny Mosaic compile) and
    otherwise lands inside the FIRST query's trace (measured: 1.54s of
    a 1.70s first-query wall).  connect() calls this on TPU backends so
    the probe overlaps table loading."""
    import threading

    t = threading.Thread(
        target=lambda: (_pallas_available(), _pallas_available(f64=True)),
        daemon=True,
    )
    t.start()
    return t


def _pallas_available(f64: bool = False) -> bool:
    """Probe once (per flavor) whether representative Pallas kernels compile
    AND run on this backend — some remote-compile toolchains have Mosaic
    version skew that rejects gridded kernels at runtime ('failed to
    legalize func.return'), and f64 use can fail at client lowering.
    Single-flight: concurrent callers (the async warmup + a first query)
    serialize on a lock."""
    global _PALLAS_LOCK
    key = "f64" if f64 else "f32"
    if key in _PALLAS_OK:
        return _PALLAS_OK[key]
    if _PALLAS_LOCK is None:
        import threading

        _PALLAS_LOCK = threading.Lock()
    with _PALLAS_LOCK:
        return _pallas_probe_locked(key, f64)


def _pallas_probe_locked(key: str, f64: bool) -> bool:
    if key in _PALLAS_OK:
        return _PALLAS_OK[key]
    import os

    # kill switch (round 1's failures were our own i64 index maps under
    # jax_enable_x64, not toolchain skew — fixed in kernels/groupby_pallas;
    # the probe still guards genuinely broken Mosaic toolchains)
    if os.environ.get("HEAVYDB_TPU_DISABLE_PALLAS"):
        _PALLAS_OK[key] = False
        return False
    if not _on_tpu():
        _PALLAS_OK[key] = False
        return False
    try:
        from jax.experimental import pallas as pl

        def k(i_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            v = i_ref[...]
            if f64:
                o_ref[...] += (v * 2.0).astype(jnp.float64)
            else:
                o_ref[...] += v * 2.0

        def im_row(i):
            return (jnp.int32(i), jnp.int32(0))

        def im_acc(i):
            return (jnp.int32(0), jnp.int32(0))

        x = np.zeros((16, 128), np.float32)
        out_dt = jnp.float64 if f64 else jnp.float32
        # explicit lower+compile+run: a plain jit call from INSIDE an outer
        # trace would be inlined and its Mosaic failure deferred to the
        # outer compile — the probe would falsely pass.  The compiled
        # executable runs eagerly regardless of trace context.
        compiled = jax.jit(
            lambda a: pl.pallas_call(
                k,
                grid=(2,),
                in_specs=[pl.BlockSpec((8, 128), im_row)],
                out_specs=pl.BlockSpec((8, 128), im_acc),
                out_shape=jax.ShapeDtypeStruct((8, 128), out_dt),
            )(a)
        ).lower(x).compile()
        jax.block_until_ready(compiled(x))
        _PALLAS_OK[key] = True
    except Exception:
        _PALLAS_OK[key] = False
    return _PALLAS_OK[key]


def _pallas_eligible(num_slots: int, f64: bool = False) -> bool:
    from heavydb_tpu.kernels.groupby_pallas import PALLAS_MAX_SLOTS

    return (
        SMALL_SLOTS < num_slots <= PALLAS_MAX_SLOTS and _pallas_available(f64)
    )


def shared_scan_bound() -> int:
    """Max slot count for the fused shared-scan path (accumulate_all):
    with the Pallas hist kernel live, count/sum-style streams stay fused
    to 64k slots regardless of exact-int limbs."""
    from heavydb_tpu.kernels import radix_hist

    if _pallas_available():
        return radix_hist.MAX_SLOTS
    return RADIX_F32_MAX_SLOTS


def _shared_scan(gid, mask, value_list, num_slots: int, exact_accs=(),
                 bf16_ok=()):
    """Dispatch one fused multi-stream histogram pass:
      slots <= 256  -> lane-parallel VPU kernel (kernels/lane_agg)
      slots <= 64k  -> radix-factorized MXU kernel (kernels/radix_hist)
      otherwise / no TPU -> the jitted XLA one-hot scan.
    Identical return contract to _onehot_scan."""
    if _pallas_available():
        from heavydb_tpu.kernels import lane_agg, radix_hist

        flags = list(exact_accs) + [False] * (
            len(value_list) - len(exact_accs))
        if num_slots <= lane_agg.MAX_SLOTS:
            g = jnp.asarray(gid, jnp.int32)
            streams = []
            for i, v in enumerate(value_list):
                op = "sumi" if flags[i] in ("count", True) and (
                    flags[i] == "count" or (len(bf16_ok) > i and bf16_ok[i])
                ) else "sumf"
                streams.append((jnp.asarray(v, jnp.float32), op, 0))
            out = lane_agg.lane_agg(g, mask, streams, num_slots)
            res = [out[0].astype(jnp.int32)]
            for i, r in enumerate(out[1:]):
                f = flags[i]
                if f == "count":
                    res.append(r)                       # int64
                elif f is True and len(bf16_ok) > i and bf16_ok[i]:
                    res.append(r.astype(jnp.float64))   # limb, exact
                elif f is True:
                    res.append(r)                       # already float64
                else:
                    res.append(r.astype(jnp.float32))
            return res
        if num_slots <= radix_hist.MAX_SLOTS:
            return radix_hist.fused_hist(
                gid, mask, value_list, num_slots,
                exact_accs=exact_accs, bf16_ok=bf16_ok,
            )
    return _onehot_scan(gid, mask, value_list, num_slots,
                        exact_accs=exact_accs, bf16_ok=bf16_ok)


# MIN/MAX keep the chunked masked-tile scan (no matmul formulation):
ONEHOT_MAX_SLOTS = 4096
ONEHOT_TILED_MAX_SLOTS = ONEHOT_MAX_SLOTS
# Radix-factorized one-hot bounds — round-2 measured (carry-chained
# while_loop protocol, 20M rows, COUNT+SUM, /tmp/radix_shootout.py):
#   radix f32:  44ms @1k, 52ms @16k, 79ms @64k, 170ms @262k
#   radix limb: 76ms @1k, 80ms @4k, 220ms @16k, 347ms @64k
#   scatter:    266-350ms (slot-independent); sort @10M slots 629ms
# → f32/count streams win ≤ 2^18; exact-int limb streams win ≤ 2^14;
#   the colliding scatter takes over above.
RADIX_F32_MAX_SLOTS = 1 << 18
RADIX_INT_MAX_SLOTS = 1 << 14


def _onehot_chunk(slots_p: int) -> int:
    c = (1 << 23) // (4 * slots_p)  # ≤ 8MB intermediate
    return int(max(512, min(8192, (c // 512) * 512 if c >= 512 else 512)))


def _radix_factors(num_slots: int, lhs_bytes_per_a: int = 8):
    """(A, B) with A·B ≥ num_slots: slot = hi·B + lo.

    Per-row traffic is lhs_bytes_per_a·A + B bytes (lhs carries the
    value-folded hi factors, rhs the 1-byte lo one-hot), so the split
    balances BYTES, not lanes: B* = sqrt(num_slots·lhs_bytes_per_a),
    rounded to a lane multiple."""
    b_star = max(128.0, (num_slots * max(lhs_bytes_per_a, 1)) ** 0.5)
    B = min(2048, max(128, int(round(b_star / 128)) * 128))
    return -(-num_slots // B), B


# K-chunk bound for exact int8→int32 dots: |Σ| ≤ 2^23·128 = 2^30 < 2^31
_RADIX_KCHUNK = 1 << 23


def _onehot_scan(gid, mask, value_list, num_slots: int, exact_accs=(),
                 bf16_ok=()):
    """Returns [counts i32, sums... per value] each [num_slots].

    Radix-FACTORIZED one-hot (TPU-native histogram): split slot = hi·B+lo
    and contract over ROWS —

        hist[hi, lo] = Σ_r  oh_hi[r, hi] · oh_lo[r, lo]  =  oh_hiᵀ @ oh_lo

    The direct one-hot materializes n×slots entries (40GB at 20M rows ×
    1k slots — measured 47-306ms); the factored form touches only
    n×(A+B) entries (~2.6GB) and turns the histogram into a dense GEMM
    with a huge contraction dim — exactly what the MXU wants.  Weighted
    sums fold the value into the hi factor: Σ v_r·oh_hi·oh_lo.

    Exactness: counts and exact_accs (8-bit limb) streams use int8×int8
    →int32 MXU dots, K-chunked so per-chunk totals stay < 2^31, summed
    across chunks in int64 (limb values are biased by −128 to fit int8;
    the bias is undone with the exact counts).  Other streams use f32
    dots — non-matching rows contribute exact 0s, so per-slot rounding
    matches a direct f32 accumulation.  bf16_ok is accepted for
    signature compatibility and ignored (int8 subsumes it)."""
    n = gid.shape[0]
    flags = list(exact_accs) + [False] * (len(value_list) - len(exact_accs))
    bfok = list(bf16_ok) + [False] * (len(value_list) - len(bf16_ok))
    # four stream classes:
    #   e: exact small ints (≤255 limbs) → int8 MXU dot, i64 acc
    #   c: exact 0/1 masks (count-style) → f32 dot (per-chunk sums ≤
    #      kchunk < 2^24 stay exact), i64 cross-chunk acc
    #   d: f32 values needing an f64 accumulator → f32 dot, f64 acc
    #   f: plain f32                              → f32 dot, f32 acc
    e_idx = [i for i in range(len(value_list))
             if flags[i] is True and bfok[i]]
    c_idx = [i for i in range(len(value_list)) if flags[i] == "count"]
    d_idx = [i for i in range(len(value_list))
             if flags[i] is True and not bfok[i]]
    f_idx = [i for i in range(len(value_list)) if not flags[i]]
    fd_idx = c_idx + d_idx + f_idx
    # when no int8 streams exist, counts ride the f32 dot (per-chunk
    # counts ≤ kchunk < 2^24 stay exact in f32; cross-chunk accumulation
    # is i64) and the int8 pass is skipped entirely
    int_pass = bool(e_idx) or not fd_idx
    n_int = (1 + len(e_idx)) if int_pass else 0
    n_f = (len(fd_idx) + (0 if int_pass else 1)) if fd_idx else 0
    A, B = _radix_factors(num_slots, n_int + 4 * n_f)

    g = jnp.asarray(gid, jnp.int32)
    m = mask if mask is not None else jnp.ones(n, jnp.bool_)

    # row-chunked scan: the factor matrices exist only per chunk (whole-
    # array factors are n×(A·streams+B) bytes — OOM at high slot counts),
    # bounded by ~2GB of chunk temporaries; kchunk ≤ 2^23 also keeps
    # int8→int32 dots exact (|Σ| ≤ 2^23·128 = 2^30)
    per_row = n_int * A + B + 4 * n_f * A
    # d-streams accumulate f32 INSIDE a chunk's dot: cap the chunk so
    # per-slot intra-chunk term counts stay small and the f64 cross-chunk
    # accumulation dominates the rounding story
    kcap = (1 << 19) if d_idx else _RADIX_KCHUNK
    kchunk = min(kcap, (1 << 31) // max(per_row, 1))
    kchunk = max(512, min(kchunk, max(n, 1)))
    kchunk = ((kchunk + 511) // 512) * 512
    c_count = max(1, -(-n // kchunk))
    pad = c_count * kchunk - n

    def padded(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    gg = padded(g, -1).reshape(c_count, kchunk)
    mm = padded(m, False).reshape(c_count, kchunk)
    vv = [
        padded(jnp.asarray(value_list[i], jnp.float32), 0).reshape(
            c_count, kchunk
        )
        for i in range(len(value_list))
    ]
    iota_a = jnp.arange(A, dtype=jnp.int32)
    iota_b = jnp.arange(B, dtype=jnp.int32)
    dims = (((0,), (0,)), ((), ()))  # contract over rows

    def body(accs, xs):
        gc, mc = xs[0], xs[1]
        vc = xs[2:]
        hi = gc // B  # out-of-range/negative gid → no match → contributes 0
        lo = gc % B
        ih = (hi[:, None] == iota_a[None, :])  # (kchunk, A) bool
        il = ((lo[:, None] == iota_b[None, :]) & mc[:, None]).astype(jnp.int8)
        acc_i, acc_c, acc_d, acc_f = accs
        if int_pass:
            int_lhs = [ih.astype(jnp.int8)]
            for i in e_idx:
                lv = (vc[i].astype(jnp.int32) - 128).astype(jnp.int8)
                int_lhs.append(int_lhs[0] * lv[:, None])
            out_i = lax.dot_general(
                jnp.concatenate(int_lhs, axis=1), il,
                dims, preferred_element_type=jnp.int32,
            )
            acc_i = acc_i + out_i.astype(jnp.int64)
        if fd_idx:
            ihf = ih.astype(jnp.float32)
            f_lhs = [] if int_pass else [ihf]  # fold counts as a 1s stream
            for i in fd_idx:
                # sanitize BEFORE the product: masked rows may hold NaN
                # sentinels and NaN·0 would poison the slot
                f_lhs.append(ihf * jnp.where(mc, vc[i], 0.0)[:, None])
            # mixed f32×int8 dot: the one-hot rhs stays 1 byte/lane (a
            # f32 rhs copy would quadruple the dominant traffic term)
            out_f = lax.dot_general(
                jnp.concatenate(f_lhs, axis=1), il,
                dims, preferred_element_type=jnp.float32,
            )
            if not int_pass:
                # counts: exact per-chunk in f32, accumulate in i64
                acc_i = acc_i + out_f[:A].astype(jnp.int64)
                out_f = out_f[A:]
            if c_idx:
                acc_c = acc_c + out_f[:len(c_idx) * A].astype(jnp.int64)
                out_f = out_f[len(c_idx) * A:]
            if d_idx:
                acc_d = acc_d + out_f[:len(d_idx) * A].astype(jnp.float64)
                out_f = out_f[len(d_idx) * A:]
            if f_idx:
                acc_f = acc_f + out_f
        return (acc_i, acc_c, acc_d, acc_f), None

    init = (
        jnp.zeros((max(n_int, 1) * A, B), jnp.int64),
        jnp.zeros((max(len(c_idx), 1) * A, B), jnp.int64),
        jnp.zeros((max(len(d_idx), 1) * A, B), jnp.float64),
        jnp.zeros((max(len(f_idx), 1) * A, B), jnp.float32),
    )
    (acc_i, acc_c, acc_d, acc_f), _ = jax.lax.scan(body, init, (gg, mm, *vv))

    counts64 = acc_i[:A].reshape(A * B)[:num_slots]
    res = [counts64.astype(jnp.int32)]
    e_j = 1
    c_j = d_j = f_j = 0
    for i in range(len(value_list)):
        if flags[i] is True and bfok[i]:
            limb = acc_i[A * e_j:A * (e_j + 1)].reshape(A * B)[:num_slots]
            # undo the −128 bias; exact in f64 (values ≤ n·255 < 2^53)
            res.append((limb + 128 * counts64).astype(jnp.float64))
            e_j += 1
        elif flags[i] == "count":
            res.append(acc_c[A * c_j:A * (c_j + 1)].reshape(A * B)[:num_slots])
            c_j += 1
        elif flags[i]:
            res.append(acc_d[A * d_j:A * (d_j + 1)].reshape(A * B)[:num_slots])
            d_j += 1
        else:
            res.append(acc_f[A * f_j:A * (f_j + 1)].reshape(A * B)[:num_slots])
            f_j += 1
    return res


def _limb_count(value_dtype) -> int:
    """Limbs needed for an exact integer one-hot sum of this arg dtype:
    4 for args ≤32-bit (2^31-biased int64 math), 8 for BIGINT (uint64
    bit-flip bias; mod-2^64 arithmetic keeps reconstruction exact whenever
    the true per-group sum fits in int64 — wider is a SQL overflow anyway,
    matching the reference's overflow contract)."""
    return 8 if np.dtype(value_dtype).itemsize > 4 else 4


def _biased_limbs(v0, nl: int):
    """8-bit limb streams (f32, each in [0,255]) of a biased encoding of an
    integer column.  Per-chunk one-hot dots of a limb are ≤ chunk·255 and
    stay exact in f32; f64 accumulation is exact to 2^53."""
    if nl == 4:
        u = (jnp.asarray(v0, jnp.int64) + (np.int64(1) << 31)).astype(jnp.uint32)
        return [
            ((u >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
            for k in range(4)
        ]
    # BIGINT: biased-by-2^63 two's-complement == flip the sign bit
    from heavydb_tpu.ops.f64bits import i64_to_u64

    u = i64_to_u64(v0) ^ (jnp.uint64(1) << jnp.uint64(63))
    return [
        ((u >> jnp.uint64(8 * k)) & jnp.uint64(0xFF)).astype(jnp.float32)
        for k in range(nl)
    ]


def _limb_reconstruct(limb_sums, counts_i64, nl: int, acc_dtype):
    """Per-slot Σ value from per-slot limb sums + contributing-row counts
    (undoes the per-row bias).  limb_sums arrive as exactly-integral f64."""
    if nl == 4:
        total = jnp.zeros(counts_i64.shape, jnp.int64)
        for k in range(nl):
            total = total + (limb_sums[k].astype(jnp.int64) << (8 * k))
        return (total - counts_i64 * (np.int64(1) << 31)).astype(acc_dtype)
    total = jnp.zeros(counts_i64.shape, jnp.uint64)
    for k in range(nl):
        total = total + (limb_sums[k].astype(jnp.uint64) << jnp.uint64(8 * k))
    total = total - counts_i64.astype(jnp.uint64) * (
        jnp.uint64(1) << jnp.uint64(63)
    )
    from heavydb_tpu.ops.f64bits import u64_to_i64

    return u64_to_i64(total).astype(acc_dtype)


def segment_count(gid, contrib_mask, num_slots: int):
    # accumulate in i32 (i64 is emulated on TPU), widen at the end; per-chip
    # row counts stay under 2^31
    n = gid.shape[0]
    cm = contrib_mask if contrib_mask is not None else jnp.ones(n, jnp.bool_)
    if num_slots == 1:
        return cm.sum(dtype=jnp.int32).astype(jnp.int64)[None]
    if num_slots <= SMALL_SLOTS:
        slot_ids = jnp.arange(num_slots, dtype=gid.dtype)
        eq = (gid[None, :] == slot_ids[:, None]) & cm[None, :]
        return eq.sum(axis=1, dtype=jnp.int32).astype(jnp.int64)
    if _on_tpu() and num_slots <= max(shared_scan_bound(),
                                      RADIX_F32_MAX_SLOTS):
        return _shared_scan(gid, cm, [], num_slots)[0].astype(jnp.int64)
    seg = jnp.where(cm, gid, num_slots)
    return jnp.zeros(num_slots + 1, jnp.int32).at[seg].add(
        1, mode="drop"
    )[:num_slots].astype(jnp.int64)


def segment_sum(gid, values, contrib_mask, num_slots: int, acc_dtype):
    acc_dtype = np.dtype(acc_dtype)
    v0 = jnp.asarray(values)
    v = v0.astype(acc_dtype)
    if contrib_mask is not None:
        v = jnp.where(contrib_mask, v, jnp.asarray(0, acc_dtype))
    if num_slots == 1:
        return v.sum()[None]
    if num_slots <= SMALL_SLOTS:
        slot_ids = jnp.arange(num_slots, dtype=gid.dtype)
        vv = jnp.where(gid[None, :] == slot_ids[:, None], v[None, :],
                       jnp.asarray(0, acc_dtype))
        return vv.sum(axis=1)
    n = gid.shape[0]
    cm = contrib_mask if contrib_mask is not None else jnp.ones(n, jnp.bool_)
    g32 = gid.astype(jnp.int32)
    if _on_tpu():
        bound = shared_scan_bound()
        if acc_dtype.kind == "f" and acc_dtype.itemsize == 4 \
                and num_slots <= max(bound, RADIX_F32_MAX_SLOTS):
            s = _shared_scan(g32, cm, [v0], num_slots)[1]
            return s.astype(acc_dtype)
        if acc_dtype.kind == "i" and np.dtype(v0.dtype).kind in "iub" \
                and num_slots <= max(bound, RADIX_INT_MAX_SLOTS):
            # EXACT int sums: 8-bit limbs of the biased value (4 limbs for
            # ≤32-bit args, 8 for BIGINT)
            nl = _limb_count(v0.dtype)
            limbs = _biased_limbs(v0, nl)
            res = _shared_scan(g32, cm, limbs, num_slots,
                               exact_accs=(True,) * nl,
                               bf16_ok=(True,) * nl)
            cnt = res[0].astype(jnp.int64)
            return _limb_reconstruct(res[1:], cnt, nl, acc_dtype)
    return jnp.zeros(num_slots + 1, acc_dtype).at[jnp.minimum(gid, num_slots)].add(
        v, mode="drop"
    )[:num_slots]


def segment_minmax(gid, values, contrib_mask, num_slots: int, is_min: bool):
    dt = values.dtype
    if dt.kind == "f":
        ident = jnp.asarray(np.inf if is_min else -np.inf, dt)
    else:
        info = np.iinfo(dt.name)
        ident = jnp.asarray(info.max if is_min else info.min, dt)
    v = values
    if contrib_mask is not None:
        v = jnp.where(contrib_mask, v, ident)
    red = jnp.min if is_min else jnp.max
    if num_slots == 1:
        return red(v)[None]
    if num_slots <= SMALL_SLOTS:
        slot_ids = jnp.arange(num_slots, dtype=gid.dtype)
        vv = jnp.where(gid[None, :] == slot_ids[:, None], v[None, :], ident)
        return red(vv, axis=1)
    if _pallas_available() and 1 < num_slots and dt.itemsize <= 4:
        from heavydb_tpu.kernels import lane_agg

        if num_slots <= lane_agg.MAX_SLOTS:
            n = values.shape[0]
            cm = contrib_mask if contrib_mask is not None \
                else jnp.ones(n, jnp.bool_)
            vv = jnp.where(cm, values, ident)
            op = "min" if is_min else "max"
            if dt.kind == "f":
                iv = float(np.inf if is_min else -np.inf)
            else:
                info = np.iinfo(dt.name)
                iv = int(info.max if is_min else info.min)
            out = lane_agg.lane_agg(
                gid.astype(jnp.int32), cm, [(vv, op, iv)], num_slots)
            return out[1]
    if _pallas_eligible(num_slots) and dt.itemsize <= 4:
        from heavydb_tpu.kernels.groupby_pallas import minmax_per_slot

        n = values.shape[0]
        cm = contrib_mask if contrib_mask is not None else jnp.ones(n, jnp.bool_)
        return minmax_per_slot(
            gid.astype(jnp.int32), values, cm, num_slots, is_min
        )
    if _on_tpu() and num_slots <= ONEHOT_TILED_MAX_SLOTS:
        n = values.shape[0]
        cm = contrib_mask if contrib_mask is not None else jnp.ones(n, jnp.bool_)
        if num_slots > ONEHOT_MAX_SLOTS:
            tile = ONEHOT_MAX_SLOTS
            t_count = -(-num_slots // tile)
            g32 = gid.astype(jnp.int32)

            def one_tile(t0):
                m2 = cm & (g32 >= t0) & (g32 < t0 + tile)
                return _minmax_scan(g32 - t0, m2, values, tile,
                                    is_min, ident, dt)

            stacked = jax.lax.map(
                one_tile, jnp.arange(t_count, dtype=jnp.int32) * tile
            )
            return stacked.reshape(t_count * tile)[:num_slots]
        return _minmax_scan(gid.astype(jnp.int32), cm, values, num_slots,
                            is_min, ident, dt)
    buf = jnp.full(num_slots + 1, ident, dt)
    g = jnp.minimum(gid, num_slots)
    if is_min:
        out = buf.at[g].min(v, mode="drop")
    else:
        out = buf.at[g].max(v, mode="drop")
    return out[:num_slots]


def distinct_count_per_group(gid, val_tv: TV, mask, num_slots: int,
                             allow_hash: bool = True):
    """Exact COUNT(DISTINCT x) GROUP BY.  32-bit-wide args at scale use
    hash slot claiming on the packed (group, value) pair — each distinct
    pair resolves exactly one winner row, so the distinct count is a
    segment-count of winners (reference: CountDistinct bitmap role).
    Wider args / tiny inputs / claim overflow use the sorted formulation
    (reference CountDistinct set).  Returns (counts[num_slots] int64,
    overflow count — 0 for the sort path)."""
    val, valid = val_tv
    n = val.shape[0]
    v0 = jnp.asarray(val)
    if (
        allow_hash and n > (1 << 21)
        and np.dtype(v0.dtype).itemsize <= 4
        and num_slots <= (1 << 30)
    ):
        contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
        if valid is not None:
            contrib = contrib & valid
        if v0.dtype.kind == "f":
            canon = jnp.where(jnp.isnan(v0), jnp.asarray(jnp.inf, v0.dtype),
                              v0)
            bits = lax.bitcast_convert_type(
                canon.astype(jnp.float32), jnp.uint32
            )
        else:
            bits = v0.astype(jnp.int32).astype(jnp.uint32)
        packed = lax.shift_left(
            jnp.asarray(gid, jnp.int64), jnp.int64(32)
        ) | bits.astype(jnp.int64)
        slots = bucket_pow2(max(n // 2, 1 << 12))
        cgid, total, unresolved, _ = hash_group_ids(
            packed, contrib, slots, rounds=6
        )
        # each claimed slot == one distinct (group, value) pair; all rows
        # of the pair write the SAME group id (identical-value scatter
        # collisions don't serialize) → count claimed slots per group
        slot_g = jnp.full(total + 1, -1, jnp.int32).at[cgid].max(
            jnp.asarray(gid, jnp.int32)
        )[:total]
        counts = segment_count(
            jnp.clip(slot_g, 0, num_slots), slot_g >= 0, num_slots
        )
        return counts, unresolved
    return _distinct_count_sorted(gid, val_tv, mask, num_slots), jnp.asarray(
        0, jnp.int32
    )


def bucket_pow2(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 1)


def _distinct_count_sorted(gid, val_tv: TV, mask, num_slots: int):
    val, valid = val_tv
    n = val.shape[0]
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    g = jnp.where(contrib, gid, num_slots).astype(jnp.int32)
    nullf, v = _canonical_key(jnp.asarray(val), None)
    ops = lax.sort([g, v], num_keys=2, is_stable=False)
    sg, sv = ops
    first = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), (sg[1:] != sg[:-1]) | (sv[1:] != sv[:-1])]
    )
    first = first & (sg < num_slots)
    return jnp.zeros(num_slots + 1, jnp.int64).at[
        jnp.where(first, sg, num_slots)
    ].add(1, mode="drop")[:num_slots]


def distinct_sum_per_group(gid, val_tv: TV, mask, num_slots: int, acc_dt):
    """Exact SUM(DISTINCT x) GROUP BY (reference: Calcite accepts
    SUM/AVG(DISTINCT); the engine reduces over the distinct (group,
    value) pairs).  Sorted formulation: sort (group, value) pairs, keep
    the first row of each distinct run, scatter-add those values.
    Returns (sums[num_slots] acc_dt, distinct_counts[num_slots] int64)."""
    val, valid = val_tv
    n = val.shape[0]
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    g = jnp.where(contrib, gid, num_slots).astype(jnp.int32)
    v = jnp.asarray(val)
    ops = lax.sort([g, v], num_keys=2, is_stable=False)
    sg, sv = ops
    first = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), (sg[1:] != sg[:-1]) | (sv[1:] != sv[:-1])]
    )
    first = first & (sg < num_slots)
    tgt = jnp.where(first, sg, num_slots)
    sums = jnp.zeros(num_slots + 1, acc_dt).at[tgt].add(
        jnp.where(first, sv, jnp.zeros((), sv.dtype)).astype(acc_dt),
        mode="drop",
    )[:num_slots]
    counts = jnp.zeros(num_slots + 1, jnp.int64).at[tgt].add(
        1, mode="drop"
    )[:num_slots]
    return sums, counts


# above this row count, APPROX_QUANTILE switches from the exact sorted
# formulation to the histogram sketch (lax.sort at tens of millions of rows
# costs seconds on TPU; the reference's t-digest is approximate anyway)
QUANTILE_EXACT_MAX_ROWS = 1 << 21


def quantile_per_group(gid, val_tv: TV, mask, num_slots: int, q: float):
    """Per-group quantile — our stand-in for the reference's t-digest
    APPROX_QUANTILE (Shared/quantile.h).  Exact (sorted segments, numpy
    interpolation semantics) up to QUANTILE_EXACT_MAX_ROWS; histogram
    sketch beyond (two scatter-add passes, error ≤ range/2^16 refined by
    a second zoomed pass)."""
    val, valid = val_tv
    n = val.shape[0]
    if n > QUANTILE_EXACT_MAX_ROWS:
        return _quantile_histogram(gid, val_tv, mask, num_slots, q)
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    g = jnp.where(contrib, gid, num_slots).astype(jnp.int32)
    fval = jnp.asarray(val, jnp.float64)
    fval = jnp.where(contrib, fval, jnp.asarray(0.0, jnp.float64))
    sg, sv = lax.sort([g, fval], num_keys=2, is_stable=False)
    # start offset and count per group
    counts = jnp.zeros(num_slots + 1, jnp.int64).at[sg].add(1, mode="drop")[:num_slots]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int64), SC.cumsum(counts)[:-1]])
    pos = q * jnp.maximum(counts - 1, 0).astype(jnp.float64)
    lo = jnp.floor(pos).astype(jnp.int64)
    hi = jnp.ceil(pos).astype(jnp.int64)
    frac = pos - lo.astype(jnp.float64)
    max_i = jnp.asarray(n - 1, jnp.int64)
    lo_v = sv[jnp.clip(starts + lo, 0, max_i)]
    hi_v = sv[jnp.clip(starts + hi, 0, max_i)]
    out = lo_v * (1 - frac) + hi_v * frac
    return out, counts > 0


def _quantile_histogram(gid, val_tv: TV, mask, num_slots: int, q: float):
    """Histogram-sketch quantile: per-group [lo, hi) interval iteratively
    zoomed through scatter-add histograms — pure memory-bandwidth passes,
    no sort.  Role of the reference's t-digest merge (Shared/quantile.h);
    error after the zoom passes ≤ range / bins^zooms."""
    val, valid = val_tv
    n = val.shape[0]
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    fval = jnp.asarray(val, jnp.float64)
    fval = jnp.where(contrib, fval, jnp.asarray(0.0, jnp.float64))
    g = jnp.where(contrib, gid, num_slots).astype(jnp.int32)

    if num_slots <= 1024:
        bins, zooms = 4096, 2
    elif num_slots <= (1 << 16):
        bins, zooms = 256, 3
    else:
        bins, zooms = 64, 3

    cnt = segment_count(gid, contrib, num_slots)
    glo = segment_minmax(gid, fval, contrib, num_slots, is_min=True)
    ghi = segment_minmax(gid, fval, contrib, num_slots, is_min=False)
    pos = q * jnp.maximum(cnt - 1, 0).astype(jnp.float64)
    frac = pos - jnp.floor(pos)

    def value_at_rank(rank):  # rank: int64 per group (0-based)
        lo = glo
        hi = ghi
        rk = rank
        for _ in range(zooms):
            width = jnp.maximum((hi - lo) / bins, 1e-300)
            gs = jnp.clip(g, 0, num_slots - 1)
            b = jnp.clip(
                jnp.floor((fval - lo[gs]) / width[gs]), 0, bins - 1
            ).astype(jnp.int32)
            # rows outside the zoomed interval no longer participate (the
            # residual rank rk is relative to the interval start)
            in_iv = contrib & (fval >= lo[gs]) & (fval <= hi[gs])
            flat = jnp.where(
                in_iv, g * bins + b, num_slots * bins
            )
            hist = jnp.zeros(num_slots * bins + 1, jnp.int32).at[flat].add(
                1, mode="drop"
            )[:-1].reshape(num_slots, bins)
            cum = jnp.cumsum(hist, axis=1)
            below = jnp.concatenate(
                [jnp.zeros((num_slots, 1), jnp.int32), cum[:, :-1]], axis=1
            )
            # first bin whose cumulative count exceeds the rank
            sel = cum.astype(jnp.int64) > rk[:, None]
            bstar = jnp.argmax(sel, axis=1).astype(jnp.int32)
            rk = rk - jnp.take_along_axis(
                below, bstar[:, None], axis=1
            )[:, 0].astype(jnp.int64)
            nlo = lo + bstar.astype(jnp.float64) * width
            hi = nlo + width
            lo = nlo
        return (lo + hi) * 0.5

    rlo = jnp.floor(pos).astype(jnp.int64)
    rhi = jnp.ceil(pos).astype(jnp.int64)
    vlo = value_at_rank(rlo)
    vhi = value_at_rank(rhi)
    out = vlo * (1 - frac) + vhi * frac
    out = jnp.clip(out, glo, ghi)
    return out, cnt > 0


def mode_per_group(gid, val_tv: TV, mask, num_slots: int):
    """MODE(): most frequent value per group; ties → smallest value
    (reference QueryEngine/AggMode.h — hash-table of counts; here run-length
    over sorted (gid, val))."""
    val, valid = val_tv
    n = val.shape[0]
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    g = jnp.where(contrib, gid, num_slots).astype(jnp.int32)
    _, v = _canonical_key(jnp.asarray(val), None)
    sg, sv = lax.sort([g, v], num_keys=2, is_stable=False)
    newrun = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), (sg[1:] != sg[:-1]) | (sv[1:] != sv[:-1])]
    )
    run_id = SC.cumsum(newrun.astype(jnp.int32)) - 1  # < n
    run_len = jnp.zeros(n + 1, jnp.int64).at[run_id].add(1)[:n]
    # per-row: length of its run
    row_run_len = run_len[run_id]
    # scatter-max (len, -val_order) per gid; pack len into high bits with row
    # position of run start as tiebreak (earlier run = smaller value)
    run_start_pos = jnp.where(newrun, lax.broadcasted_iota(jnp.int64, (n,), 0), 0)
    run_start = jnp.zeros(n + 1, jnp.int64).at[run_id].max(run_start_pos)[:n]
    row_run_start = run_start[run_id]
    packed = row_run_len * jnp.asarray(n + 1, jnp.int64) + (n - row_run_start)
    packed = jnp.where(sg < num_slots, packed, 0)
    best = jnp.zeros(num_slots + 1, jnp.int64).at[jnp.minimum(sg, num_slots)].max(
        packed, mode="drop"
    )[:num_slots]
    best_start = jnp.asarray(n, jnp.int64) - (best % (n + 1))
    has = best > 0
    best_val = sv[jnp.clip(best_start, 0, n - 1)]
    return best_val, has


# ---------------------------------------------------------------------------
# HyperLogLog (APPROX_COUNT_DISTINCT) — reference QueryEngine/HyperLogLog.h
# ---------------------------------------------------------------------------

HLL_BITS = 11  # 2048 registers, matches reference g_hll_precision_bits
HLL_M = 1 << HLL_BITS


def _splitmix64(x):
    x = jnp.asarray(x, jnp.uint64)
    x = x + jnp.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return z ^ (z >> jnp.uint64(31))


def hll_registers(gid, val_tv: TV, mask, num_slots: int):
    """Scatter-max of HLL rho values → [num_slots, M] int8 register matrix."""
    val, valid = val_tv
    n = val.shape[0]
    contrib = mask if mask is not None else jnp.ones(n, jnp.bool_)
    if valid is not None:
        contrib = contrib & valid
    if val.dtype.kind == "f":
        from heavydb_tpu.ops.f64bits import f64_to_bits

        bits = f64_to_bits(jnp.asarray(val, jnp.float64))
    else:
        bits = jnp.asarray(val, jnp.int64)
    h = _splitmix64(bits)
    reg = (h >> jnp.uint64(64 - HLL_BITS)).astype(jnp.int32)
    rest = (h << jnp.uint64(HLL_BITS)) | jnp.uint64((1 << HLL_BITS) - 1)
    # rho = leading zeros of rest + 1  (clz via float trick is lossy; use loop-free log2)
    # count leading zeros: 63 - floor(log2(rest)); rest has low bits set so never 0
    f = jnp.asarray(rest, jnp.float64)
    # float64 mantissa (52 bits) can't represent all 64-bit values exactly, but
    # the OR above guarantees the top HLL_BITS..(52) window is intact for clz
    lz = jnp.asarray(63, jnp.int32) - jnp.floor(jnp.log2(f)).astype(jnp.int32)
    rho = (lz + 1).astype(jnp.int8)
    flat_idx = jnp.where(contrib, gid.astype(jnp.int64) * HLL_M + reg, num_slots * HLL_M)
    regs = jnp.zeros(num_slots * HLL_M + 1, jnp.int8).at[flat_idx].max(
        rho, mode="drop"
    )[: num_slots * HLL_M]
    return regs.reshape(num_slots, HLL_M)


def hll_estimate(registers):
    """registers [G, M] int8 → estimated NDV per group (float64)."""
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    r = registers.astype(jnp.float64)
    inv_sum = jnp.sum(jnp.exp2(-r), axis=1)
    est = alpha * m * m / inv_sum
    zeros = jnp.sum(registers == 0, axis=1).astype(jnp.float64)
    # small-range correction (linear counting)
    small = est <= 2.5 * m
    lc = m * jnp.log(jnp.where(zeros > 0, m / jnp.maximum(zeros, 1), 1.0))
    est = jnp.where(small & (zeros > 0), lc, est)
    return jnp.round(est).astype(jnp.int64)


def unpack_group_keys(slot_keys, spec, group_types):
    """Inverse of pack_group_keys: per-slot packed int64 → key column TVs
    (direct materialization for the hash path; slots never cleanly claimed
    hold garbage but are filtered by group presence)."""
    out = []
    if spec is None:
        ti = group_types[0]
        dt = ti.np_dtype()
        if dt.kind == "f":
            if dt == np.float64:
                from heavydb_tpu.ops.f64bits import bits_to_f64

                kv = bits_to_f64(slot_keys)
            else:
                kv = lax.bitcast_convert_type(
                    slot_keys.astype(jnp.int32), jnp.float32
                )
            valid = ~jnp.isnan(kv) if ti.nullable else None
        else:
            kv = slot_keys.astype(dt)
            valid = (
                kv != jnp.asarray(int(np.iinfo(dt).min), dt)
                if ti.nullable else None
            )
        return [(kv, valid)]
    rem = slot_keys
    parts = []
    for lo, span in reversed(spec):
        parts.append(rem % jnp.int64(span + 2))
        rem = rem // jnp.int64(span + 2)
    parts.reverse()
    for ti, iv, (lo, span) in zip(group_types, parts, spec):
        dt = ti.np_dtype()
        kv = (iv - 1 + jnp.int64(lo)).astype(dt)
        valid = iv != 0 if ti.nullable else None
        out.append((kv, valid))
    return out
