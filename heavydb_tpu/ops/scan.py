"""Blocked prefix sums for TPU.

XLA lowers a 1-D ``jnp.cumsum`` to a reduce-window whose scoped-VMEM
working set grows with the array: at ~20M elements the allocation can
exceed the 16MB scoped-vmem limit when the op sits inside a
``while_loop`` body (measured: "Allocation with size 19.07M ... exceeded
scoped vmem limit"), and even when it fits it is ~2x slower than a
two-level formulation (measured 4.4ms vs 2.0ms per 20M-i32 scan on
v5e).

``cumsum`` here reshapes to (blocks, block) rows, scans the short minor
axis (small reduce-window), then adds an exclusive scan of the per-block
totals — the classic scan-then-propagate decomposition (reference uses
thrust::inclusive_scan for the same role in
QueryEngine/InPlaceSort.cpp's partition offsets).
"""

import jax
import jax.numpy as jnp
from jax import lax

# below this size the plain lowering fits VMEM comfortably and the
# reshape/pad of the blocked form is pure overhead
_BLOCKED_MIN = 1 << 20
_BLK = 1 << 15


def cumsum(x, dtype=None):
    """Inclusive 1-D prefix sum; blocked two-level scan above _BLOCKED_MIN."""
    if dtype is not None:
        x = x.astype(dtype)
    n = x.shape[0]
    if x.ndim != 1 or n < _BLOCKED_MIN:
        return jnp.cumsum(x)
    nb = -(-n // _BLK)
    pad = nb * _BLK - n
    xp = jnp.pad(x, (0, pad)) if pad else x
    t = xp.reshape(nb, _BLK)
    if x.dtype.itemsize == 8:
        # 8-byte (emulated) element types: XLA's axis-1 cumsum lowering
        # compiles pathologically for f64/i64 at scale (129s for one
        # 100M-row f64 scan; large programs crash the remote compile
        # helper) — a Hillis-Steele ladder of log2(block) shifted adds
        # keeps the HLO tiny and compiles in seconds
        sh = 1
        while sh < _BLK:
            t = t + jnp.pad(t, ((0, 0), (sh, 0)))[:, :_BLK]
            sh *= 2
        within = t
    else:
        within = jnp.cumsum(t, axis=1)
    base = jnp.concatenate(
        [jnp.zeros(1, x.dtype), jnp.cumsum(within[:, -1])[:-1]]
    )
    out = (within + base[:, None]).reshape(-1)
    return out[:n] if pad else out


def _hillis_steele_axis1(combine, blocks):
    """Inclusive scan along axis 1 via the doubling ladder: log2(blk)
    rounds of shift + combine + select — only pads and elementwise ops,
    no recursive slicing, so the program stays compile-helper-friendly."""
    leaves = jax.tree_util.tree_leaves(blocks)
    blk = leaves[0].shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    y = blocks
    shift = 1
    while shift < blk:
        s = shift

        def shf(a):
            return jnp.pad(a, ((0, 0), (s, 0)))[:, :blk]

        cand = combine(jax.tree_util.tree_map(shf, y), y)
        keep = col < s
        y = jax.tree_util.tree_map(
            lambda orig, c: jnp.where(keep, orig, c), y, cand
        )
        shift *= 2
    return y


def assoc_scan(combine, elems, reverse: bool = False):
    """Inclusive 1-D associative scan, blocked two-level above
    _BLOCKED_MIN — a drop-in for ``lax.associative_scan`` over 1-D
    (pytrees of) arrays.

    A flat 25M-element ``lax.associative_scan`` builds a log2(n)-deep
    recursive slice/interleave program that today's remote TPU compile
    helper cannot finish (observed: SIGKILL after minutes; plain
    ``lax.sort`` of the same array compiles in ~30s).  The blocked form
    scans the short minor axis of a (blocks, block) reshape, combines the
    per-block carries with one tiny scan, then applies each block's
    prefix elementwise — same O(n) work, log2(block) depth.

    ``combine`` must be elementwise and associative; it receives two
    pytrees matching ``elems``.  Scans are causal, so padding (with each
    leaf's own edge values) never flows into real outputs; ``reverse``
    flips, scans forward, flips back."""
    leaves = jax.tree_util.tree_leaves(elems)
    n = leaves[0].shape[0]
    if reverse:
        flipped = jax.tree_util.tree_map(lambda a: a[::-1], elems)
        out = assoc_scan(combine, flipped)
        return jax.tree_util.tree_map(lambda a: a[::-1], out)
    if n < _BLOCKED_MIN:
        return lax.associative_scan(combine, elems)
    nb = -(-n // _BLK)
    pad = nb * _BLK - n

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad,))])
        return a.reshape(nb, _BLK)

    blocks = jax.tree_util.tree_map(prep, elems)
    # within-block scan along the short minor axis: native cumulative ops
    # where they exist; otherwise an explicit Hillis-Steele ladder of
    # pads + selects (lax.associative_scan's recursive odd/even slicing
    # also chokes the remote compile helper, even on the 2-D reshape)
    if len(leaves) == 1 and combine in (jnp.maximum, jnp.minimum):
        cum = lax.cummax if combine is jnp.maximum else lax.cummin
        within = jax.tree_util.tree_map(
            lambda a: cum(a, axis=1), blocks
        )
    else:
        within = _hillis_steele_axis1(combine, blocks)
    carry = jax.tree_util.tree_map(lambda w: w[:, -1], within)
    carry_scan = lax.associative_scan(combine, carry)
    # block b combines the carry of blocks < b; block 0 keeps `within`
    prev = jax.tree_util.tree_map(
        lambda c: jnp.broadcast_to(c[:-1, None], (nb - 1, _BLK)), carry_scan
    )
    tail = jax.tree_util.tree_map(lambda w: w[1:], within)
    combined_tail = combine(prev, tail)
    out = jax.tree_util.tree_map(
        lambda w, ct: jnp.concatenate([w[:1], ct]).reshape(-1),
        within, combined_tail,
    )
    return jax.tree_util.tree_map(
        lambda a: a[:n] if pad else a, out
    )


# ---- double-single (paired f32) prefix sums ----
# f64 is EMULATED on TPU and, on the relay toolchain, any 100M-element
# f64 op costs ~46s of compile (a 15-step f64 scan ladder crashes the
# remote compile helper outright).  Double-single arithmetic carries
# ~2^-48 relative accuracy using only f32 ops; the consumer combines
# hi+lo into f64 with two elementwise ops at the very end.

def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (f32)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def ds_add(xh, xl, yh, yl):
    """Double-single addition: (xh,xl) + (yh,yl) → normalized (hi,lo)."""
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def ds_neg(xh, xl):
    return -xh, -xl


def cumsum_ds(x):
    """Inclusive 1-D prefix sum of an f32 array in double-single pairs.
    Returns (hi, lo) f32 arrays; hi.astype(f64)+lo.astype(f64) is the
    ~f48-accurate prefix sum.  Within-block Hillis-Steele ladder in ds
    arithmetic; tiny per-block totals propagate in real f64 (small
    shapes compile instantly)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    nb = -(-n // _BLK)
    pad = nb * _BLK - n
    xp = jnp.pad(x, (0, pad)) if pad else x
    th = xp.reshape(nb, _BLK)
    tl = jnp.zeros_like(th)
    sh = 1
    while sh < _BLK:
        shh = jnp.pad(th, ((0, 0), (sh, 0)))[:, :_BLK]
        shl = jnp.pad(tl, ((0, 0), (sh, 0)))[:, :_BLK]
        th, tl = ds_add(th, tl, shh, shl)
        sh *= 2
    # per-block totals → exclusive f64 scan over nb elements (tiny)
    tot = th[:, -1].astype(jnp.float64) + tl[:, -1].astype(jnp.float64)
    base = jnp.concatenate(
        [jnp.zeros(1, jnp.float64), jnp.cumsum(tot)[:-1]]
    )
    bh = base.astype(jnp.float32)
    bl = (base - bh.astype(jnp.float64)).astype(jnp.float32)
    H, L = ds_add(th, tl, bh[:, None], bl[:, None])
    H = H.reshape(-1)
    L = L.reshape(-1)
    return (H[:n], L[:n]) if pad else (H, L)
