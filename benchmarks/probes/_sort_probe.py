"""TPU probe: where does time go in big sorts/windows at 100M rows?

Measures, with the chained while_loop protocol (bench.py):
  - lax.sort 1-op / 2-op / argsort at N
  - random gather and scatter at N (the window kernel's per-column cost)
  - radix-select top-k at N and (optionally) 1B rows (BASELINE config 4)
"""
import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jrnd
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


log(f"devices={jax.devices()} N={N:,}")


def chain(fn, args, k_lo=2, k_hi=6, pert_idx=0):
    """Device s/iter of fn(*args) via carry-chained while_loop."""

    @jax.jit
    def looped(carry0, k_iters, *a):
        def cond(st):
            return st[0] < k_iters

        def body(st):
            i, carry = st
            aa = list(a)
            eps = (carry >> jnp.int64(62)).astype(aa[pert_idx].dtype)
            aa[pert_idx] = aa[pert_idx] + eps
            out = fn(*aa)
            nxt = jnp.int64(0)
            for c in (out if isinstance(out, (tuple, list)) else (out,)):
                nxt = nxt + jnp.ravel(c)[0].astype(jnp.int64)
            return i + 1, carry + nxt

        return lax.while_loop(cond, body, (jnp.int32(0), carry0))[1]

    def run(K, seed):
        t1 = time.perf_counter()
        o = looped(jnp.int64(seed), jnp.int32(K), *args)
        float(jax.device_get(o))
        return time.perf_counter() - t1

    run(k_lo, 1)
    run(k_hi, 2)
    tlo = min(run(k_lo, s) for s in (3, 4))
    thi = min(run(k_hi, s) for s in (5, 6))
    return max(thi - tlo, 0.0) / (k_hi - k_lo)


key = jrnd.randint(jrnd.PRNGKey(0), (N,), 0, 1 << 30, jnp.int32)
val = jrnd.uniform(jrnd.PRNGKey(1), (N,), jnp.float32)
perm = jrnd.permutation(jrnd.PRNGKey(2), N).astype(jnp.int32)
key.block_until_ready()
log("datagen done")

per = chain(lambda k: (lax.sort([k], num_keys=1)[0],), [key])
log(f"sort 1op i32: {per*1e3:.0f}ms")

per = chain(lambda k, v: lax.sort([k, v], num_keys=2), [key, val])
log(f"sort 2op (i32 key, f32 payload): {per*1e3:.0f}ms")

per = chain(
    lambda k: lax.sort(
        [k, lax.broadcasted_iota(jnp.int32, k.shape, 0)], num_keys=1,
        is_stable=True),
    [key])
log(f"argsort stable i32: {per*1e3:.0f}ms")

per = chain(lambda p, v: (v[p],), [perm, val], pert_idx=1)
log(f"random gather {N//10**6}M from {N//10**6}M: {per*1e3:.0f}ms")

per = chain(lambda p, v: (jnp.zeros_like(v).at[p].set(v),), [perm, val],
            pert_idx=1)
log(f"random scatter (unique idx): {per*1e3:.0f}ms")

# 4-column gather through one perm (window kernel shape)
cols = [jrnd.uniform(jrnd.PRNGKey(10 + i), (N,), jnp.float32)
        for i in range(4)]
per = chain(lambda p, *cs: tuple(c[p] for c in cs), [perm] + cols,
            pert_idx=1)
log(f"4-col random gather: {per*1e3:.0f}ms")

from heavydb_tpu.ops.sort import topk_indices  # noqa: E402

per = chain(lambda k: (topk_indices(k, 100),), [key])
log(f"radix-select top-100 @ {N//10**6}M: {per*1e3:.0f}ms")

if len(sys.argv) > 2 and sys.argv[2] == "1b":
    del key, val, perm, cols
    NB = 1_000_000_000
    kb = jrnd.randint(jrnd.PRNGKey(5), (NB,), 0, 1 << 30, jnp.int32)
    kb.block_until_ready()
    log("1B keys ready")
    per = chain(lambda k: (topk_indices(k, 100),), [kb], k_lo=1, k_hi=3)
    log(f"radix-select top-100 @ 1B rows: {per*1e3:.0f}ms")
