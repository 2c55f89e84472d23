"""Probe: lane-parallel masked-reduce group-by tier + int8 matmul support.

e) acc[s, 128] VMEM accumulator; rows reshaped (R, 128); per-slot masked
   sum over sublanes.  VPU cost = S elem-ops/row, NO one-hot matmul, so
   no (block,128) VMEM materialization.  Try S = 64, 256, 1024.
f) minimal int8 x int8 -> int32 jnp.dot inside pallas.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000


def chain(fn, args, k_lo=4, k_hi=24):
    @jax.jit
    def looped(carry0, k_iters, *a):
        def cond(st):
            return st[0] < k_iters

        def body(st):
            i, carry = st
            eps = (carry >> jnp.int64(62)).astype(a[0].dtype)
            out = fn(a[0] + eps, *a[1:])
            nxt = jnp.int64(0)
            for c in out:
                nxt = nxt + jnp.ravel(c)[0].astype(jnp.int64)
            return i + 1, carry + nxt

        return jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))[1]

    def run(K, seed):
        t1 = time.perf_counter()
        out = looped(jnp.int64(seed), jnp.int32(K), *args)
        float(jax.device_get(out))
        return time.perf_counter() - t1

    s = iter(range(1, 100))
    run(k_lo, next(s))
    run(k_hi, next(s))
    tlo = min(run(k_lo, next(s)) for _ in range(2))
    thi = min(run(k_hi, next(s)) for _ in range(2))
    return max(thi - tlo, 0.0) / (k_hi - k_lo)


def im_row2(i):
    return (jnp.int32(i), jnp.int32(0))


def im_acc2(i):
    return (jnp.int32(0), jnp.int32(0))


def make_lane_reduce(S, R, unroll=8):
    """g2, v2: (R, 128) blocks; acc (S, 128) f32 x2 (count, sum)."""
    S_p = (S + unroll - 1) // unroll * unroll

    def kernel(g_ref, v_ref, oc_ref, os_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            oc_ref[...] = jnp.zeros_like(oc_ref)
            os_ref[...] = jnp.zeros_like(os_ref)

        gv = g_ref[...]
        vv = v_ref[...]

        def body(j, _):
            # unroll slots [j*unroll, (j+1)*unroll)
            base = j * unroll
            cnts = []
            sums = []
            for u in range(unroll):
                m = gv == (base + u)
                cnts.append(jnp.sum(m.astype(jnp.float32), axis=0,
                                    keepdims=True))
                sums.append(jnp.sum(jnp.where(m, vv, 0.0), axis=0,
                                    keepdims=True))
            oc_ref[pl.ds(base, unroll), :] += jnp.concatenate(cnts, axis=0)
            os_ref[pl.ds(base, unroll), :] += jnp.concatenate(sums, axis=0)
            return 0

        jax.lax.fori_loop(0, S_p // unroll, body, 0)

    def fn(g2, v2):
        nblocks = g2.shape[0] // R
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((R, 128), im_row2)] * 2,
            out_specs=[pl.BlockSpec((S_p, 128), im_acc2)] * 2,
            out_shape=[jax.ShapeDtypeStruct((S_p, 128), jnp.float32)] * 2,
        )(g2, v2)

    return fn


def main():
    print(f"backend={jax.default_backend()} n={N:,}", flush=True)
    kg, kv = jax.random.split(jax.random.PRNGKey(0))

    # f) int8 matmul support
    def int8_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.int32)

    try:
        a = jnp.ones((128, 512), jnp.int8)
        b = jnp.ones((512, 128), jnp.int8)
        out = pl.pallas_call(
            int8_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a, b)
        print("int8 dot:", np.asarray(out)[0, 0], flush=True)
    except Exception as e:
        print(f"int8 dot FAILED: {type(e).__name__} {str(e)[:200]}",
              flush=True)

    # e) lane-parallel masked reduce
    for S in (64, 256, 1024):
        R = 512
        n_p = (N + R * 128 - 1) // (R * 128) * (R * 128)
        g = jax.random.randint(kg, (N,), 0, S, jnp.int32)
        g = jnp.concatenate([g, jnp.full(n_p - N, -1, jnp.int32)])
        v = jax.random.uniform(kv, (N,), jnp.float32)
        v = jnp.concatenate([v, jnp.zeros(n_p - N, jnp.float32)])
        g2 = g.reshape(-1, 128)
        v2 = v.reshape(-1, 128)
        fn = jax.jit(make_lane_reduce(S, R))
        try:
            t0 = time.perf_counter()
            out = fn(g2, v2)
            jax.block_until_ready(out)
            comp = time.perf_counter() - t0
            # sanity
            oc = np.asarray(out[0]).sum(axis=1)[:S]
            exp = np.asarray(jnp.bincount(jnp.maximum(g, 0)[:N], length=S))
            ok = (oc == exp).all()
            per = chain(fn, (g2, v2))
            print(f"lane-reduce S={S:5d} {per*1e3:7.2f}ms/iter "
                  f"({N/max(per,1e-9)/1e9:6.2f}G rows/s) ok={ok} "
                  f"compile={comp:.1f}s", flush=True)
        except Exception as e:
            print(f"lane-reduce S={S} FAILED: {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
