"""What dominates a partition pass: bitonic, count_below, or DMAs?
Runs stripped variants of _partition_call's kernel at the L1 shape."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heavydb_tpu.kernels import radix_groupby as RG
from heavydb_tpu.kernels.tile_sort import _tile_bitonic

_R = RG._R
_CH = RG._CH
_SENT = RG._SENT
_NBIAS = RG._NBIAS


def variant(hb2, P, shift, cap_rows, do_sort, do_count, do_dma,
            bulk_wait=False):
    ntiles = hb2.shape[0] // _R
    out_rows = P * cap_rows
    trip_shift = int(np.log2(_CH))

    def kernel(h_ref, _alias, houtb, flag_ref, scr, cur_ref, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[...] = jnp.zeros_like(flag_ref)
            for b in range(P):
                cur_ref[b] = jnp.int32(0)

        hb = h_ref[...]
        n_valid = RG._sum_scalar((hb < _SENT).astype(jnp.int32))
        if do_sort:
            hs = _tile_bitonic(hb, [], _R)[0]
        else:
            hs = hb
        scr[...] = jnp.concatenate(
            [hs, jnp.full((_CH, 128), _SENT, jnp.int32)], axis=0)

        def count_below(thr):
            return RG._sum_scalar((hs < thr).astype(jnp.int32))

        if do_count == "row":
            first_col = hs[:, 0:1]
            last_col = hs[:, 127:128]
            # ALL bucket thresholds at once: one (256,P) compare + one
            # staged reduce instead of 2P dependent scalar reductions
            bidx = lax.broadcasted_iota(jnp.int32, (1, P), 1) \
                + jnp.int32(1)
            thr_vec = lax.shift_left(bidx, jnp.int32(shift)) ^ _NBIAS
            rends_v = jnp.sum((first_col < thr_vec).astype(jnp.int32),
                              axis=0, keepdims=True, dtype=jnp.int32)
            r0s_v = jnp.sum((last_col < thr_vec).astype(jnp.int32),
                            axis=0, keepdims=True, dtype=jnp.int32)
            nvrows = RG._sum_scalar(
                (first_col < jnp.int32(_SENT)).astype(jnp.int32))
        start = jnp.int32(0)
        prev_r0 = jnp.int32(0)
        total_trips = jnp.int32(0)
        for b in range(P):
            if do_count == "row":
                if b == P - 1:
                    rend = nvrows
                else:
                    rend = jnp.minimum(rends_v[0, b], nvrows)
                r0 = prev_r0
                if b < P - 1:
                    prev_r0 = jnp.minimum(r0s_v[0, b], nvrows)
                nrows = jnp.maximum(rend - r0, 0)
                end = start  # unused
            elif do_count:
                if b == P - 1:
                    end = n_valid
                else:
                    thr = (lax.shift_left(jnp.int32(b + 1),
                                          jnp.int32(shift))) ^ _NBIAS
                    end = jnp.minimum(count_below(thr), n_valid)
            else:
                end = jnp.minimum(
                    jnp.int32((b + 1) * (RG._TILE // P)), n_valid)
            if do_count != "row":
                r0 = lax.shift_right_logical(start, jnp.int32(7))
                rend = lax.shift_right_logical(end + jnp.int32(127),
                                               jnp.int32(7))
            nrows = jnp.maximum(rend - r0, 0)
            trips = lax.shift_right_logical(
                nrows + jnp.int32(_CH - 1), jnp.int32(trip_shift))
            cur = cur_ref[b]
            fits = (cur + trips * jnp.int32(_CH)) <= jnp.int32(cap_rows)
            dst0 = jnp.int32(b * cap_rows)

            if do_dma:
                @pl.when(fits & (nrows > 0))
                def _():
                    def body(t, c):
                        src = r0 + t * jnp.int32(_CH)
                        d = dst0 + c
                        pltpu.make_async_copy(
                            scr.at[pl.ds(src, _CH), :],
                            houtb.at[pl.ds(d, _CH), :],
                            sem.at[jnp.int32(0)]).start()
                        return c + jnp.int32(_CH)

                    lax.fori_loop(jnp.int32(0), trips, body, cur)

            cur_ref[b] = jnp.where(fits, cur + nrows, cur)
            total_trips = total_trips + jnp.where(
                fits & (nrows > 0), trips, jnp.int32(0))
            start = end

        if do_dma:
            if bulk_wait:
                pltpu.semaphore_wait(
                    sem.at[jnp.int32(0)],
                    total_trips * jnp.int32(_CH * 128 * 4))
            else:
                def drain(t, z):
                    pltpu.make_async_copy(
                        scr.at[pl.ds(jnp.int32(0), _CH), :],
                        houtb.at[pl.ds(jnp.int32(0), _CH), :],
                        sem.at[jnp.int32(0)]).wait()
                    return z

                lax.fori_loop(jnp.int32(0), total_trips, drain,
                              jnp.int32(0))

    sent_init = jnp.full((out_rows, 128), _SENT, jnp.int32)
    res = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((_R, 128),
                               lambda i: (jnp.int32(i), jnp.int32(0))),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((8, 128),
                                lambda i: (jnp.int32(0), jnp.int32(0)))],
        out_shape=[jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((_R + _CH, 128), jnp.int32),
                        pltpu.SMEM((P,), jnp.int32),
                        pltpu.SemaphoreType.DMA((1,))],
        input_output_aliases={1: 0},
    )(hb2, sent_init)
    return res[0]


def chain(fn, args, k_lo=4, k_hi=24):
    @jax.jit
    def looped(carry0, k_iters, *a):
        def cond(st):
            return st[0] < k_iters

        def body(st):
            i, carry = st
            eps = (carry >> jnp.int64(62)).astype(a[0].dtype)
            a2 = list(a)
            a2[0] = a2[0] + eps
            out = fn(*a2)
            nxt = jnp.int64(0)
            for leaf in jax.tree.leaves(out):
                nxt = nxt + jnp.ravel(leaf)[0].astype(jnp.int64)
            return i + 1, carry + nxt

        return jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))[1]

    def run(K, seed):
        t = time.perf_counter()
        o = looped(jnp.int64(seed), jnp.int32(K), *args)
        float(jax.device_get(o))
        return time.perf_counter() - t

    run(k_lo, 1)
    run(k_hi, 2)
    tlo = min(run(k_lo, s) for s in (3, 4))
    thi = min(run(k_hi, s) for s in (5, 6))
    return (thi - tlo) / (k_hi - k_lo)


def main():
    m = 20_000_000
    kb, _ = jax.random.split(jax.random.PRNGKey(7))
    gid = jax.random.randint(kb, (m,), 0, 10_000_000, jnp.int32)
    h = (gid.astype(jnp.uint32) * RG._MULT).astype(jnp.uint32)
    hb = (h ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    ntiles = -(-m // RG._TILE)
    n_p = ntiles * RG._TILE
    hb = jnp.concatenate([hb, jnp.full(n_p - m, _SENT, jnp.int32)])
    hb2 = hb.reshape(-1, 128)
    P, shift, cap_rows = 32, 27, 8192

    for label, ds, dc, dd, bw in [
        ("full (sort+count+dma)", True, True, True, False),
        ("rowcount", True, "row", True, False),
        ("bulkwait", True, True, True, True),
        ("rowcount+bulkwait", True, "row", True, True),
        ("no dma", True, True, False, False),
        ("rowcount no dma", True, "row", False, False),
    ]:
        f = functools.partial(variant, P=P, shift=shift,
                              cap_rows=cap_rows, do_sort=ds,
                              do_count=dc, do_dma=dd, bulk_wait=bw)
        try:
            t = chain(f, [hb2])
            print(f"{label:26s} {t*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{label:26s} ERROR {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
