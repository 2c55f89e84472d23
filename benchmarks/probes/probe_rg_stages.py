"""Stage-level timing of the sparse group-by pipeline at the bench shape
(20M rows, 10M slots): L1 partition, L2 partition, group-by stage."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu.kernels import radix_groupby as RG


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
    num_slots = 10_000_000
    kb, _ = jax.random.split(jax.random.PRNGKey(7))
    gid = jax.random.randint(kb, (m,), 0, num_slots, jnp.int32)

    def prep(g):
        h = (g.astype(jnp.uint32) * RG._MULT).astype(jnp.uint32)
        hb = (h ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        valid = (g >= 0) & (g < num_slots)
        hb = jnp.where(valid, hb, jnp.asarray(RG._SENT, jnp.int32))
        ntiles = -(-m // RG._TILE)
        n_p = ntiles * RG._TILE
        if n_p != m:
            hb = jnp.concatenate([hb, jnp.full(n_p - m, RG._SENT,
                                               jnp.int32)])
        return hb.reshape(-1, 128)

    ntiles = -(-m // RG._TILE)
    p1, p2, region_log, cap1_rows = RG._plan(ntiles)
    print(f"plan p1={p1} p2={p2} region_log={region_log} "
          f"cap1_rows={cap1_rows}", flush=True)

    def l1(g):
        hb2 = prep(g)
        return RG._partition_call(
            hb2, [], P=1 << p1, shift=32 - p1, region_log=30,
            cap_rows=cap1_rows, check_shift=-1, n_regions=1,
            interpret=False)[0]

    def l12(g):
        hb2 = prep(g)
        hb2, _, _f = RG._partition_call(
            hb2, [], P=1 << p1, shift=32 - p1, region_log=30,
            cap_rows=cap1_rows, check_shift=-1, n_regions=1,
            interpret=False)
        return RG._partition_call(
            hb2, [], P=1 << p2, shift=32 - p1 - p2,
            region_log=region_log, cap_rows=RG._R, check_shift=32 - p1,
            n_regions=1 << p1, interpret=False)[0]

    def full(g):
        return RG.sparse_groupby(g, [], num_slots, (), 1 << 24)

    t_prep = chain(lambda g: prep(g), [gid])
    t_l1 = chain(l1, [gid])
    t_l12 = chain(l12, [gid])
    t_full = chain(full, [gid])
    print(f"prep:      {t_prep*1e3:7.2f} ms", flush=True)
    print(f"L1:        {(t_l1-t_prep)*1e3:7.2f} ms", flush=True)
    print(f"L2:        {(t_l12-t_l1)*1e3:7.2f} ms", flush=True)
    print(f"groupby:   {(t_full-t_l12)*1e3:7.2f} ms", flush=True)
    print(f"full:      {t_full*1e3:7.2f} ms "
          f"({m/t_full/1e9:.2f}G rows/s)", flush=True)


if __name__ == "__main__":
    main()
