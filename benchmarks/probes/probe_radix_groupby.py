"""HW benchmark: radix_groupby.sparse_groupby at 20M rows / 10M slots
(the groupby_10m_sparse bench shape), carry-chained protocol."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from heavydb_tpu.kernels import radix_groupby as RG


def chain(fn, args, pert_idx, k_lo=4, k_hi=24):
    @jax.jit
    def looped(carry0, k_iters, *a):
        def cond(st):
            return st[0] < k_iters

        def body(st):
            i, carry = st
            eps = (carry >> jnp.int64(62)).astype(a[pert_idx].dtype)
            a2 = list(a)
            a2[pert_idx] = a2[pert_idx] + eps
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

    t0 = time.perf_counter()
    run(k_lo, 1)
    first = time.perf_counter() - t0
    run(k_hi, 2)
    tlo = min(run(k_lo, s) for s in (3, 4))
    thi = min(run(k_hi, s) for s in (5, 6))
    return (thi - tlo) / (k_hi - k_lo), first


def main():
    m = 20_000_000
    num_slots = 10_000_000
    kb, kc = jax.random.split(jax.random.PRNGKey(7))
    gid = jax.random.randint(kb, (m,), 0, num_slots, jnp.int32)
    v = jax.random.uniform(kc, (m,), jnp.float32)
    cap = 1 << 24

    # count-only (bench groupby_10m_sparse shape)
    f1 = lambda g: RG.sparse_groupby(g, [], num_slots, (), cap)
    per, first = chain(f1, [gid], 0)
    print(f"count-only: {per*1e3:.1f}ms/iter ({m/per/1e9:.2f}G rows/s) "
          f"first={first:.1f}s")
    sys.stdout.flush()

    # count + sum(f32, f64 acc via DS)
    def f2(g, vv):
        hi = vv
        lo = jnp.zeros_like(vv)
        return RG.sparse_groupby(g, [hi, lo], num_slots,
                                 ("sumds_hi", "sumds_lo"), cap)

    per2, first2 = chain(f2, [gid, v], 0)
    print(f"count+sum_ds: {per2*1e3:.1f}ms/iter "
          f"({m/per2/1e9:.2f}G rows/s) first={first2:.1f}s")
    sys.stdout.flush()

    # sanity: num_groups vs expected distinct
    out = jax.jit(f1)(gid)
    ng = int(out[3])
    ovf = int(out[4])
    # E[distinct] = slots*(1-(1-1/slots)^m) ~= 8.64M
    print(f"num_groups={ng} overflow={ovf}")


if __name__ == "__main__":
    main()
