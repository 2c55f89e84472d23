"""TPU shootout: kernels.radix_hist.fused_hist vs ops.groupby._onehot_scan.

Carry-chained while_loop protocol (see bench.py): device s/iter from the
(T_hi - T_lo) / (K_hi - K_lo) slope, immune to relay D2H constants.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, args, k_lo=4, k_hi=24):
    """fn(*args) -> list/tuple of arrays; args[0] is the int32 gid array
    that gets carry-perturbed (eps always 0 at runtime)."""

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

    seeds = iter(range(1, 100))
    t0 = time.perf_counter()
    run(k_lo, next(seeds))
    compile_s = time.perf_counter() - t0
    run(k_hi, next(seeds))
    tlo = min(run(k_lo, next(seeds)) for _ in range(2))
    thi = min(run(k_hi, next(seeds)) for _ in range(2))
    return max(thi - tlo, 0.0) / (k_hi - k_lo), compile_s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    print(f"backend={jax.default_backend()} n={n:,}", flush=True)
    from heavydb_tpu.kernels.radix_hist import fused_hist
    from heavydb_tpu.ops.groupby import _onehot_scan

    key = jax.random.PRNGKey(0)
    kv, kg = jax.random.split(key)
    v = jax.random.uniform(kv, (n,), jnp.float32)
    mask = jnp.ones(n, jnp.bool_)

    for slots in (1000, 16384, 65536):
        gid = jax.random.randint(kg, (n,), 0, slots, jnp.int32)
        gid = jax.block_until_ready(gid)

        # count + f32 sum
        def f_pallas(g, vv, m):
            return fused_hist(g, m, [vv], slots, exact_accs=(False,),
                              bf16_ok=(False,))

        def f_xla(g, vv, m):
            return _onehot_scan(g, m, [vv], slots, exact_accs=(False,),
                                bf16_ok=(False,))

        for name, f in (("pallas", f_pallas), ("xla", f_xla)):
            try:
                per, comp = chain(f, (gid, v, mask))
                print(f"slots={slots:6d} count+sum {name:7s} "
                      f"{per*1e3:7.2f}ms/iter "
                      f"({n/max(per,1e-9)/1e9:6.2f}G rows/s) "
                      f"compile={comp:.1f}s", flush=True)
            except Exception as e:
                print(f"slots={slots} {name} FAILED: {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)

    # exact-int sum (4 limb streams) at 1k
    slots = 1000
    gid = jax.random.randint(kg, (n,), 0, slots, jnp.int32)
    iv = jax.random.randint(kv, (n,), -1000, 1000, jnp.int32)
    from heavydb_tpu.ops.groupby import _biased_limbs
    limbs = [jax.block_until_ready(x) for x in _biased_limbs(iv, 4)]

    def g_pallas(g, *ls):
        return fused_hist(g, mask, list(ls), slots,
                          exact_accs=(True,) * 4, bf16_ok=(True,) * 4)

    def g_xla(g, *ls):
        return _onehot_scan(g, mask, list(ls), slots,
                            exact_accs=(True,) * 4, bf16_ok=(True,) * 4)

    for name, f in (("pallas", g_pallas), ("xla", g_xla)):
        try:
            per, comp = chain(f, (gid, *limbs))
            print(f"slots={slots:6d} int-sum   {name:7s} {per*1e3:7.2f}ms/iter "
                  f"({n/max(per,1e-9)/1e9:6.2f}G rows/s) compile={comp:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"int-sum {name} FAILED: {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
