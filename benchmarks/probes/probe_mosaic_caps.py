"""Mosaic capability probe (round 3): which dynamic-addressing forms
compile AND run correctly on this toolchain's TPU backend.

Each probe compiles + executes a tiny kernel and checks the result, so
we learn compile-crash vs silent-miscompile vs works.  Findings feed the
radix-partition group-by pipeline design (docs/sparse_groupby_shootout.md).
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        ok, msg = fn()
        print(f"{'PASS' if ok else 'WRONG'} {name}: {msg}")
    except Exception as e:
        s = str(e).replace("\n", " ")[:160]
        print(f"FAIL {name}: {type(e).__name__}: {s}")
    sys.stdout.flush()


# ---------- 1. dynamic sublane-offset VMEM read ----------
def p_dyn_read():
    def kernel(i_ref, x_ref, o_ref):
        r = i_ref[0]
        o_ref[...] = x_ref[pl.ds(r, 8), :]

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.array([24], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(idx, x)
    want = np.asarray(x)[24:32]
    return np.array_equal(np.asarray(out), want), "read x[ds(24),:]"


# ---------- 2. dynamic sublane-offset VMEM write ----------
def p_dyn_write():
    def kernel(i_ref, x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        r = i_ref[0]
        o_ref[pl.ds(r, 8), :] = x_ref[...]

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.array([24], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(idx, x)
    o = np.asarray(out)
    ok = np.array_equal(o[24:32], np.asarray(x)) and o[:24].sum() == 0 \
        and o[32:].sum() == 0
    return ok, "write o[ds(24),:]"


# ---------- 3. VMEM->HBM async copy, dynamic dst row offset ----------
def p_dma_out_dyn():
    def kernel(i_ref, x_ref, o_ref, sem):
        r = i_ref[0]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(jnp.int32(0), 8), :],
            o_ref.at[pl.ds(r, 8), :], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.array([40], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(idx, x)
    o = np.asarray(out)
    return np.array_equal(o[40:48], np.asarray(x)), "dma vmem->hbm dyn dst"


# ---------- 4. HBM->VMEM async copy, dynamic src row offset ----------
def p_dma_in_dyn():
    def kernel(i_ref, x_hbm, o_ref, scr, sem):
        r = i_ref[0]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r, 8), :], scr.at[pl.ds(jnp.int32(0), 8), :],
            sem)
        cp.start()
        cp.wait()
        o_ref[...] = scr[...]

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.array([16], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(idx, x)
    return np.array_equal(np.asarray(out), np.asarray(x)[16:24]), \
        "dma hbm->vmem dyn src"


# ---------- 5. VMEM->VMEM async copy, dynamic rows both sides ----------
def p_dma_vv_dyn():
    def kernel(i_ref, x_ref, o_ref, sem):
        o_ref[...] = jnp.zeros_like(o_ref)
        r = i_ref[0]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(r, 8), :], o_ref.at[pl.ds(r + 8, 8), :], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.array([8], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(idx, x)
    o = np.asarray(out)
    return np.array_equal(o[16:24], np.asarray(x)[8:16]), "dma v->v dyn"


# ---------- 6. dynamic_gather with data-dependent lane indices ----------
def p_data_gather():
    def kernel(s_ref, x_ref, o_ref):
        R = x_ref.shape[0]
        sh = s_ref[0]
        lanes = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        idx = (lanes + sh) & jnp.int32(127)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        o_ref[...] = lax.gather(
            x_ref[...], idx[:, :, None], dnums, (1, 1),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    sh = jnp.array([5], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(sh, x)
    xa = np.asarray(x)
    want = np.take_along_axis(
        xa, (np.arange(128)[None, :] + 5) % 128 * np.ones((8, 1), int), 1)
    return np.array_equal(np.asarray(out), want), "lane gather dyn shift"


# ---------- 7. dynamic trip-count fori_loop ----------
def p_dyn_loop():
    def kernel(s_ref, o_ref):
        k = s_ref[0]

        def body(i, acc):
            return acc + jnp.float32(2.0)

        acc = lax.fori_loop(jnp.int32(0), k, body, jnp.float32(0.0))
        o_ref[...] = jnp.full_like(o_ref, acc)

    k = jnp.array([7], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(k)
    return float(np.asarray(out)[0, 0]) == 14.0, "fori dyn trip"


# ---------- 8. SMEM carry across sequential grid steps ----------
def p_smem_carry():
    def kernel(x_ref, o_ref, cur_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cur_ref[0] = jnp.int32(0)

        c = cur_ref[0]
        o_ref[...] = jnp.full_like(o_ref, c)
        cur_ref[0] = c + jnp.int32(1) + x_ref[0, 0] * jnp.int32(0)

    x = jnp.ones((32, 128), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (jnp.int32(i),
                                                    jnp.int32(0)))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (jnp.int32(i),
                                                    jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)
    o = np.asarray(out)
    ok = all(np.all(o[8 * i:8 * i + 8] == i) for i in range(4))
    return ok, "smem scalar carried across grid"


# ---------- 9. output to ANY(HBM) with accumulated dyn-row DMAs ----------
def p_append():
    """The append pattern: each grid step DMAs its block at a running
    row cursor carried in SMEM."""
    def kernel(x_ref, o_ref, cur_ref, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cur_ref[0] = jnp.int32(0)

        c = cur_ref[0]
        nrows = jnp.int32(4) + jnp.int32(2) * jnp.int32(pl.program_id(0) == 1)
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(jnp.int32(0), 8), :],
            o_ref.at[pl.ds(c, 8), :], sem)
        cp.start()
        cp.wait()
        cur_ref[0] = c + nrows

    x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(32, 128)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (jnp.int32(i),
                                                    jnp.int32(0)))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((40, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    o = np.asarray(out)
    xa = np.asarray(x)
    # cursors: 0,4,10,14 ; each write is 8 rows, later overwrite earlier
    ok = (np.array_equal(o[0:4], xa[0:4])
          and np.array_equal(o[4:10], xa[8:14])
          and np.array_equal(o[10:14], xa[16:20])
          and np.array_equal(o[14:22], xa[24:32]))
    return ok, "sequential append w/ overwrite"


if __name__ == "__main__":
    for nm, fn in [
        ("dyn_vmem_read", p_dyn_read),
        ("dyn_vmem_write", p_dyn_write),
        ("dma_out_dyn_dst", p_dma_out_dyn),
        ("dma_in_dyn_src", p_dma_in_dyn),
        ("dma_vmem_vmem_dyn", p_dma_vv_dyn),
        ("data_lane_gather", p_data_gather),
        ("dyn_trip_fori", p_dyn_loop),
        ("smem_grid_carry", p_smem_carry),
        ("hbm_append_cursor", p_append),
    ]:
        run(nm, fn)
