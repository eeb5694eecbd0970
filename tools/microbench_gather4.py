"""Microbench v4: the decision set for the sampler redesign.

 1. Does a trivial Pallas kernel compile on the axon backend at all?
 2. XLA row-gather cost vs row width (packed-row designs ride on this).
 3. Sorted vs unsorted indices.
 4. Patch gather (2,2,C) row-unit cost check.
 5. Pallas DMA-pipelined row gather (HBM->VMEM make_async_copy per row).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 65536
ITERS = 32


def bench(fn, *args, iters=ITERS, n_rows=M):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(a[0], (a[1] + c) % a[2])
            return out.ravel()[0].astype(jnp.int32) % 1, out.ravel()[0]
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return ys.sum()

    r = run(*args); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(*args); r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, dt / n_rows * 1e9


# ---------------------------------------------------------------- 1. trivial
def trivial_pallas():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((256, 256), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        print(f"trivial pallas: ok={bool(jnp.all(out == 2.0))}")
        return True
    except Exception as e:
        print(f"trivial pallas FAILED: {type(e).__name__}: "
              f"{(str(e).splitlines() or [''])[0][:160]}")
        return False


# ----------------------------------------------------- 2. row width scaling
def row_width_scaling():
    HW = 14080
    for C in (256, 512, 1024, 2048):
        k = jax.random.PRNGKey(0)
        fm = jax.random.normal(k, (HW, C), jnp.bfloat16)
        idx = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, HW, jnp.int32)
        fn = lambda fm, idx: jnp.take(fm, idx, axis=0)
        dt, ns = bench(fn, fm, idx, jnp.int32(HW))
        print(f"row gather C={C:5d} ({C*2:5d} B): {dt*1e6:9.1f} us "
              f"{ns:6.2f} ns/row  {M*C*2/dt/1e9:7.1f} GB/s")


# ------------------------------------------------------------- 3. sortedness
def sortedness():
    HW = 14080
    C = 256
    k = jax.random.PRNGKey(0)
    fm = jax.random.normal(k, (HW, C), jnp.bfloat16)
    idx = jnp.sort(jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, HW,
                                      jnp.int32))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def g_sorted(fm, idx):
        return jax.lax.gather(fm, idx[:, None], dn, slice_sizes=(1, C),
                              indices_are_sorted=True,
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    dt, ns = bench(g_sorted, fm, idx, jnp.int32(1))  # +c then clamp keeps sorted
    print(f"sorted row gather C=256: {dt*1e6:9.1f} us {ns:6.2f} ns/row")

    # and the cost of sorting the keys
    keys = jax.random.randint(k, (M,), 0, HW, jnp.int32)
    vals = jnp.arange(M, dtype=jnp.int32)
    f = jax.jit(lambda a, b: jax.lax.sort_key_val(a, b))
    f(keys, vals)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(8):
        keys = f(keys, vals)[0]
    keys.block_until_ready()
    print(f"sort {M} int32 keys: {(time.perf_counter()-t0)/8*1e3:7.2f} ms")


# ---------------------------------------------------------- 4. patch gather
def patch_cost():
    H, W, C = 88, 160, 256
    k = jax.random.PRNGKey(0)
    fm = jax.random.normal(k, (H, W, C), jnp.bfloat16)
    sy = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, H - 2, jnp.int32)
    sx = jax.random.randint(jax.random.fold_in(k, 2), (M,), 0, W - 2, jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

    def g(fm, sy):
        starts = jnp.stack([sy, sx], axis=-1)
        return jax.lax.gather(fm, starts, dn, slice_sizes=(2, 2, C),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    dt, ns = bench(g, fm, sy, jnp.int32(H - 2))
    print(f"patch (2,2,{C}) gather: {dt*1e6:9.1f} us {ns:6.2f} ns/patch")


# ----------------------------------------------- 5. pallas DMA row pipeline
def pallas_dma_gather():
    HW, C = 14080, 256
    BLK = 2048
    SLOTS = 16
    k = jax.random.PRNGKey(0)
    fm = jax.random.normal(k, (HW, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, HW, jnp.int32)

    def kern(idx_ref, fm_ref, out_ref, scratch, sems):
        def issue(i, slot):
            return pltpu.make_async_copy(
                fm_ref.at[pl.ds(idx_ref[i], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        def warm(i, _):
            issue(i, i).start()
            return 0
        jax.lax.fori_loop(0, SLOTS, warm, 0)

        def body(i, _):
            slot = jax.lax.rem(i, SLOTS)
            issue(i, slot).wait()
            out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

            @pl.when(i + SLOTS < BLK)
            def _():
                issue(i + SLOTS, slot).start()
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)

    def fn(fm, idx):
        return pl.pallas_call(
            kern,
            grid=(M // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
            scratch_shapes=[
                pltpu.VMEM((SLOTS, C), fm.dtype),
                pltpu.SemaphoreType.DMA((SLOTS,)),
            ],
        )(idx, fm)

    try:
        out = jax.jit(fn)(fm, idx)
        ref = jnp.take(fm, idx, axis=0)
        ok = bool(jnp.allclose(out, ref))
        dt, ns = bench(fn, fm, idx, jnp.int32(HW))
        print(f"pallas DMA gather: ok={ok} {dt*1e6:9.1f} us {ns:6.2f} ns/row")
    except Exception as e:
        print(f"pallas DMA gather FAILED: {type(e).__name__}: "
              f"{(str(e).splitlines() or [''])[0][:200]}")


if __name__ == "__main__":
    ok = trivial_pallas()
    row_width_scaling()
    sortedness()
    patch_cost()
    if ok:
        pallas_dma_gather()
