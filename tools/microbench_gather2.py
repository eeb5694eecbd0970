"""Microbenchmark v2: find a Mosaic-compilable vectorized VMEM gather."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 88, 160, 256
M = 32768
BLK = 512
ITERS = 32


def timeit(fn, fm, idx):
    @jax.jit
    def run(fm, idx):
        def body(carry, _):
            out = fn(fm, (idx + carry) % (H * W - W - 2))
            return out.ravel()[0].astype(jnp.int32) % 1, out.ravel()[0]
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return ys.sum()

    r = run(fm, idx); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(fm, idx); r.block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def make_inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    fm = jax.random.normal(k, (H * W, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, H * W - W - 2,
                             jnp.int32)
    return fm, idx


def pcall(kernel, idx_space=pltpu.VMEM, idx_shape=(BLK,)):
    def f(fm, idx):
        if len(idx_shape) == 2 and idx.ndim == 1:
            idx = jnp.broadcast_to(idx[:, None], (M, idx_shape[1]))
        blk = tuple((BLK if s == BLK else s) for s in idx_shape)
        return pl.pallas_call(
            kernel,
            grid=(M // BLK,),
            in_specs=[
                pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1),
                             memory_space=idx_space),
                pl.BlockSpec((H * W, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
        )(idx, fm)
    return f


# take_along_axis with indices broadcast to [BLK, C]
def k_taa_full(idx_ref, fm_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(fm_ref[:], idx_ref[:], axis=0)


# lax.gather explicit
def k_lax_gather(idx_ref, fm_ref, out_ref):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    out_ref[:] = jax.lax.gather(
        fm_ref[:], idx_ref[:].reshape(BLK, 1), dn, slice_sizes=(1, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


# fori_loop with pl.ds row slice (idx from VMEM scalar read)
def k_loop_ds(idx_ref, fm_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = fm_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0, unroll=4)


variants = [
    ("taa_idx_full_bcast", pcall(k_taa_full, idx_shape=(BLK, C))),
    ("lax_gather_rows", pcall(k_lax_gather, idx_shape=(BLK,))),
    ("loop_pl_ds", pcall(k_loop_ds, idx_shape=(BLK,), idx_space=pltpu.SMEM)),
]


def main():
    fm, idx = make_inputs()
    ref = jnp.take(fm, idx, axis=0)
    for name, fn in variants:
        try:
            out = jax.jit(fn)(fm, idx)
            ok = bool(jnp.allclose(out, ref))
            dt = timeit(fn, fm, idx)
            print(f"{name:24s} ok={ok} {dt*1e6:9.1f} us  {dt/M*1e9:7.2f} ns/row")
        except Exception as e:
            msg = (str(e).splitlines() or [""])[0][:200]
            print(f"{name:24s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
