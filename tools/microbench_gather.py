"""Microbenchmark: Pallas VMEM dynamic gather vs XLA gather on the real TPU.

Question: can a Pallas kernel gather feature rows from a VMEM-resident map
faster than XLA's ~17 ns/row HBM gather?  Tests several formulations because
Mosaic's dynamic-gather support is version-sensitive on this stack.

Timing: in-jit lax.scan with a data dependency between iterations (the axon
tunnel dedupes identical dispatches; see .claude/skills/verify/SKILL.md).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 88, 160, 256  # stride-4 level, one camera
M = 32768               # samples
BLK = 512
ITERS = 32


def timeit(fn, *args):
    """In-jit scan timing with a carried data dependency."""

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a[:-1], a[-1] + carry.astype(a[-1].dtype))
            return out.ravel()[0].astype(jnp.int32) % 1, out.ravel()[0]
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return ys.sum()

    r = run(*args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def make_inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    fm = jax.random.normal(k, (H * W, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, H * W - W - 2,
                             jnp.int32)
    return fm, idx


# ---------------------------------------------------------------- XLA gather
def xla_gather(fm, idx):
    return jnp.take(fm, idx, axis=0)


# ------------------------------------------------------- pallas jnp.take row
def _take_kernel(idx_ref, fm_ref, out_ref):
    out_ref[:] = jnp.take(fm_ref[:], idx_ref[:], axis=0)


def pallas_take(fm, idx):
    grid = (M // BLK,)
    return pl.pallas_call(
        _take_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((H * W, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
    )(idx, fm)


# ------------------------------------------- pallas take with VMEM index vec
def _take_kernel_v(idx_ref, fm_ref, out_ref):
    out_ref[:] = jnp.take(fm_ref[:], idx_ref[:], axis=0)


def pallas_take_vmem_idx(fm, idx):
    grid = (M // BLK,)
    return pl.pallas_call(
        _take_kernel_v,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((H * W, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
    )(idx, fm)


# -------------------------------------------------- pallas fori dynamic slice
def _loop_kernel(idx_ref, fm_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = fm_ref[idx_ref[i], :]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def pallas_loop(fm, idx):
    grid = (M // BLK,)
    return pl.pallas_call(
        _loop_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((H * W, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
    )(idx, fm)


# ------------------------------------------------- take_along_axis 2d variant
def _taa_kernel(idx_ref, fm_ref, out_ref):
    idx2 = idx_ref[:].reshape(BLK, 1)
    out_ref[:] = jnp.take_along_axis(fm_ref[:], idx2, axis=0)


def pallas_taa(fm, idx):
    grid = (M // BLK,)
    return pl.pallas_call(
        _taa_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((H * W, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), fm.dtype),
    )(idx, fm)


def main():
    fm, idx = make_inputs()
    ns_per_row = lambda dt: dt / M * 1e9
    results = {}
    for name, fn in [
        ("xla_gather", xla_gather),
        ("pallas_take_smem_idx", pallas_take),
        ("pallas_take_vmem_idx", pallas_take_vmem_idx),
        ("pallas_taa_vmem_idx", pallas_taa),
        ("pallas_loop", pallas_loop),
    ]:
        try:
            out = jax.jit(fn)(fm, idx)
            ref = jnp.take(fm, idx, axis=0)
            ok = bool(jnp.allclose(out, ref))
            dt = timeit(fn, fm, idx)
            results[name] = (ok, dt)
            print(f"{name:26s} ok={ok} {dt*1e6:9.1f} us  {ns_per_row(dt):7.2f} ns/row")
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"{name:26s} FAILED: {type(e).__name__}: {msg}")
    return results


if __name__ == "__main__":
    main()
