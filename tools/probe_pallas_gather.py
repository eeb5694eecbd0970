"""Probe: which Pallas gather formulations compile on this axon/Mosaic stack?

Round-1 finding: `tpu.dynamic_gather` (jnp.take inside a kernel) crashes the
remote compiler. Round-2 finding: a per-row dynamic-slice load
``fm_ref[r, :]`` fails Mosaic's alignment prover ("cannot statically prove
that index in dimension 0 is a multiple of 8") — the dynamic index lands on
the tiled sublane dimension. These probes move the dynamic index to an
UNTILED leading dimension instead:

  A. table [N, 8, 128]: one logical row = one (8,128) block; per-sample
     ``fm_ref[r]`` indexes the untiled dim 0. f32 (8,128) = exactly 1 tile.
  B. table [N2, 16, 128] bf16 (1 tile = 2 packed 1024-ch rows): load
     ``fm_ref[r // 2, pl.ds(8 * (r % 2), 8), :]`` — sublane start 8*(r%2)
     is a provable multiple of 8.
  C. PrefetchScalarGridSpec block-index-map gather: grid step i's input
     block is selected by idx prefetched scalars (the "pipelined DMA"
     formulation) — 8 rows per grid step.

Run: python tools/probe_pallas_gather.py [A|B|C] [time]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

N = 1792           # table rows (sized to fit the default 16MB scoped VMEM)
M = int(os.environ.get("PROBE_M", 8192))  # samples per call
TILE = 256


def probe_a():
    """Dynamic index on untiled leading dim; one (8,128) f32 block per row."""

    def kernel(idx_ref, fm_ref, out_ref):
        i = pl.program_id(0)
        U = 8  # manual unroll (Mosaic's fori_loop only takes unroll=1|all)

        def body(t, _):
            for u in range(U):
                r = idx_ref[i * TILE + t * U + u]
                out_ref[t * U + u] = fm_ref[r]
            return 0

        jax.lax.fori_loop(0, TILE // U, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 8, 128), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(idx, fm):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, 8, 128), fm.dtype),
        )(idx, fm)

    def prep(fm_rows):  # [N, C<=1024] f32 -> [N, 8, 128]
        return jnp.asarray(fm_rows, jnp.float32).reshape(N, 8, 128)

    def post(out):
        return np.asarray(out).reshape(M, 1024)

    return run, prep, post


def probe_d():
    """bf16 production shape: one (16,128) tile = TWO packed 1024-ch rows
    (no sublane padding waste). The loop only does whole-tile dim-0 dynamic
    loads — the formulation Mosaic's alignment prover accepts — and the
    odd/even row select happens vectorized after the loop."""

    def kernel(idx_ref, sel_ref, fm_ref, out_ref, scratch):
        i = pl.program_id(0)
        U = 8

        def body(t, _):
            for u in range(U):
                r = idx_ref[i * TILE + t * U + u]
                scratch[t * U + u] = fm_ref[r // 2]
            return 0

        jax.lax.fori_loop(0, TILE // U, body, 0)
        # select the odd/even packed row per sample: sel[t] = idx % 2
        m = sel_ref[...]  # [TILE, 1, 1] bf16
        lo = scratch[:, 0:8, :]
        hi = scratch[:, 8:16, :]
        out_ref[...] = lo * (1.0 - m) + hi * m

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1, 1), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 8, 128), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, 16, 128), jnp.bfloat16)],
    )

    @jax.jit
    def run(idx, fm):
        sel = (idx % 2).astype(jnp.bfloat16).reshape(M, 1, 1)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, 8, 128), fm.dtype),
        )(idx, sel, fm)

    def prep(fm_rows):  # [N, 1024] -> [N//2, 16, 128] bf16
        return jnp.asarray(fm_rows, jnp.bfloat16).reshape(N // 2, 16, 128)

    def post(out):
        return np.asarray(out.astype(jnp.float32)).reshape(M, 1024)

    return run, prep, post


def probe_c():
    """Block-index-map gather: idx selects each grid step's input block."""
    R = 8  # rows per grid step

    def kernel(idx_ref, blk_ref, out_ref):
        out_ref[...] = blk_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // R,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i, idx: (idx[i], 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, idx: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(idx, fm):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M // R, 8, 128), fm.dtype),
        )(idx[::R].copy(), fm)

    def prep(fm_rows):
        return jnp.asarray(fm_rows, jnp.float32).reshape(N, 8, 128)

    def post(out):
        return np.asarray(out).reshape(M // R, 1024)

    return run, prep, post


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "A").upper()
    rng = np.random.RandomState(0)
    fm_rows = rng.randn(N, 1024).astype(np.float32)
    idx_np = rng.randint(0, N, M).astype(np.int32)
    idx = jnp.asarray(idx_np)

    run, prep, post = {"A": probe_a, "C": probe_c, "D": probe_d}[which]()
    fm = prep(fm_rows)
    out = post(run(idx, fm))
    if which == "C":
        ref = fm_rows[idx_np[::8]]
    else:
        ref = fm_rows[idx_np]
    ok = np.allclose(out, ref, atol=1e-2)
    print(f"probe {which}: compiled+ran, correct={ok}")

    if "time" in sys.argv:
        idxs = [jnp.asarray(rng.randint(0, N, M).astype(np.int32))
                for _ in range(8)]
        for x in idxs:
            x.block_until_ready()
        o = run(idxs[0], fm); float(jnp.sum(o.astype(jnp.float32)))
        ts = []
        for k in range(16):
            t0 = time.perf_counter()
            o = run(idxs[k % 8], fm)
            float(jnp.sum(o.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        rows = M if which != "C" else M // 8
        print(f"median dispatch {med*1e3:.3f} ms for {rows} rows "
              f"(incl ~26ms tunnel RTT — subtract before ns/row math)")


if __name__ == "__main__":
    main()
