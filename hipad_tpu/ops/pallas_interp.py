"""Pallas kernel for dense bilinear-interpolation sampling (the "matmul
levels" of the deformable sampler).

The XLA formulation (`sampling.py:_interp_matmul_level`) materialises the
[B, M, H*W] interpolation operand in HBM (~0.9 GB at stage-2 level 2),
making the op bandwidth- not FLOP-bound (~18 ms for levels 2+3, ~8% MXU).
This kernel builds each [TILE, H*W] interp tile directly in VMEM from the
per-sample (px, py) coordinates — flat q = h*W + w indices via iota div/mod,
no 3D reshape — and feeds the MXU; the operand never exists in HBM.

Forward only; the custom_vjp wrapper in sampling.py replays the XLA
formulation for the backward.

Semantics identical to `_interp_matmul_level`: separable hat weights
``max(0, 1 - |p - iota|)`` reproduce bilinear interpolation with
out-of-bounds corners contributing zero (`deformable_aggregation_cuda.cu:
13-59` via the hat function's support).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _kernel(px_ref, py_ref, wg_ref, fm_ref, out_ref, *, H, W, G):
    px = px_ref[0, :, 0]  # [T]
    py = py_ref[0, :, 0]
    T = px.shape[0]
    C = fm_ref.shape[-1]
    HW = H * W
    # hat weights on the small [T, H] / [T, W] grids, then expand to the
    # flat [T, H*W] operand with one lane-repeat + one lane-tile + one
    # multiply — ~9x less VPU work than evaluating the hats per (t, q).
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (T, H), 1).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, None] - iota_h))  # [T, H]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, None] - iota_w))  # [T, W]
    # element-repeat wy W times via a tiny iota-built expansion matmul
    # (pltpu.repeat block-tiles, it does not element-repeat); block-tile wx
    # H times with pltpu.repeat.
    lane_hw = jax.lax.broadcasted_iota(jnp.int32, (H, H * W), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (H, H * W), 0)
    expand_h = (lane_hw // W == row_h).astype(jnp.float32)  # [H, H*W]
    wy_e = jnp.dot(wy, expand_h, preferred_element_type=jnp.float32)
    wx_e = pltpu.repeat(wx, H, axis=1)            # [T, W*H], block-tiled
    interp = wy_e * wx_e  # [T, HW]
    acc = jnp.dot(interp.astype(jnp.bfloat16), fm_ref[0],
                  preferred_element_type=jnp.float32)  # [T, C]
    # expand the per-group weight to per-channel via a tiny matmul against
    # an iota-built [G, C] block-diagonal expansion (Mosaic cannot reshape
    # the lane dim, so acc.reshape(T, G, C//G) is unavailable)
    wg = wg_ref[0]  # [T, G]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    expand = (lane // (C // G) == row).astype(jnp.float32)
    wg_c = jnp.dot(wg.astype(jnp.float32), expand,
                   preferred_element_type=jnp.float32)  # [T, C]
    out_ref[0] = (acc * wg_c).astype(out_ref.dtype)


def interp_matmul_pallas(fm, px, py, wg, groups: int):
    """fm [B, H, W, C]; px/py [B, M] pixel coords; wg [B, M, G] level-group
    weights (zero for out-of-bounds samples). Returns [B, M, G, C//G]."""
    B, H, W, C = fm.shape
    M = px.shape[1]
    G = groups
    pad = (-M) % TILE
    if pad:
        padv = jnp.full((B, pad), -10.0, px.dtype)
        px = jnp.concatenate([px, padv], axis=1)
        py = jnp.concatenate([py, padv], axis=1)
        wg = jnp.concatenate([wg, jnp.zeros((B, pad, G), wg.dtype)], axis=1)
    Mp = M + pad

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, G=G),
        grid=(B, Mp // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, G), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), wg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * H * W * C,
            bytes_accessed=B * (H * W * C * 2 + Mp * C * 2),
            transcendentals=0,
        ),
    )(px.astype(jnp.float32)[..., None], py.astype(jnp.float32)[..., None],
      wg, fm.reshape(B, H * W, C))
    # return PADDED [B, Mp, C]: slicing here forces a 260 MB copy of the
    # kernel output; callers reduce over cameras first and slice the 4x
    # smaller result (see sampling.py).
    return out
