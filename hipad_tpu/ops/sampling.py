"""Multi-camera multi-scale deformable feature sampling (XLA reference).

This is the TPU-native equivalent of the reference's hand-written CUDA op
``deformable_aggregation_ext`` (`ops/src/deformable_aggregation_cuda.cu:129-187`):
for every (anchor, keypoint, camera, level) it bilinearly samples a feature
pyramid at a normalised 2D location, multiplies by a per-(point, camera,
level, group) weight, and accumulates into a per-anchor feature vector.

Design notes (TPU-first):
  * Feature maps stay as a list of per-level ``[bs, cams, H, W, C]`` NHWC
    tensors. The reference's flattened "column" format + scale_start_index
    bookkeeping (`ops/__init__.py:33-103`) exists only to feed a single CUDA
    kernel; on TPU, per-level XLA gathers fuse fine and keep shapes static.
  * Out-of-bounds handling is masking, not early-exit: samples with a
    normalised location outside the open interval (0, 1) get weight zero
    (semantics of `.cu:169-171`), and each bilinear corner outside the map
    contributes zero (semantics of `bilinear_sampling`, `.cu:13-59`).
  * The group-weighted reduction is one einsum per (level, corner) so the
    full [.., C]-broadcast weight tensor is never materialised.

This function is the *oracle* for the Pallas kernel in ``pallas_daf.py`` and
is itself fully differentiable (XLA derives gathers' scatter-add adjoints,
no atomics involved).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def deformable_aggregation(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted multi-view multi-scale bilinear sampling.

    Args:
      feature_maps: per-level tensors ``[bs, cams, H_l, W_l, C]``.
      points_2d: ``[bs, anchor, pts, cams, 2]`` sampling locations normalised
        to [0, 1] in (x, y) order.
      weights: ``[bs, anchor, pts, cams, levels, groups]`` softmax weights;
        channels are split into ``groups`` contiguous blocks.

    Returns:
      ``[bs, anchor, C]`` aggregated features in the weights' dtype.
    """
    bs, num_anchor, num_pts, num_cams, _ = points_2d.shape
    num_levels = len(feature_maps)
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    group_dims = channels // groups

    # Mask samples outside the open unit square once for all levels.
    inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)  # [b,a,p,c]

    # [b, cams, anchor, pts]
    x = jnp.transpose(points_2d[..., 0], (0, 3, 1, 2))
    y = jnp.transpose(points_2d[..., 1], (0, 3, 1, 2))
    inside = jnp.transpose(inside, (0, 3, 1, 2))
    # weights -> [b, cams, anchor, pts, levels, groups]
    w = jnp.transpose(weights, (0, 3, 1, 2, 4, 5))

    out = jnp.zeros((bs, num_anchor, channels), dtype=weights.dtype)
    for lvl in range(num_levels):
        feat = feature_maps[lvl]
        h_l, w_l = feat.shape[2], feat.shape[3]
        fm = feat.reshape(bs * num_cams, h_l * w_l, channels)

        px = x * w_l - 0.5
        py = y * h_l - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        w_lvl = w[..., lvl, :] * inside[..., None]  # [b,c,a,p,G]

        for dy, dx, cw in (
            (0, 0, (1.0 - fy) * (1.0 - fx)),
            (0, 1, (1.0 - fy) * fx),
            (1, 0, fy * (1.0 - fx)),
            (1, 1, fy * fx),
        ):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            idx = jnp.clip(yi, 0, h_l - 1) * w_l + jnp.clip(xi, 0, w_l - 1)
            idx = idx.reshape(bs * num_cams, num_anchor * num_pts)
            gathered = jnp.take_along_axis(fm, idx[:, :, None], axis=1)
            gathered = gathered.reshape(bs, num_cams, num_anchor, num_pts, groups, group_dims)
            corner_w = (cw * valid).astype(weights.dtype)[..., None] * w_lvl
            out = out + jnp.einsum(
                "bcapgd,bcapg->bagd", gathered.astype(weights.dtype), corner_w
            ).reshape(bs, num_anchor, channels)
    return out


def front_view_feature(feature_maps: List[jnp.ndarray], level: int = -1, cam: int = 0) -> jnp.ndarray:
    """Grab one camera's map at one pyramid level: ``[bs, H, W, C]``.

    Replaces the reference's ``feature_maps_format(inverse=True)`` round-trip
    used by the ego/plan instance banks (`ops/__init__.py:34-65`,
    `models/ego/instance_bank.py:122-134`).
    """
    return feature_maps[level][:, cam]
