"""Online-map target assignment (TPU port of ``SparsePoint3DTarget`` +
``HungarianLinesAssigner`` + ``MapQueriesCost``/``LinesL1Cost``,
`models/map/target.py:14-157`, `models/map/match_cost.py:7-106`).

GT polylines come with their full permutation set (cyclic/reverse orderings
precomputed by the vectorizer, `datasets/pipelines/vectorize.py:180-197`):
``gt_pts [bs, G, num_permute, num_pts, 2]``. The matching cost per (pred, gt)
is the min over permutations; the winning permutation's points become the
regression target.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .det import focal_cls_cost
from . import matching

LINE_COST_WEIGHT = 10.0
SMOOTH_L1_BETA = 0.01


def normalize_line(line: jnp.ndarray, roi_size: Tuple[float, float]) -> jnp.ndarray:
    """Map ROI-frame coordinates to (0, 1) (`map/target.py:64-79`).

    Args:
      line: [..., num_pts, 2].
    """
    origin = jnp.asarray([-roi_size[0] / 2, -roi_size[1] / 2], line.dtype)
    norm = jnp.asarray([roi_size[0] + 1e-5, roi_size[1] + 1e-5], line.dtype)
    return (line - origin) / norm


def _smooth_l1(diff: jnp.ndarray, beta: float) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def map_cost(
    cls_pred: jnp.ndarray,
    pts_pred: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_pts: jnp.ndarray,
    roi_size: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian cost + best-permutation index (see det.det_cost for why the
    cost is split out: layer-batched assignment).

    Returns: cost [bs, G, P], perm_idx [bs, P, G].
    """
    bs, P = cls_pred.shape[:2]
    G, n_perm, n_pts, _ = gt_pts.shape[1:]
    pred_n = normalize_line(pts_pred.reshape(bs, P, n_pts, 2), roi_size)
    gt_n = normalize_line(gt_pts, roi_size)

    # Smooth-L1 line cost, min over permutations (`match_cost.py:42-56`).
    diff = pred_n[:, :, None, None] - gt_n[:, None]  # [bs, P, G, perm, pts, 2]
    dist = _smooth_l1(diff, SMOOTH_L1_BETA).sum(axis=(-1, -2)) / n_pts
    reg_cost, perm_idx = dist.min(axis=-1), dist.argmin(axis=-1)  # [bs, P, G]
    reg_cost = reg_cost * LINE_COST_WEIGHT

    cls_cost = focal_cls_cost(cls_pred, gt_labels, weight=1.0)
    cost = cls_cost + jnp.transpose(reg_cost, (0, 2, 1))  # [bs, G, P]
    return cost, perm_idx


def map_target(
    cls_pred: jnp.ndarray,
    pts_pred: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_pts: jnp.ndarray,
    gt_mask: jnp.ndarray,
    num_cls: int,
    roi_size: Tuple[float, float],
    col4gt: jnp.ndarray = None,
    perm_idx: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Match GT polylines to map queries, permutation-invariantly.

    Args:
      cls_pred: [bs, P, num_cls] logits.
      pts_pred: [bs, P, num_pts*2] polylines (ROI frame).
      gt_labels: [bs, G] int labels.
      gt_pts: [bs, G, num_permute, num_pts, 2].
      gt_mask: [bs, G] bool.
      col4gt: optional precomputed assignment (layer-batched path).
      perm_idx: optional precomputed best-permutation index [bs, P, G] from
        the :func:`map_cost` call that produced ``col4gt`` — supplying both
        skips rebuilding the [bs, P, G, perm, pts, 2] distance tensor.

    Returns:
      cls_target [bs, P] int32, pts_target [bs, P, num_pts*2] (best permutation,
      ROI frame), reg_weights [bs, P, num_pts*2] (1 where matched).
    """
    bs, P = cls_pred.shape[:2]
    G, n_perm, n_pts, _ = gt_pts.shape[1:]
    if col4gt is None or perm_idx is None:
        cost, perm_idx = map_cost(cls_pred, pts_pred, gt_labels, gt_pts,
                                  roi_size)
        if col4gt is None:
            col4gt = matching.assign(cost, gt_mask)

    safe_col = jnp.where(col4gt >= 0, col4gt, P)
    bidx = jnp.arange(bs)[:, None]
    gidx = jnp.arange(G)[None, :]
    best_perm = perm_idx[bidx, safe_col.clip(0, P - 1), gidx]  # [bs, G]
    chosen = gt_pts[bidx, gidx, best_perm].reshape(bs, G, n_pts * 2)

    cls_target = jnp.full((bs, P), num_cls, jnp.int32)
    pts_target = jnp.zeros((bs, P, n_pts * 2), pts_pred.dtype)
    reg_weights = jnp.zeros((bs, P, n_pts * 2), pts_pred.dtype)
    cls_target = cls_target.at[bidx, safe_col].set(gt_labels.astype(jnp.int32), mode="drop")
    pts_target = pts_target.at[bidx, safe_col].set(chosen.astype(pts_pred.dtype), mode="drop")
    reg_weights = reg_weights.at[bidx, safe_col].set(1.0, mode="drop")
    return cls_target, pts_target, reg_weights
