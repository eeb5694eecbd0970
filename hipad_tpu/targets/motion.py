"""Motion-forecasting target assignment (TPU port of ``SparseMotionTarget``,
`models/motion/target.py:70-100`).

Reuses the detection Hungarian result (``col4gt`` from `targets.det`) exactly
like the reference reuses ``det_sampler.indices``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def motion_target(
    reg_pred: jnp.ndarray,
    gt_trajs: jnp.ndarray,
    gt_trajs_mask: jnp.ndarray,
    col4gt: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter agent futures onto matched anchors; WTA over modes.

    Args:
      reg_pred: [bs, P, mode, ts, 2] per-step offsets.
      gt_trajs: [bs, G, ts, 2] offsets; gt_trajs_mask: [bs, G, ts].
      col4gt: [bs, G] anchor index per GT (-1 invalid).

    Returns:
      (cls_target [bs,P], cls_weight [bs,P] bool, best_reg [bs,P,ts,2],
       reg_target [bs,P,ts,2], reg_weight [bs,P,ts], num_pos scalar)
    """
    bs, P, mode, ts, _ = reg_pred.shape
    safe_col = jnp.where(col4gt >= 0, col4gt, P)
    bidx = jnp.arange(bs)[:, None]
    reg_target = jnp.zeros((bs, P, ts, 2), reg_pred.dtype)
    reg_weight = jnp.zeros((bs, P, ts), reg_pred.dtype)
    reg_target = reg_target.at[bidx, safe_col].set(
        gt_trajs.astype(reg_pred.dtype), mode="drop"
    )
    reg_weight = reg_weight.at[bidx, safe_col].set(
        gt_trajs_mask.astype(reg_pred.dtype), mode="drop"
    )
    num_pos = jnp.sum(col4gt >= 0).astype(reg_pred.dtype)

    # WTA mode per anchor: same math as planning but vectorised over P anchors.
    pred_cum = jnp.cumsum(reg_pred, axis=-2)
    tgt_cum = jnp.cumsum(reg_target, axis=-2)
    dist = jnp.linalg.norm(tgt_cum[:, :, None] - pred_cum, axis=-1)  # [bs,P,mode,ts]
    dist = (dist * reg_weight[:, :, None]).mean(axis=-1)
    cls_target = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # [bs, P]
    cls_weight = jnp.any(reg_weight > 0, axis=-1)

    idx = cls_target[..., None, None, None]
    idx = jnp.broadcast_to(idx, (bs, P, 1, ts, 2))
    best_reg = jnp.take_along_axis(reg_pred, idx, axis=2).squeeze(2)
    return cls_target, cls_weight, best_reg, reg_target, reg_weight, num_pos
