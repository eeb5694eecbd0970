"""Planning target selection (TPU port of ``SparsePlanTarget`` /
``AlignPlanTarget``, `models/plan/target.py:83-163`, and the winner-take-all
helpers `plan/target.py:7-36`).

All shapes static; ``cmd`` selection is a gather, mode selection is an argmin
over cumulative-L2 distances.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_cls_target(
    reg_preds: jnp.ndarray, reg_target: jnp.ndarray, reg_weight: jnp.ndarray
) -> jnp.ndarray:
    """Winner-take-all mode index by min masked cumulative-L2.

    Args:
      reg_preds: [bs, 1, mode, ts, 2] per-step offsets.
      reg_target: [bs, 1, ts, 2]; reg_weight: [bs, 1, ts].
    Returns: [bs, 1] int32 mode index.
    """
    pred_cum = jnp.cumsum(reg_preds, axis=-2)
    tgt_cum = jnp.cumsum(reg_target, axis=-2)
    dist = jnp.linalg.norm(tgt_cum[:, :, None] - pred_cum, axis=-1)  # [bs,1,mode,ts]
    dist = (dist * reg_weight[:, :, None]).mean(axis=-1)
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def take_mode(reg_preds: jnp.ndarray, mode_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather one mode: [bs, 1, mode, ts, 2] x [bs, 1] -> [bs, 1, ts, 2]."""
    idx = mode_idx[..., None, None, None]
    idx = jnp.broadcast_to(idx, mode_idx.shape + (1,) + reg_preds.shape[-2:])
    return jnp.take_along_axis(reg_preds, idx, axis=2).squeeze(2)


def select_cmd(
    cls_pred: jnp.ndarray, reg_pred: jnp.ndarray, cmd_onehot: jnp.ndarray,
    ego_fut_cmd: int, ego_fut_ts: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice the active command's modes (`plan/target.py:104-117`).

    Args:
      cls_pred: [bs, 1, cmd*mode]; reg_pred: [bs, 1, cmd*mode, ts, 2].
    Returns:
      cls [bs, 1, mode], reg [bs, 1, mode, ts, 2].
    """
    bs = cls_pred.shape[0]
    if ego_fut_cmd == 1:
        return cls_pred, reg_pred
    cmd = jnp.argmax(cmd_onehot, axis=-1)  # [bs]
    cls_pred = cls_pred.reshape(bs, ego_fut_cmd, 1, -1)
    reg_pred = reg_pred.reshape(bs, ego_fut_cmd, 1, -1, ego_fut_ts, 2)
    bidx = jnp.arange(bs)
    return cls_pred[bidx, cmd], reg_pred[bidx, cmd]


def sparse_plan_target(
    cls_pred: jnp.ndarray,
    reg_pred: jnp.ndarray,
    gt_trajs: jnp.ndarray,
    gt_masks: jnp.ndarray,
    cmd_onehot: jnp.ndarray,
    ego_fut_cmd: int,
    ego_fut_ts: int,
):
    """``SparsePlanTarget.sample`` (`plan/target.py:95-121`).

    Args:
      cls_pred: [bs, 1, cmd*mode]; reg_pred: [bs, 1, cmd*mode, ts, 2] offsets.
      gt_trajs: [bs, ts, 2] per-step offsets; gt_masks: [bs, ts].
    Returns:
      (cls [bs,1,mode], cls_target [bs,1], cls_weight [bs,1],
       best_reg [bs,1,ts,2], gt [bs,1,ts,2], gt_mask [bs,1,ts])
    """
    gt = gt_trajs[:, None]
    gm = gt_masks[:, None]
    cls_pred, reg_pred = select_cmd(cls_pred, reg_pred, cmd_onehot, ego_fut_cmd, ego_fut_ts)
    cls_target = get_cls_target(reg_pred, gt, gm)
    cls_weight = jnp.any(gm > 0, axis=-1)
    best_reg = take_mode(reg_pred, cls_target)
    return cls_pred, cls_target, cls_weight, best_reg, gt, gm


def align_plan_target(
    cls_pred: jnp.ndarray,
    reg_pred: jnp.ndarray,
    gt_trajs: jnp.ndarray,
    gt_masks: jnp.ndarray,
    cmd_onehot: jnp.ndarray,
    ref_target: jnp.ndarray,
    ego_fut_cmd: int,
    ego_fut_ts: int,
):
    """``AlignPlanTarget.sample`` (`plan/target.py:140-163`): the positive mode
    is forced to the reference anchor-type's winning mode."""
    gt = gt_trajs[:, None]
    gm = gt_masks[:, None]
    cls_pred, reg_pred = select_cmd(cls_pred, reg_pred, cmd_onehot, ego_fut_cmd, ego_fut_ts)
    cls_weight = jnp.any(gm > 0, axis=-1)
    best_reg = take_mode(reg_pred, ref_target)
    return cls_pred, ref_target, cls_weight, best_reg, gt, gm
