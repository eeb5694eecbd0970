"""Detection + motion post-processing.

TPU rework of ``SparseBox3DDecoder`` (`models/det/decoder.py:23-107`) and
``SparseMotionDecoder`` (`models/motion/decoder.py:380-473`): everything is
batched jnp with a *static* top-k — score thresholding returns a mask instead
of dynamically-shaped outputs. A thin numpy layer (`postprocess/__init__.py`)
converts to the reference's per-sample result dicts.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.box3d import CNS, decode_box


def decode_det(
    cls_scores: jnp.ndarray,
    box_preds: jnp.ndarray,
    instance_id: Optional[jnp.ndarray] = None,
    quality: Optional[jnp.ndarray] = None,
    num_output: int = 300,
    score_threshold: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Top-k boxes with centerness rescoring.

    With ``instance_id`` given the reference "squeezes" classes first
    (max over classes -> one score per anchor, `det/decoder.py:44-50`); the
    shipped config tracks ids, so that is the primary path. Without ids the
    (anchor, class) product is ranked instead.

    Args:
      cls_scores: [bs, P, num_cls] last-layer logits.
      box_preds: [bs, P, 11].
      quality: [bs, P, 2] or None.
    Returns dict of [bs, num_output, ...]: boxes_3d (decoded 10-dim),
      scores_3d, labels_3d, cls_scores (pre-rescore), instance_ids, valid.
    """
    prob = jax.nn.sigmoid(cls_scores)
    bs, P, num_cls = prob.shape
    squeeze_cls = instance_id is not None
    num_output = min(num_output, P if squeeze_cls else P * num_cls)

    if squeeze_cls:
        scores, cls_ids = prob.max(axis=-1), prob.argmax(axis=-1)
        topv, topi = jax.lax.top_k(scores, num_output)  # anchor indices
        anchor_idx = topi
        labels = jnp.take_along_axis(cls_ids, topi, axis=1)
    else:
        flat = prob.reshape(bs, P * num_cls)
        topv, topi = jax.lax.top_k(flat, num_output)
        anchor_idx = topi // num_cls
        labels = (topi % num_cls).astype(jnp.int32)

    scores_origin = topv
    if quality is not None:
        cns = jnp.take_along_axis(quality[..., CNS], anchor_idx, axis=1)
        rescored = topv * jax.nn.sigmoid(cns)
        order = jnp.argsort(-rescored, axis=1)
        topv = jnp.take_along_axis(rescored, order, axis=1)
        scores_origin = jnp.take_along_axis(scores_origin, order, axis=1)
        anchor_idx = jnp.take_along_axis(anchor_idx, order, axis=1)
        labels = jnp.take_along_axis(labels, order, axis=1)

    boxes = jnp.take_along_axis(box_preds, anchor_idx[..., None], axis=1)
    out = {
        "boxes_3d": decode_box(boxes),
        "scores_3d": topv,
        "labels_3d": labels.astype(jnp.int32),
        "cls_scores": scores_origin,
        "anchor_idx": anchor_idx,
    }
    if instance_id is not None:
        out["instance_ids"] = jnp.take_along_axis(instance_id, anchor_idx, axis=1)
    if score_threshold is not None:
        out["valid"] = topv >= score_threshold
    else:
        out["valid"] = jnp.ones_like(topv, bool)
    return out


def decode_motion(
    det_result: Dict[str, jnp.ndarray],
    motion_cls: jnp.ndarray,
    motion_reg: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per kept detection: cumulative multi-mode trajectories in the ego frame
    (`motion/decoder.py:446-460`).

    Args:
      det_result: output of ``decode_det`` (provides anchor_idx + boxes).
      motion_cls: [bs, P, mode] last-layer logits.
      motion_reg: [bs, P, mode, ts, 2] per-step offsets.
    """
    anchor_idx = det_result["anchor_idx"]
    traj = jnp.take_along_axis(
        motion_reg, anchor_idx[..., None, None, None], axis=1
    )
    traj_cls = jnp.take_along_axis(
        jax.nn.sigmoid(motion_cls), anchor_idx[..., None], axis=1
    )
    traj = jnp.cumsum(traj, axis=-2) + det_result["boxes_3d"][:, :, None, None, :2]
    return {"trajs_3d": traj, "trajs_score": traj_cls}
