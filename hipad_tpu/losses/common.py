"""Elementary weighted losses (jnp ports of the mmdet losses the reference
wires in `projects/configs/hipad_b2d_stage2.py:462-476`).

Conventions match mmdet: ``weight`` multiplies elementwise, ``avg_factor``
replaces the mean denominator when given. All functions reduce to a scalar.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight, avg_factor) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean() if loss.size else jnp.float32(0.0)
    return loss.sum() / jnp.maximum(avg_factor, 1e-12)


def l1_loss(pred, target, weight=None, avg_factor=None, loss_weight=1.0):
    return _reduce(jnp.abs(pred - target), weight, avg_factor) * loss_weight


def smooth_l1_loss(pred, target, beta=1.0, weight=None, avg_factor=None, loss_weight=1.0):
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _reduce(loss, weight, avg_factor) * loss_weight


def bce_with_logits(pred, target, weight=None, avg_factor=None, loss_weight=1.0):
    """Sigmoid cross-entropy (mmdet ``CrossEntropyLoss(use_sigmoid=True)``)."""
    loss = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return _reduce(loss, weight, avg_factor) * loss_weight


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weight: Optional[jnp.ndarray] = None,
    avg_factor=None,
    loss_weight: float = 1.0,
):
    """mmdet sigmoid FocalLoss. ``target`` holds int labels in [0, num_classes];
    ``num_classes`` means background (no positive channel).

    Args:
      logits: [N, num_classes]; target: [N] int; weight: [N] or None.
    """
    t = jax.nn.one_hot(target, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce  # [N, num_classes]
    if weight is not None:
        loss = loss * weight[..., None]
    if avg_factor is None:
        return loss.mean() * loss_weight
    return loss.sum() / jnp.maximum(avg_factor, 1e-12) * loss_weight


def binary_focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weight=None,
    avg_factor=None,
    loss_weight: float = 1.0,
):
    """Focal loss with a single binary channel per mode slot; ``target`` is a
    float {0,1} tensor of the same shape as ``logits`` (used by plan/motion
    cls where the positive is the WTA mode)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * target + (1.0 - p) * (1.0 - target)
    alpha_t = alpha * target + (1.0 - alpha) * (1.0 - target)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce
    return _reduce(loss, weight, avg_factor) * loss_weight


def gaussian_focal_loss(
    pred_sigmoid: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 2.0,
    gamma: float = 4.0,
    weight=None,
    avg_factor=None,
    loss_weight: float = 1.0,
    eps: float = 1e-12,
):
    """mmdet ``GaussianFocalLoss`` (used for yawness; binary targets here).

    ``pred_sigmoid`` is already a probability (the reference sigmoids yns
    before the loss, `det/losses.py:73`).
    """
    pos = -jnp.log(pred_sigmoid + eps) * (1 - pred_sigmoid) ** alpha * (target == 1)
    neg = (
        -jnp.log(1 - pred_sigmoid + eps)
        * pred_sigmoid**alpha
        * (1 - target) ** gamma
        * (target != 1)
    )
    return _reduce(pos + neg, weight, avg_factor) * loss_weight
