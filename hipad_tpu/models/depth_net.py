"""Dense depth auxiliary head (training-time supervision only).

Mirrors the reference ``DenseDepthNet`` (`models/blocks.py:267-325`): a 1x1
conv per FPN level predicts exp-depth, scaled by focal / equal_focal; the loss
is a masked mean-absolute error against projected LiDAR depth.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseDepthNet(nn.Module):
    num_depth_layers: int = 3
    equal_focal: float = 100.0
    max_depth: float = 60.0
    loss_weight: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feature_maps: Sequence[jnp.ndarray], focal: Optional[jnp.ndarray] = None):
        """feature_maps: per-level [bs, cams, H, W, C]; focal: [bs, cams]."""
        depths = []
        for i, feat in enumerate(feature_maps[: self.num_depth_layers]):
            bs, cams = feat.shape[:2]
            x = feat.reshape((bs * cams,) + feat.shape[2:]).astype(jnp.float32)
            d = nn.Conv(1, (1, 1), dtype=jnp.float32, name=f"depth_conv_{i}")(x)
            d = jnp.exp(d)
            if focal is not None:
                d = d * (focal.reshape(-1)[:, None, None, None] / self.equal_focal)
            depths.append(d.reshape((bs, cams) + d.shape[1:]))
        return depths

    def loss(self, depth_preds, gt_depths):
        return dense_depth_loss(depth_preds, gt_depths,
                                max_depth=self.max_depth,
                                loss_weight=self.loss_weight)


def dense_depth_loss(depth_preds, gt_depths, max_depth: float = 60.0,
                     loss_weight: float = 0.2):
    """Masked L1; gt <= 0 marks invalid pixels (`models/blocks.py:306-325`).

    Standalone (not a module method) so the training loss can call it without
    being inside ``apply``.
    """
    total = 0.0
    for pred, gt in zip(depth_preds, gt_depths):
        pred = pred.reshape(-1)
        gt = gt.reshape(-1)
        fg = (gt > 0.0) & jnp.isfinite(pred)
        pred = jnp.clip(jnp.where(fg, pred, 0.0), 0.0, max_depth)
        err = jnp.abs(pred - jnp.where(fg, gt, 0.0)).sum()
        total = total + err / jnp.maximum(1.0, fg.sum() * len(depth_preds)) * loss_weight
    return total
