"""Deformable feature aggregation orchestrator (`models/blocks.py:45-264`).

keypoints -> camera projection -> camera-conditioned softmax weights ->
multi-view multi-scale bilinear sampling -> output projection with "cat"
residual (doubling the width, later squeezed by the AsymmetricFFN).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import project_points
from ..ops.sampling import deformable_aggregation
from .common import MLPLN
from .keypoints import BoxKeypoints, PointKeypoints


class DeformableAggregation(nn.Module):
    embed_dims: int
    num_groups: int
    num_levels: int
    num_cams: int
    kps: Union[BoxKeypoints, PointKeypoints]  # submodule (passed constructed)
    attn_drop: float = 0.15
    residual_mode: str = "cat"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        instance_feature: jnp.ndarray,  # [bs, n, C]
        anchor: jnp.ndarray,
        anchor_embed: jnp.ndarray,
        feature_maps: Sequence[jnp.ndarray],  # per level [bs, cams, H, W, C]
        projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
        image_wh: jnp.ndarray,  # [bs, cams, 2]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bs, n = instance_feature.shape[:2]
        key_points = self.kps(anchor, instance_feature)  # [bs, n, P, 3]
        num_pts = key_points.shape[2]

        # --- camera-conditioned sampling weights (`blocks.py:178-214`) -----
        cam_embed = MLPLN(self.embed_dims, 1, 2, dtype=self.dtype, name="camera_encoder")(
            projection_mat[:, :, :3, :].reshape(bs, self.num_cams, 12)
        )
        feat = (instance_feature + anchor_embed)[:, :, None] + cam_embed[:, None]
        # weights_fc is zero-init so initial weights are uniform post-softmax
        # (`blocks.py:120-122`, constant_init(weights_fc, 0)).
        w = nn.Dense(
            self.num_groups * self.num_levels * num_pts,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="weights_fc",
        )(feat)  # [bs, n, cams, G*L*P]
        w = w.reshape(bs, n, self.num_cams * self.num_levels * num_pts, self.num_groups)
        w = jax.nn.softmax(w, axis=-2)
        w = w.reshape(bs, n, self.num_cams, self.num_levels, num_pts, self.num_groups)

        if self.attn_drop > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = (
                jax.random.uniform(rng, (bs, n, self.num_cams, 1, num_pts, 1))
                > self.attn_drop
            )
            w = w * keep / (1.0 - self.attn_drop)

        # [bs, n, P, cams, L, G]
        w = jnp.transpose(w, (0, 1, 4, 2, 3, 5))

        pts2d = project_points(key_points, projection_mat, image_wh)  # [bs,cams,n,P,2]
        pts2d = jnp.transpose(pts2d, (0, 2, 3, 1, 4))  # [bs, n, P, cams, 2]

        features = deformable_aggregation(feature_maps, pts2d, w)  # [bs, n, C]
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(features)
        if self.residual_mode == "add":
            return out + instance_feature
        return jnp.concatenate([out, instance_feature], axis=-1)
