"""Keypoint generators: anchors -> 3D sampling points for deformable attention."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..configs.model import KeypointSpec, PointKeypointSpec
from ..core.box3d import COS_YAW, SIN_YAW, W, X
from ..core.geometry import yaw_rotation_2d


class BoxKeypoints(nn.Module):
    """Box-frame scale points (`models/det/blocks.py:159-224`).

    ``fix_scale`` points plus learnable offsets (sigmoid-0.5 of a linear
    head), scaled by the box size, rotated by yaw and translated to the box
    centre. The offsets input is the ANCHOR EMBED, not the instance feature:
    the reference calls ``kps_generator(anchor, anchor_embed,
    instance_feature)`` positionally (`blocks.py:134`) and the Box3D
    generator's second parameter is its ``instance_feature`` slot
    (det/blocks.py:183-188) — the deformable module passes the matching
    tensor (see ``DeformableAggregation.prepare``).
    """

    spec: KeypointSpec
    dtype: Optional[jnp.dtype] = None

    @property
    def num_pts(self) -> int:
        return len(self.spec.fix_scale) + self.spec.num_learnable

    @nn.compact
    def __call__(self, anchor: jnp.ndarray, instance_feature: jnp.ndarray) -> jnp.ndarray:
        bs, n = anchor.shape[:2]
        size = jnp.exp(anchor[..., None, W : W + 3])  # [bs, n, 1, 3]
        fix = jnp.asarray(np.array(self.spec.fix_scale, np.float32))
        pts = fix * size  # [bs, n, F, 3]
        if self.spec.num_learnable > 0:
            offs = nn.Dense(self.spec.num_learnable * 3, dtype=self.dtype, name="learnable_fc")(
                instance_feature
            )
            offs = nn.sigmoid(offs.reshape(bs, n, self.spec.num_learnable, 3)) - 0.5
            pts = jnp.concatenate([pts, offs * size], axis=-2)
        rot2 = yaw_rotation_2d(anchor[..., SIN_YAW], anchor[..., COS_YAW])  # [bs,n,2,2]
        xy = jnp.einsum("bnij,bnpj->bnpi", rot2, pts[..., :2])
        pts = jnp.concatenate([xy, pts[..., 2:3]], axis=-1)
        return pts + anchor[..., None, X : X + 3]


class PointKeypoints(nn.Module):
    """Polyline keypoints (`models/map/blocks.py:138-243`).

    Each of the anchor's ``num_sample`` 2D points spawns
    ``len(fix_height) * num_learnable`` keypoints: learnable 2D offsets from a
    linear head on the instance feature, z = ground_height + fix_height.
    """

    spec: PointKeypointSpec
    dtype: Optional[jnp.dtype] = None

    @property
    def num_pts(self) -> int:
        return self.spec.num_sample * len(self.spec.fix_height) * self.spec.num_learnable

    @nn.compact
    def __call__(self, anchor: jnp.ndarray, instance_feature: jnp.ndarray) -> jnp.ndarray:
        bs, n = anchor.shape[:2]
        s = self.spec
        nh, nl = len(s.fix_height), s.num_learnable
        base = anchor.reshape(bs, n, s.num_sample, 2)
        offs = nn.Dense(s.num_sample * nh * nl * 2, dtype=self.dtype, name="learnable_fc")(
            instance_feature
        ).reshape(bs, n, s.num_sample, nh, nl, 2)
        xy = offs + base[:, :, :, None, None, :]
        z = jnp.full(xy.shape[:-1] + (1,), s.ground_height, xy.dtype)
        z = z + jnp.asarray(np.array(s.fix_height, np.float32))[None, None, None, :, None, None]
        pts = jnp.concatenate([xy, z], axis=-1)
        return pts.reshape(bs, n, s.num_sample * nh * nl, 3)
