"""Anchor encoders: box / polyline state -> query positional embeddings."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.box3d import COS_YAW, SIN_YAW, VX, W, X
from .common import MLPLN


class SparseBox3DEncoder(nn.Module):
    """Decoupled box encoder (`models/det/blocks.py:23-74`, "cat" mode).

    Separate MLP+LN stacks for position / size / yaw / velocity whose outputs
    are concatenated: 128 + 32 + 32 + 64 = 256 (stage2 config:202-210).
    """

    embed_dims: tuple = (128, 32, 32, 64)
    out_loops: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, box: jnp.ndarray) -> jnp.ndarray:
        pos = MLPLN(self.embed_dims[0], 1, self.out_loops, dtype=self.dtype, name="pos_fc")(
            box[..., X : X + 3]
        )
        size = MLPLN(self.embed_dims[1], 1, self.out_loops, dtype=self.dtype, name="size_fc")(
            box[..., W : W + 3]
        )
        yaw = MLPLN(self.embed_dims[2], 1, self.out_loops, dtype=self.dtype, name="yaw_fc")(
            box[..., (SIN_YAW, COS_YAW)]
        )
        vel = MLPLN(self.embed_dims[3], 1, self.out_loops, dtype=self.dtype, name="vel_fc")(
            box[..., VX : VX + 3]
        )
        return jnp.concatenate([pos, size, yaw, vel], axis=-1)


class SparsePoint3DEncoder(nn.Module):
    """Flattened-polyline encoder (`models/map/blocks.py:19-42`)."""

    embed_dims: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, anchor: jnp.ndarray) -> jnp.ndarray:
        return MLPLN(self.embed_dims, 1, 2, dtype=self.dtype, name="pos_fc")(anchor)


class KeyPoint3DEncoder(nn.Module):
    """Per-point + instance polyline encoder (`models/map/blocks.py:45-77`).

    Used instead of :class:`SparsePoint3DEncoder` when the decoder runs with
    point-expanded map/plan queries (``with_concat_map_points`` /
    ``with_deform_plan_points`` families): returns both the per-anchor
    instance embedding and a per-sample-point embedding
    ``[bs, n * num_sample, C]`` built from each point's (x, y).
    """

    embed_dims: int = 256
    num_sample: int = 6
    coords_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, anchor: jnp.ndarray):
        bs, n = anchor.shape[:2]
        pts = anchor.reshape(bs, n * self.num_sample, self.coords_dim)
        points_embed = MLPLN(self.embed_dims, 1, 2, dtype=self.dtype,
                             name="embed_points")(pts[..., :2])
        instance_embed = MLPLN(self.embed_dims, 1, 2, dtype=self.dtype,
                               name="embed_instance")(anchor)
        return instance_embed, points_embed
