"""Pure-jnp geometry used across the framework.

All functions here are shape-polymorphic, differentiable and jit-friendly
(static shapes, no data-dependent control flow). Behaviour is documented
against the reference PyTorch implementation under /root/reference (cited per
function) but the code is written TPU-first.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .box3d import COS_YAW, SIN_YAW, VX, W, X


def yaw_rotation_2d(sin_yaw: jnp.ndarray, cos_yaw: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, 2] rotation matrices from (sin, cos) pairs."""
    row0 = jnp.stack([cos_yaw, -sin_yaw], axis=-1)
    row1 = jnp.stack([sin_yaw, cos_yaw], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def project_points(
    key_points: jnp.ndarray,
    projection_mat: jnp.ndarray,
    image_wh: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Project 3D keypoints into every camera.

    Args:
      key_points: [bs, num_anchor, num_pts, 3] in the ego/lidar frame.
      projection_mat: [bs, num_cams, 4, 4] lidar->image projection.
      image_wh: [bs, num_cams, 2]; if given the result is normalised to [0,1].

    Returns:
      [bs, num_cams, num_anchor, num_pts, 2] image-plane points.

    Semantics follow `models/blocks.py:216-225`: homogeneous projection with
    the depth clamped from below at ``eps`` (points behind the camera map to
    huge coordinates and are later masked by the sampler's bounds check).
    """
    pts_h = jnp.concatenate([key_points, jnp.ones_like(key_points[..., :1])], axis=-1)
    # [bs, cams, 1, 1, 4, 4] @ [bs, 1, anchor, pts, 4, 1]
    proj = jnp.einsum("bcij,bapj->bcapi", projection_mat, pts_h)
    xy = proj[..., :2] / jnp.maximum(proj[..., 2:3], eps)
    if image_wh is not None:
        xy = xy / image_wh[:, :, None, None]
    return xy


def box_anchor_projection(
    anchor: jnp.ndarray,
    t_src2dst: jnp.ndarray,
    time_interval: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Warp 11-dim box anchors from a source ego frame to a destination frame.

    Args:
      anchor: [bs, n, 11] undecoded box state.
      t_src2dst: [bs, 4, 4] rigid transform.
      time_interval: optional [bs]; when given the centre is first moved by
        ``-velocity * time_interval`` (the reference passes the *negative*
        elapsed time so cached boxes advance along their velocity).

    Mirrors `models/det/blocks.py:250-296` (``anchor_projection``).
    """
    vel = anchor[..., VX:]
    center = anchor[..., X : X + 3]
    if time_interval is not None:
        center = center - vel * time_interval[:, None, None]
    rot = t_src2dst[:, None, :3, :3]
    trans = t_src2dst[:, None, :3, 3]
    center = jnp.einsum("bnij,bnj->bni", rot, center) + trans
    size = anchor[..., W : W + 3]
    # yaw: rotate the (cos, sin) direction vector by the planar rotation,
    # result stored back as (sin, cos)  (`det/blocks.py:286-290`).
    cs = jnp.stack([anchor[..., COS_YAW], anchor[..., SIN_YAW]], axis=-1)
    cs = jnp.einsum("bnij,bnj->bni", t_src2dst[:, None, :2, :2], cs)
    yaw = cs[..., ::-1]  # -> (sin, cos)
    vel = jnp.einsum("bnij,bnj->bni", rot, vel)
    return jnp.concatenate([center, size, yaw, vel], axis=-1)


def polyline_anchor_projection(
    anchor: jnp.ndarray,
    t_src2dst: jnp.ndarray,
    num_sample: int,
) -> jnp.ndarray:
    """Warp flattened 2D polyline anchors [bs, n, num_sample*2] by the planar
    part of a rigid transform (`models/map/blocks.py:246-265`)."""
    bs, n = anchor.shape[:2]
    pts = anchor.reshape(bs, n * num_sample, 2)
    rot = t_src2dst[:, None, :2, :2]
    trans = t_src2dst[:, None, :2, 3]
    pts = jnp.einsum("bnij,bnj->bni", rot, pts) + trans
    return pts.reshape(bs, n, num_sample * 2)


def sine_embed_2d(pos: jnp.ndarray, hidden_dim: int = 256) -> jnp.ndarray:
    """DAB-DETR 2D sine positional embedding.

    Args:
      pos: [..., 2] (x, y) positions.
    Returns:
      [..., hidden_dim] with layout cat(embed_y, embed_x) — matching
      `models/attention.py:292-306` (``gen_sineembed_for_position``).
    """
    half = hidden_dim // 2
    scale = 2.0 * math.pi
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / half)
    x = pos[..., 0:1] * scale / dim_t
    y = pos[..., 1:2] * scale / dim_t

    def interleave(v):
        s = jnp.sin(v[..., 0::2])
        c = jnp.cos(v[..., 1::2])
        return jnp.stack([s, c], axis=-1).reshape(v.shape[:-1] + (half,))

    return jnp.concatenate([interleave(y), interleave(x)], axis=-1)


def agent_to_lidar_trajs(trajs: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Rotate per-agent trajectories from the agent frame into the ego frame.

    Args:
      trajs: [bs, n, mode, ts, 2] agent-frame trajectories.
      boxes: [bs, n, 11] undecoded box states providing the yaw.

    Mirrors `models/sparse_onedecoder.py:428-440` (``_agent2lidar``): the
    einsum there right-multiplies by [[cos, sin], [-sin, cos]], i.e. rotates
    points by +yaw.
    """
    yaw = jnp.arctan2(boxes[..., SIN_YAW], boxes[..., COS_YAW])
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # p' = p @ [[cos, sin], [-sin, cos]]
    x = trajs[..., 0] * cos[:, :, None, None] - trajs[..., 1] * sin[:, :, None, None]
    y = trajs[..., 0] * sin[:, :, None, None] + trajs[..., 1] * cos[:, :, None, None]
    return jnp.stack([x, y], axis=-1)
