"""3D box state layout and encode/decode helpers.

The undecoded 11-dim box state layout follows the reference
(`projects/mmdet3d_plugin/core/box3d.py:1-3`):

    [x, y, z, log(w), log(l), log(h), sin(yaw), cos(yaw), vx, vy, vz]

Quality estimation channels are (centerness, yawness). A *decoded* box is
``[x, y, z, w, l, h, yaw, vx, vy, vz]`` with sizes exponentiated and yaw as an
angle (``YAW = 6`` in decoded layout).
"""

from __future__ import annotations

import jax.numpy as jnp

# Undecoded state indices.
X, Y, Z, W, L, H, SIN_YAW, COS_YAW, VX, VY, VZ = range(11)
STATE_DIM = 11

# Quality indices.
CNS, YNS = 0, 1

# Decoded box: yaw angle index.
YAW = 6


def decode_box(box: jnp.ndarray) -> jnp.ndarray:
    """Undecoded 11-dim state -> decoded 10-dim box.

    Mirrors the reference decode (`models/det/decoder.py:9-21`):
    sizes are exponentiated, (sin, cos) collapse to an angle.
    """
    yaw = jnp.arctan2(box[..., SIN_YAW], box[..., COS_YAW])
    return jnp.concatenate(
        [
            box[..., (X, Y, Z)],
            jnp.exp(box[..., (W, L, H)]),
            yaw[..., None],
            box[..., VX:],
        ],
        axis=-1,
    )


def encode_box(box: jnp.ndarray) -> jnp.ndarray:
    """Decoded GT box [x,y,z,w,l,h,yaw,(vel...)] -> 11-dim training target.

    Mirrors `models/det/target.py:47-64` (``encode_reg_target``).
    """
    return jnp.concatenate(
        [
            box[..., 0:3],
            jnp.log(jnp.maximum(box[..., 3:6], 1e-12)),
            jnp.sin(box[..., YAW])[..., None],
            jnp.cos(box[..., YAW])[..., None],
            box[..., YAW + 1 :],
        ],
        axis=-1,
    )


def box3d_to_corners(box3d: jnp.ndarray) -> jnp.ndarray:
    """Decoded boxes [..., >=7] -> 8 corners [..., 8, 3].

    Corner ordering matches the reference numpy helper
    (`models/motion/decoder.py:69-86`): unravel of arange(8) over [2,2,2]
    reordered by [0,1,3,2,4,5,7,6], centered at the box origin (0.5,0.5,0.5).
    """
    import numpy as np

    corners_norm = np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1)
    corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]].astype(np.float32) - 0.5
    corners_norm = jnp.asarray(corners_norm)  # [8, 3]

    wlh = box3d[..., None, 3:6]  # [..., 1, 3]
    corners = wlh * corners_norm  # [..., 8, 3]

    yaw = box3d[..., YAW]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    rot = jnp.stack(
        [
            jnp.stack([cos, -sin, zeros], axis=-1),
            jnp.stack([sin, cos, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )  # [..., 3, 3]
    corners = jnp.einsum("...ij,...kj->...ki", rot, corners)
    return corners + box3d[..., None, 0:3]
