import math

import jax.numpy as jnp
import numpy as np

from hipad_tpu.core import box3d
from hipad_tpu.core.geometry import (
    agent_to_lidar_trajs,
    box_anchor_projection,
    polyline_anchor_projection,
    project_points,
    sine_embed_2d,
)


def test_project_points_pinhole():
    # Single camera looking down +z with focal 100, principal point (50, 30).
    K = np.array(
        [[100.0, 0, 50, 0], [0, 100.0, 30, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    proj = jnp.asarray(K)[None, None]  # [1, 1, 4, 4]
    pts = jnp.asarray([[[[1.0, 2.0, 4.0]]]])  # [1, 1, 1, 3]
    out = project_points(pts, proj)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0, 0]), [100 * 1 / 4 + 50, 100 * 2 / 4 + 30], rtol=1e-5
    )
    wh = jnp.asarray([[[200.0, 120.0]]])
    out_n = project_points(pts, proj, wh)
    np.testing.assert_allclose(np.asarray(out_n[0, 0, 0, 0]), [75 / 200, 80 / 120], rtol=1e-5)


def test_project_points_behind_camera_clamped():
    proj = jnp.eye(4)[None, None]
    pts = jnp.asarray([[[[1.0, 1.0, -2.0]]]])  # behind the camera
    out = project_points(pts, proj)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.abs(np.asarray(out)) > 1e3)  # huge -> masked by sampler


def test_box_anchor_projection_identity():
    anchor = jnp.asarray(np.random.RandomState(0).randn(2, 5, 11).astype(np.float32))
    t = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    out = box_anchor_projection(anchor, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchor), atol=1e-6)


def test_box_anchor_projection_rotation_and_velocity():
    # 90 deg rotation about z, plus velocity compensation.
    yaw = math.pi / 2
    t = np.eye(4, dtype=np.float32)
    t[0, 0], t[0, 1] = math.cos(yaw), -math.sin(yaw)
    t[1, 0], t[1, 1] = math.sin(yaw), math.cos(yaw)
    t[0, 3] = 1.0
    anchor = np.zeros((1, 1, 11), dtype=np.float32)
    anchor[0, 0, box3d.X] = 2.0
    anchor[0, 0, box3d.COS_YAW] = 1.0  # yaw = 0
    anchor[0, 0, box3d.VX] = 1.0
    out = box_anchor_projection(
        jnp.asarray(anchor), jnp.asarray(t)[None], time_interval=jnp.asarray([-1.0])
    )
    out = np.asarray(out)[0, 0]
    # centre: (2,0,0) advanced by vel*1 -> (3,0,0), rotated -> (0,3,0), +trans x.
    np.testing.assert_allclose(out[:3], [1.0, 3.0, 0.0], atol=1e-5)
    # yaw 0 rotated by 90deg -> sin=1, cos=0.
    np.testing.assert_allclose(out[box3d.SIN_YAW], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[box3d.COS_YAW], 0.0, atol=1e-5)
    # velocity rotated: (1,0,0) -> (0,1,0).
    np.testing.assert_allclose(out[box3d.VX:], [0.0, 1.0, 0.0], atol=1e-5)


def test_polyline_anchor_projection():
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 5.0
    anchor = jnp.asarray(np.zeros((1, 2, 6), np.float32))  # 3 points of (x,y)
    out = polyline_anchor_projection(anchor, jnp.asarray(t)[None], num_sample=3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [5, 0, 5, 0, 5, 0], atol=1e-6)


def test_sine_embed_matches_formula():
    pos = np.random.RandomState(1).rand(3, 4, 2).astype(np.float32)
    got = np.asarray(sine_embed_2d(jnp.asarray(pos), 256))
    # Independent numpy computation of the DAB-DETR embedding.
    half = 128
    dim_t = 10000.0 ** (2 * (np.arange(half) // 2) / half)
    for axis, sl in ((1, slice(0, half)), (0, slice(half, 256))):  # (y first, x second)
        v = pos[..., axis] * 2 * np.pi
        ang = v[..., None] / dim_t
        emb = np.empty_like(ang)
        emb[..., 0::2] = np.sin(ang[..., 0::2])
        emb[..., 1::2] = np.cos(ang[..., 1::2])
        np.testing.assert_allclose(got[..., sl], emb, rtol=1e-4, atol=1e-5)


def test_box_encode_decode_roundtrip():
    rs = np.random.RandomState(2)
    dec = np.concatenate(
        [
            rs.randn(4, 3),  # xyz
            np.abs(rs.rand(4, 3)) + 0.5,  # wlh
            rs.uniform(-np.pi, np.pi, (4, 1)),  # yaw
            rs.randn(4, 3),  # vel
        ],
        axis=-1,
    ).astype(np.float32)
    enc = box3d.encode_box(jnp.asarray(dec))
    dec2 = np.asarray(box3d.decode_box(enc))
    np.testing.assert_allclose(dec2, dec, rtol=1e-4, atol=1e-4)


def test_box3d_to_corners_axis_aligned():
    box = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0]])
    corners = np.asarray(box3d.box3d_to_corners(box))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [0.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(corners.max(0), [2.0, 4.0, 6.0], atol=1e-5)


def test_agent_to_lidar_trajs():
    boxes = np.zeros((1, 1, 11), np.float32)
    boxes[0, 0, box3d.SIN_YAW] = 1.0  # yaw = +90deg
    trajs = np.zeros((1, 1, 1, 1, 2), np.float32)
    trajs[..., 0] = 1.0  # forward in agent frame
    out = np.asarray(agent_to_lidar_trajs(jnp.asarray(trajs), jnp.asarray(boxes)))
    np.testing.assert_allclose(out[0, 0, 0, 0], [0.0, 1.0], atol=1e-6)
