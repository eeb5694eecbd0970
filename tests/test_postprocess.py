"""Post-processing decoder tests (CPU, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.configs.model import tiny
from hipad_tpu.postprocess.det import decode_det, decode_motion
from hipad_tpu.postprocess.map import decode_map
from hipad_tpu.postprocess.plan import check_collision, decode_plan, get_yaw, rescore


def test_decode_det_ranks_by_rescored_score():
    bs, P, C = 1, 8, 3
    rng = np.random.RandomState(0)
    cls = jnp.asarray(rng.randn(bs, P, C).astype(np.float32))
    boxes = jnp.asarray(rng.randn(bs, P, 11).astype(np.float32))
    quality = jnp.asarray(rng.randn(bs, P, 2).astype(np.float32))
    iid = jnp.arange(P, dtype=jnp.int32)[None]
    out = decode_det(cls, boxes, instance_id=iid, quality=quality, num_output=5)
    scores = np.asarray(out["scores_3d"][0])
    assert (np.diff(scores) <= 1e-6).all()  # descending
    assert out["boxes_3d"].shape == (1, 5, 10)
    # two-stage ranking (`det/decoder.py:54-73`): top-5 by raw cls score,
    # THEN rescored by centerness and re-sorted.
    a = np.asarray(out["anchor_idx"][0])
    raw = np.asarray(jax.nn.sigmoid(cls[0]).max(-1))
    top5 = np.argsort(-raw)[:5]
    rescored = raw[top5] * np.asarray(jax.nn.sigmoid(quality[0, top5, 0]))
    np.testing.assert_allclose(scores, np.sort(rescored)[::-1], atol=1e-5)
    assert set(a.tolist()) == set(top5.tolist())
    assert (np.asarray(out["instance_ids"][0]) == a).all()


def test_decode_motion_offsets_anchored_at_box_center():
    bs, P, mode, ts = 1, 4, 2, 3
    rng = np.random.RandomState(1)
    det = {
        "anchor_idx": jnp.asarray([[2, 0, 1, 3]]),
        "boxes_3d": jnp.asarray(rng.randn(bs, 4, 10).astype(np.float32)),
    }
    mcls = jnp.asarray(rng.randn(bs, P, mode).astype(np.float32))
    mreg = jnp.asarray(rng.randn(bs, P, mode, ts, 2).astype(np.float32))
    out = decode_motion(det, mcls, mreg)
    got = np.asarray(out["trajs_3d"][0, 0])  # selected anchor 2
    expect = np.cumsum(np.asarray(mreg[0, 2]), axis=-2) + np.asarray(
        det["boxes_3d"][0, 0, :2]
    )
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_collision_check_basic():
    # overlapping boxes collide, distant ones don't
    a = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0]])
    b = jnp.asarray([[1.0, 1.0, 0.0, 2.0, 4.0, 1.5, 0.3]])
    c = jnp.asarray([[50.0, 50.0, 0.0, 2.0, 4.0, 1.5, 0.0]])
    assert bool(check_collision(a, b)[0])
    assert not bool(check_collision(a, c)[0])


def test_get_yaw_static_keeps_start():
    traj = jnp.zeros((1, 5, 2))
    yaw = get_yaw(traj, jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(yaw), np.pi / 2)


def test_rescore_penalizes_colliding_mode():
    bs, mode, ts, P, mmodes = 1, 2, 4, 3, 2
    # mode 0 drives straight into the (only confident) agent; mode 1 veers off
    plan = np.zeros((bs, mode, ts, 2), np.float32)
    plan[0, 0, :, 1] = np.linspace(2, 8, ts)  # forward (+y)
    plan[0, 1, :, 0] = np.linspace(2, 8, ts)  # sideways
    det = np.zeros((bs, P, 11), np.float32)
    det[0, 0, :2] = [0.0, 5.0]  # agent parked 5m ahead
    det[0, 0, 3:6] = np.log(2.0)
    det[0, 0, 7] = 1.0
    det[0, 1:, :2] = 100.0
    det_conf = np.array([[0.9, 0.0, 0.0]], np.float32)
    mcls = np.zeros((bs, P, mmodes), np.float32)
    mcls[..., 0] = 1.0
    mreg = np.zeros((bs, P, mmodes, ts, 2), np.float32)  # static agents

    cls = np.zeros((bs, mode), np.float32)
    new_cls, all_col = rescore(
        jnp.asarray(cls), jnp.asarray(plan), jnp.asarray(mcls),
        jnp.asarray(mreg), jnp.asarray(det), jnp.asarray(det_conf),
    )
    new_cls = np.asarray(new_cls)
    assert new_cls[0, 0] < -900  # colliding mode nuked
    assert new_cls[0, 1] == 0.0
    assert not bool(all_col[0])


def test_decode_map_shapes():
    bs, P, C, pts = 2, 4, 3, 5
    rng = np.random.RandomState(2)
    out = decode_map(
        jnp.asarray(rng.randn(bs, P, C).astype(np.float32)),
        jnp.asarray(rng.randn(bs, P, pts * 2).astype(np.float32)),
    )
    assert out["vectors"].shape == (bs, P, pts, 2)
    assert out["labels"].shape == (bs, P)


def test_decode_plan_selects_shared_mode():
    cfg = tiny()
    bs = 2
    n = cfg.num_plan_anchor
    rng = np.random.RandomState(3)
    plan_out = {
        "classification": jnp.asarray(rng.randn(2, bs, 1, n).astype(np.float32)),
        "prediction": jnp.asarray(rng.randn(2, bs, 1, n, cfg.ego_fut_ts, 2).astype(np.float32)),
    }
    cmd = jnp.asarray(np.tile(np.eye(cfg.num_command)[1][None], (bs, 1)).astype(np.float32))
    out = decode_plan(cfg, plan_out, None, None, cmd, with_rescore=False)
    # manual: refer group's argmax decides the mode for every group
    per = cfg.ego_fut_cmd * cfg.ego_fut_mode
    ri = cfg.plan_anchor_types.index(cfg.plan_anchor_refer)
    ref_cls = np.asarray(plan_out["classification"][-1][:, 0, per * ri : per * (ri + 1)])
    expect_mode = ref_cls.argmax(-1)
    assert (np.asarray(out["plan_mode_idx"]) == expect_mode).all()
    for t in cfg.plan_anchor_types:
        if t[0] in ("temp", "spat"):
            key = f"plan_{t[0]}_{t[1]}"
            i = cfg.plan_anchor_types.index(t)
            reg = np.asarray(plan_out["prediction"][-1][:, 0, per * i : per * (i + 1)])
            reg = np.cumsum(reg, axis=-2)
            np.testing.assert_allclose(
                np.asarray(out[key]),
                reg[np.arange(bs), expect_mode], atol=1e-5,
            )
