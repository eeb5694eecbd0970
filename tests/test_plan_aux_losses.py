"""Auxiliary plan losses (`models/plan/loss.py:9-339`): hand-built scenarios."""

import math

import jax.numpy as jnp
import numpy as np

from hipad_tpu.losses.plan_aux import (
    plan_collision_loss,
    plan_map_bound_loss,
    plan_map_dir_loss,
    segments_intersect,
)


def test_segments_intersect():
    a0 = jnp.array([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    a1 = jnp.array([[2.0, 0.0], [2.0, 0.0], [1.0, 0.0]])
    b0 = jnp.array([[1.0, -1.0], [3.0, -1.0], [0.0, 1.0]])
    b1 = jnp.array([[1.0, 1.0], [3.0, 1.0], [1.0, 1.0]])  # cross / miss / parallel-ish
    hit = np.asarray(segments_intersect(a0, a1, b0, b1))
    assert hit.tolist() == [True, False, False]


def _straight_ego(T=4):
    # ego drives straight +x at 1 m/step
    return jnp.asarray(np.stack([np.arange(1, T + 1), np.zeros(T)], -1))[None]


def test_map_bound_loss_proximity_and_faraway():
    ego = _straight_ego()  # [1, 4, 2]
    # one boundary polyline parallel at y=0.5 (inside 1m thresh),
    # one at y=50 (far)
    near = np.stack([np.linspace(0, 5, 5), np.full(5, 0.5)], -1)
    far = np.stack([np.linspace(0, 5, 5), np.full(5, 50.0)], -1)
    lanes = jnp.asarray(np.stack([near, far])[None])  # [1, 2, 5, 2]
    scores = jnp.asarray(np.array([[[0, 0, 0.9, 0], [0, 0, 0.9, 0]]]))
    loss = np.asarray(plan_map_bound_loss(ego, lanes, scores,
                                          lane_bound_cls_idx=2))
    # penalty = dis_thresh - distance to nearest boundary *point*
    # (`plan/loss.py:88-99` uses the flattened point set, not segments)
    ego_np = np.asarray(ego[0])
    d = np.linalg.norm(ego_np[:, None] - near[None], axis=-1).min(-1)
    np.testing.assert_allclose(loss[0], 1.0 - d, atol=1e-5)

    # low-confidence boundary is ignored
    scores0 = jnp.asarray(np.array([[[0, 0, 0.1, 0], [0, 0, 0.1, 0]]]))
    loss0 = np.asarray(plan_map_bound_loss(ego, lanes, scores0,
                                           lane_bound_cls_idx=2))
    np.testing.assert_allclose(loss0, 0.0, atol=1e-6)


def test_map_bound_loss_zeroed_after_crossing():
    ego = _straight_ego()
    # boundary crossing the ego path between steps 2 and 3 (x = 2.5)
    cross = np.stack([np.full(5, 2.5), np.linspace(-1, 1, 5)], -1)
    lanes = jnp.asarray(cross[None, None])  # [1, 1, 5, 2]
    scores = jnp.asarray(np.array([[[0, 0, 0.9, 0]]]))
    loss = np.asarray(plan_map_bound_loss(ego, lanes, scores))[0]
    # steps after (and at) the crossing contribute zero
    assert loss[2] == 0.0 and loss[3] == 0.0
    # step 2 is at x=2, 0.5m from the boundary -> positive before crossing
    assert loss[1] > 0.0


def test_collision_loss_agent_on_path():
    ego = _straight_ego()
    agent = jnp.asarray(np.array([[[2.0, 0.5]]]))  # [1, 1, 2] near path
    scores = jnp.asarray(np.array([[[0.9, 0, 0, 0, 0, 0]]]))
    fut = jnp.zeros((1, 1, 2, 4, 2))  # static agent, 2 modes
    fut_cls = jnp.asarray(np.array([[[0.7, 0.3]]]))
    loss = np.asarray(plan_collision_loss(ego, agent, scores, fut, fut_cls))
    # at t=1 (ego x=2): x_dist=0 -> x loss = 1.5; y_dist=0.5 -> y loss = 2.5
    np.testing.assert_allclose(loss[0, 1], [1.5, 2.5], atol=1e-5)

    # low-score agent ignored
    scores0 = jnp.asarray(np.array([[[0.1, 0, 0, 0, 0, 0]]]))
    loss0 = np.asarray(plan_collision_loss(ego, agent, scores0, fut, fut_cls))
    np.testing.assert_allclose(loss0, 0.0, atol=1e-6)

    # non-vehicle class (idx > 4) ignored
    scores_ped = jnp.asarray(np.array([[[0, 0, 0, 0, 0, 0.9, 0]]]))
    loss_p = np.asarray(plan_collision_loss(ego, agent, scores_ped, fut,
                                            fut_cls))
    np.testing.assert_allclose(loss_p, 0.0, atol=1e-6)


def test_map_dir_loss_parallel_vs_oblique():
    T = 4
    offsets = jnp.asarray(np.tile([1.0, 0.0], (1, T, 1)))  # straight +x
    lane_x = np.stack([np.linspace(0, 5, 5), np.full(5, 0.5)], -1)
    lanes = jnp.asarray(lane_x[None, None])
    scores = jnp.asarray(np.array([[[0.9, 0, 0, 0]]]))
    loss = np.asarray(plan_map_dir_loss(offsets, lanes, scores,
                                        lane_div_cls_idx=0))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)  # parallel lane

    # 45-degree lane nearby -> |pi/4| per step
    lane45 = np.stack([np.linspace(0, 4, 5), np.linspace(0, 4, 5)], -1)
    lanes45 = jnp.asarray(lane45[None, None])
    loss45 = np.asarray(plan_map_dir_loss(offsets, lanes45, scores,
                                          lane_div_cls_idx=0))
    near_mask = loss45 > 0
    assert near_mask.any()
    np.testing.assert_allclose(loss45[near_mask], math.pi / 4, atol=1e-5)

    # static ego -> zero
    loss_static = np.asarray(plan_map_dir_loss(offsets * 0.01, lanes, scores))
    np.testing.assert_allclose(loss_static, 0.0, atol=1e-6)


def test_loss_plan_aux_wiring(monkeypatch):
    """End-to-end wiring through compute_losses with weights enabled."""
    import jax

    from hipad_tpu.configs.model import tiny
    from hipad_tpu.data import synthetic
    from hipad_tpu.losses import hipad_loss
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    monkeypatch.setattr(hipad_loss, "PLAN_BOUND_W", 1.0)
    monkeypatch.setattr(hipad_loss, "PLAN_COL_W", 1.0)
    monkeypatch.setattr(hipad_loss, "PLAN_DIR_W", 1.0)

    cfg = tiny()
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 2)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, metas,
                           train=False)
    out, _ = model.apply(variables, images, metas, None, train=False)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = hipad_loss.compute_losses(cfg, out, data)
    for k in ("plan_loss_bound", "plan_loss_col", "plan_loss_dir"):
        assert k in losses and np.isfinite(float(losses[k])), k
