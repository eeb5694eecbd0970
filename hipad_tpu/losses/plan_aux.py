"""Auxiliary planning losses (`models/plan/loss.py:9-339`).

The reference registers three ego-trajectory regularisers — map-boundary
proximity, agent collision, and lane-direction consistency — but ships both
configs with their weights unset (`loss_plan_bound/col/dir` default None).
They are rebuilt here as pure jnp functions (argmin + take_along_axis +
where-masking instead of the reference's python index lists / in-place
masked writes) so they can be enabled via the loss-weight knobs in
``hipad_loss.py``.

Conventions follow the reference exactly:
  * ``plan_map_bound_loss`` / ``plan_collision_loss`` take the ego
    trajectory as *cumulative* positions [B, T, 2];
  * ``plan_map_dir_loss`` takes per-step *offsets* and cumsums internally
    (`plan/loss.py:297`).
Filtered-out elements (low score / wrong class / far away) are moved to 1e6
instead of being dropped, as upstream (`plan/loss.py:49,172-176`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def segments_intersect(a_start, a_end, b_start, b_end):
    """Batched 2D segment intersection test (`plan/loss.py:109-133`).

    All inputs [..., 2]; returns bool [...]. Parallel/coincident pairs
    count as non-intersecting, as upstream.
    """
    d1 = a_end - a_start
    d2 = b_end - b_start
    det = d1[..., 0] * d2[..., 1] - d2[..., 0] * d1[..., 1]
    safe_det = jnp.where(det == 0, 1.0, det)
    rel = b_start - a_start
    t1 = (rel[..., 0] * d2[..., 1] - rel[..., 1] * d2[..., 0]) / safe_det
    t2 = (rel[..., 0] * d1[..., 1] - rel[..., 1] * d1[..., 0]) / safe_det
    hit = (t1 >= 0) & (t1 <= 1) & (t2 >= 0) & (t2 <= 1)
    return hit & (det != 0)


def plan_map_bound_loss(
    ego_traj: jnp.ndarray,  # [B, T, 2] cumulative ego positions
    lane_preds: jnp.ndarray,  # [B, V, P, 2] predicted polylines
    lane_scores: jnp.ndarray,  # [B, V, num_cls] sigmoid scores
    map_thresh: float = 0.5,
    lane_bound_cls_idx: int = 2,
    dis_thresh: float = 1.0,
) -> jnp.ndarray:
    """Penalty for driving within ``dis_thresh`` of a predicted lane
    boundary, zeroed from the first boundary crossing on
    (`plan/loss.py:57-106`). Returns [B, T]."""
    B, T, _ = ego_traj.shape
    V, P = lane_preds.shape[1:3]
    not_bound = lane_scores[..., lane_bound_cls_idx] < map_thresh
    bound = jnp.where(not_bound[..., None, None], 1e6, lane_preds)

    # nearest boundary *instance* per timestep (min over its points first)
    d_inst = jnp.linalg.norm(
        ego_traj[:, :, None, None, :] - bound[:, None, :, :, :], axis=-1
    ).min(axis=-1)  # [B, T, V]
    min_inst = jnp.argmin(d_inst, axis=-1)  # [B, T]
    nearest = jnp.take_along_axis(
        jnp.broadcast_to(bound[:, None], (B, T, V, P, 2)),
        jnp.broadcast_to(min_inst[:, :, None, None, None], (B, T, 1, P, 2)),
        axis=2,
    )[:, :, 0]  # [B, T, P, 2]

    # segment-crossing test: ego step segments vs boundary segments
    starts = jnp.concatenate([jnp.zeros((B, 1, 2), ego_traj.dtype),
                              ego_traj[:, :-1]], axis=1)  # [B, T, 2]
    hit = segments_intersect(
        starts[:, :, None, :], ego_traj[:, :, None, :],
        nearest[:, :, :-1, :], nearest[:, :, 1:, :],
    )  # [B, T, P-1]
    crossed = jnp.cumsum(hit.any(axis=-1).astype(jnp.int32), axis=1) > 0

    # proximity penalty to the nearest boundary *point* overall
    flat = bound.reshape(B, V * P, 2)
    d_pt = jnp.linalg.norm(ego_traj[:, :, None, :] - flat[:, None], axis=-1)
    min_d = d_pt.min(axis=-1)  # [B, T]
    loss = jnp.where(min_d <= dis_thresh, dis_thresh - min_d, 0.0)
    # from the first crossing on, the ego has left the drivable corridor
    # and the proximity objective no longer applies (`plan/loss.py:102-103`)
    return jnp.where(crossed, 0.0, loss)


def plan_collision_loss(
    ego_traj: jnp.ndarray,  # [B, T, 2] cumulative ego positions
    agent_pos: jnp.ndarray,  # [B, A, 2] current agent xy
    agent_scores: jnp.ndarray,  # [B, A, num_cls] sigmoid scores
    agent_fut: jnp.ndarray,  # [B, A, mode, T, 2] cumulative future offsets
    agent_fut_cls: jnp.ndarray,  # [B, A, mode]
    agent_thresh: float = 0.5,
    x_dis_thresh: float = 1.5,
    y_dis_thresh: float = 3.0,
    dis_thresh: float = 3.0,
    vehicle_cls_max: int = 4,
) -> jnp.ndarray:
    """Axis-separated proximity penalty to predicted vehicles' best-mode
    futures (`plan/loss.py:137-234`). Returns [B, T, 2] (x loss, y loss)."""
    B, A = agent_pos.shape[:2]
    T = ego_traj.shape[1]
    max_score = agent_scores.max(axis=-1)
    max_idx = agent_scores.argmax(axis=-1)
    invalid = (max_score < agent_thresh) | (max_idx > vehicle_cls_max)

    best_mode = jnp.argmax(agent_fut_cls, axis=-1)  # [B, A]
    fut = jnp.take_along_axis(
        agent_fut, best_mode[:, :, None, None, None], axis=2
    )[:, :, 0]  # [B, A, T, 2]
    target = agent_pos[:, :, None, :] + fut
    target = jnp.where(invalid[:, :, None, None], 1e6, target)

    dist = jnp.linalg.norm(ego_traj[:, None] - target, axis=-1)  # [B, A, T]
    target = jnp.where(dist[..., None] > dis_thresh, 1e6, target)

    x_dist = jnp.abs(ego_traj[:, None, :, 0] - target[..., 0])  # [B, A, T]
    y_dist = jnp.abs(ego_traj[:, None, :, 1] - target[..., 1])
    x_min = x_dist.min(axis=1)  # [B, T]
    y_min = y_dist.min(axis=1)
    x_loss = jnp.where(x_min <= x_dis_thresh, x_dis_thresh - x_min, 0.0)
    y_loss = jnp.where(y_min <= y_dis_thresh, y_dis_thresh - y_min, 0.0)
    return jnp.stack([x_loss, y_loss], axis=-1)


def plan_map_dir_loss(
    ego_offsets: jnp.ndarray,  # [B, T, 2] per-step offsets
    lane_preds: jnp.ndarray,  # [B, V, P, 2]
    lane_scores: jnp.ndarray,  # [B, V, num_cls]
    map_thresh: float = 0.5,
    dis_thresh: float = 2.0,
    lane_div_cls_idx: int = 0,
) -> jnp.ndarray:
    """|heading difference| between the ego trajectory and the nearest lane
    divider segment (`plan/loss.py:285-339`). Returns [B, T]."""
    B, T, _ = ego_offsets.shape
    V, P = lane_preds.shape[1:3]
    pred = jnp.cumsum(ego_offsets, axis=-2)
    static = jnp.linalg.norm(pred[:, -1] - pred[:, 0], axis=-1) < 1.0

    not_div = lane_scores[..., lane_div_cls_idx] < map_thresh
    div = jnp.where(not_div[..., None, None], 1e6, lane_preds)

    d_inst = jnp.linalg.norm(
        pred[:, :, None, None, :] - div[:, None], axis=-1
    ).min(axis=-1)  # [B, T, V]
    min_inst = jnp.argmin(d_inst, axis=-1)
    inst = jnp.take_along_axis(
        jnp.broadcast_to(div[:, None], (B, T, V, P, 2)),
        jnp.broadcast_to(min_inst[:, :, None, None, None], (B, T, 1, P, 2)),
        axis=2,
    )[:, :, 0]  # [B, T, P, 2]

    d_pt = jnp.linalg.norm(pred[:, :, None, :] - inst, axis=-1)  # [B, T, P]
    min_pt = jnp.argmin(d_pt, axis=-1)  # [B, T]
    nxt = jnp.where(min_pt == P - 1, P - 2, min_pt + 1)

    take_pt = lambda i: jnp.take_along_axis(
        inst, i[:, :, None, None].repeat(2, -1), axis=2)[:, :, 0]
    p0 = take_pt(min_pt)
    p1 = take_pt(nxt)
    min_d = jnp.linalg.norm(p0 - pred, axis=-1)

    dyaw = jnp.diff(pred, axis=-2)
    traj_yaw = jnp.arctan2(dyaw[..., 1], dyaw[..., 0])  # [B, T-1]
    traj_yaw = jnp.concatenate([traj_yaw, traj_yaw[:, -1:]], axis=-1)
    lane_yaw = jnp.arctan2(p1[..., 1] - p0[..., 1], p1[..., 0] - p0[..., 0])

    diff = traj_yaw - lane_yaw
    # fold into (-pi/2, pi/2]: lane direction is sign-ambiguous
    diff = jnp.where(diff > math.pi, diff - math.pi, diff)
    diff = jnp.where(diff > math.pi / 2, diff - math.pi, diff)
    diff = jnp.where(diff < -math.pi, diff + math.pi, diff)
    diff = jnp.where(diff < -math.pi / 2, diff + math.pi, diff)
    diff = jnp.where(min_d > dis_thresh, 0.0, diff)
    diff = jnp.where(static[:, None], 0.0, diff)
    return jnp.abs(diff)
