"""Planning post-processing: command/mode selection + collision rescoring.

TPU rework of ``SparsePlanDecoder`` (`models/plan/decoder.py:62-330`) and its
ego-vs-agent collision check (`plan/decoder.py:10-59`). Fully batched jnp:
the per-sample python loops and dynamic box filtering of the reference become
masking (low-confidence agents are pushed 1e6 m away, exactly like the
reference's ``motion_box[filter_mask] = 1e6``).

Shipped-behaviour notes (kept for parity, flag-switchable):
  * the ("temp","2hz") group's cls is collision-rescored but mode selection
    reads the *reference* group's (("spat","2m")) raw cls — as in
    `plan/decoder.py:185-200`;
  * the reference's ``ego_box[0] += offset*cos(...)`` applies its 0.5 m centre
    offset to one flattened element only (an upstream indexing slip), i.e.
    effectively no offset; we default to no offset and expose
    ``center_offset`` for the intended behaviour.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs.model import HiPADConfig

EGO_SIZE_B2D = (4.89, 1.84, 1.49)  # `plan/decoder.py:95-99`
DIM_SCALE = 1.1
SCORE_THRESH = 0.15
STATIC_DIS_THRESH = 0.5


def get_yaw(traj: jnp.ndarray, start_yaw: jnp.ndarray) -> jnp.ndarray:
    """Heading along a trajectory by central differences
    (`plan/decoder.py:228-251`); static trajectories keep ``start_yaw``.

    Args:
      traj: [..., ts, 2]; start_yaw: broadcastable to [..., 1].
    Returns: [..., ts].
    """
    ts = traj.shape[-2]
    start = jnp.broadcast_to(start_yaw, traj.shape[:-2] + (1,))
    mid = jnp.arctan2(
        traj[..., 2:, 1] - traj[..., :-2, 1], traj[..., 2:, 0] - traj[..., :-2, 0]
    )
    last = jnp.arctan2(
        traj[..., -1:, 1] - traj[..., -2:-1, 1],
        traj[..., -1:, 0] - traj[..., -2:-1, 0],
    )
    yaw = jnp.concatenate([start, mid, last], axis=-1)
    dist = jnp.linalg.norm(traj[..., -1, :] - traj[..., 0, :], axis=-1)
    return jnp.where((dist < STATIC_DIS_THRESH)[..., None], start, yaw)


def _corners_xy(boxes: jnp.ndarray) -> jnp.ndarray:
    """4 ground-plane corners of [..., 7] boxes -> [..., 4, 2]."""
    w, l, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    sx = jnp.asarray([0.5, 0.5, -0.5, -0.5])
    sy = jnp.asarray([0.5, -0.5, 0.5, -0.5])
    cx = w[..., None] * sx
    cy = l[..., None] * sy
    cos, sin = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    x = cx * cos - cy * sin + boxes[..., None, 0]
    y = cx * sin + cy * cos + boxes[..., None, 1]
    return jnp.stack([x, y], axis=-1)


def _corners_in_box(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """True where any xy-corner of boxes2 lies inside boxes1
    (`plan/decoder.py:25-59`). Shapes broadcast; returns [...]."""
    yaw1 = boxes1[..., 6]
    cos, sin = jnp.cos(-yaw1), jnp.sin(-yaw1)
    rel = _corners_xy(boxes2) - boxes1[..., None, 0:2]  # [..., 4, 2]
    x = rel[..., 0] * cos[..., None] - rel[..., 1] * sin[..., None]
    y = rel[..., 0] * sin[..., None] + rel[..., 1] * cos[..., None]
    inside = (
        (jnp.abs(x) <= boxes1[..., None, 3] / 2)
        & (jnp.abs(y) <= boxes1[..., None, 4] / 2)
    )
    return inside.any(axis=-1)


def check_collision(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric rough collision test on [..., 7] boxes (`plan/decoder.py:10-22`)."""
    return _corners_in_box(boxes1, boxes2) | _corners_in_box(boxes2, boxes1)


def rescore(
    plan_cls: jnp.ndarray,
    plan_reg: jnp.ndarray,
    motion_cls: jnp.ndarray,
    motion_reg: jnp.ndarray,
    det_anchors: jnp.ndarray,
    det_confidence: jnp.ndarray,
    center_offset: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Penalise plan modes whose future ego box hits any agent's most likely
    future box (`plan/decoder.py:205-298`).

    Args:
      plan_cls: [bs, mode]; plan_reg: [bs, mode, ts, 2] *cumulative* waypoints.
      motion_cls: [bs, P, m_modes] sigmoided; motion_reg: [bs, P, m_modes, ts', 2]
        cumulative agent trajectories (ego frame offsets from box centre).
      det_anchors: [bs, P, 11] undecoded; det_confidence: [bs, P].

    Returns: (rescored plan_cls, all_col [bs] — True when every mode collides).
    """
    from ..core.box3d import COS_YAW, SIN_YAW

    bs, mode, ts, _ = plan_reg.shape

    def cat_zero(t):
        return jnp.concatenate([jnp.zeros_like(t[..., :1, :]), t], axis=-2)

    ego_traj = cat_zero(plan_reg)  # [bs, mode, ts+1, 2]
    ego_yaw = get_yaw(ego_traj, jnp.pi / 2)
    ego_box = jnp.concatenate(
        [
            ego_traj,
            jnp.zeros(ego_traj.shape[:-1] + (1,)),
            jnp.broadcast_to(
                jnp.asarray(EGO_SIZE_B2D) * DIM_SCALE, ego_traj.shape[:-1] + (3,)
            ),
            ego_yaw[..., None],
        ],
        axis=-1,
    )  # [bs, mode, ts+1, 7]

    m_traj = cat_zero(motion_reg[..., :ts, :]) + det_anchors[:, :, None, None, :2]
    best = jnp.argmax(motion_cls, axis=-1)  # [bs, P]
    m_traj = jnp.take_along_axis(
        m_traj, best[..., None, None, None], axis=2
    ).squeeze(2)  # [bs, P, ts+1, 2]
    det_yaw = jnp.arctan2(det_anchors[..., SIN_YAW], det_anchors[..., COS_YAW])
    m_yaw = get_yaw(m_traj, det_yaw[..., None])
    wlh = jnp.exp(det_anchors[..., 3:6])
    m_box = jnp.concatenate(
        [
            m_traj,
            jnp.zeros(m_traj.shape[:-1] + (1,)),
            jnp.broadcast_to(wlh[:, :, None], m_traj.shape[:-1] + (3,)),
            m_yaw[..., None],
        ],
        axis=-1,
    )  # [bs, P, ts+1, 7]
    far = jnp.zeros_like(m_box).at[..., 0:2].set(1e6)
    m_box = jnp.where((det_confidence < SCORE_THRESH)[..., None, None], far, m_box)

    ego = ego_box[:, :, 1:]  # drop t=0
    mot = m_box[:, :, 1:]
    if center_offset:
        ego = ego.at[..., 0].add(center_offset * jnp.cos(ego[..., 6]))
        ego = ego.at[..., 1].add(center_offset * jnp.sin(ego[..., 6]))

    # [bs, mode, P, ts]
    col = check_collision(ego[:, :, None], mot[:, None])
    col = col.any(axis=(2, 3))  # [bs, mode]
    all_col = col.all(axis=-1)
    col = jnp.where(all_col[:, None], False, col)
    return plan_cls + col.astype(plan_cls.dtype) * -999.0, all_col


def decode_plan(
    cfg: HiPADConfig,
    plan_out: Dict[str, jnp.ndarray],
    det_out: Optional[Dict[str, jnp.ndarray]],
    motion_out: Optional[Dict[str, jnp.ndarray]],
    cmd_onehot: jnp.ndarray,
    with_rescore: bool = True,
    rescore_refer: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full plan decode: split anchor-type groups, cumsum, command select,
    collision rescore, shared mode select, speed-bucket select.

    Returns dict of "plan_{kind}_{unit}" -> [bs, ts, 2] cumulative waypoints
    (+ "plan_mode_idx" [bs]).
    """
    cls = plan_out["classification"][-1]  # [bs, 1, N]
    reg = plan_out["prediction"][-1]  # [bs, 1, N, ts, 2]
    bs = cls.shape[0]
    per = cfg.ego_fut_cmd * cfg.ego_fut_mode
    types = cfg.plan_anchor_types

    cls_g: List[jnp.ndarray] = []
    reg_g: List[jnp.ndarray] = []
    cmd = jnp.argmax(cmd_onehot, axis=-1) if cfg.ego_fut_cmd > 1 else None
    for i in range(len(types)):
        c = cls[:, 0, per * i : per * (i + 1)].reshape(bs, cfg.ego_fut_cmd, -1)
        r = reg[:, 0, per * i : per * (i + 1)].reshape(
            bs, cfg.ego_fut_cmd, -1, cfg.ego_fut_ts, 2
        )
        r = jnp.cumsum(r, axis=-2)
        if cmd is not None:
            bidx = jnp.arange(bs)
            c, r = c[bidx, cmd], r[bidx, cmd]
        else:
            c, r = c[:, 0], r[:, 0]
        cls_g.append(c)  # [bs, mode]
        reg_g.append(r)  # [bs, mode, ts, 2]

    have_agents = det_out is not None and motion_out is not None
    if with_rescore and have_agents:
        det_anchors = det_out["prediction"][-1]
        det_conf = jax.nn.sigmoid(det_out["classification"][-1]).max(axis=-1)
        motion_cls = jax.nn.sigmoid(motion_out["classification"][-1])
        motion_reg = jnp.cumsum(motion_out["prediction"][-1], axis=-2)
        if ("temp", "2hz") in types:
            i = types.index(("temp", "2hz"))
            cls_g[i], _ = rescore(
                cls_g[i], reg_g[i], motion_cls, motion_reg, det_anchors, det_conf
            )
            if rescore_refer:
                cls_g[types.index(cfg.plan_anchor_refer)] = cls_g[i]

    # Shared mode selection by the reference anchor-type (`:197-203`).
    mode_idx = jnp.argmax(cls_g[types.index(cfg.plan_anchor_refer)], axis=-1)
    bidx = jnp.arange(bs)
    sel_cls = [c[bidx, mode_idx] for c in cls_g]  # each [bs]
    sel_reg = [r[bidx, mode_idx] for r in reg_g]  # each [bs, ts, 2]

    outputs: Dict[str, jnp.ndarray] = {"plan_mode_idx": mode_idx}
    speed: Dict[str, Dict] = {}
    for i, t in enumerate(types):
        if t[0] in ("temp", "spat"):
            outputs[f"plan_{t[0]}_{t[1]}"] = sel_reg[i]
        else:
            g = speed.setdefault(t[1], {"cls": [], "reg": []})
            g["cls"].append(sel_cls[i])
            g["reg"].append(sel_reg[i])

    if speed:
        for unit, g in speed.items():
            g["cls"] = jnp.stack(g["cls"], axis=1)  # [bs, n_buckets]
            g["reg"] = jnp.stack(g["reg"], axis=1)  # [bs, n_buckets, ts, 2]
        if with_rescore and have_agents:
            _rescore_speed(cfg, speed, det_anchors, det_conf, motion_cls, motion_reg)
        for unit, g in speed.items():
            idx = jnp.argmax(g["cls"], axis=-1)  # [bs]
            outputs[f"plan_speed_{unit}"] = jnp.take_along_axis(
                g["reg"], idx[:, None, None, None], axis=1
            ).squeeze(1)
    return outputs


def _rescore_speed(cfg, speed, det_anchors, det_conf, motion_cls, motion_reg):
    """`rescore_speed` (`plan/decoder.py:300-330`): one collision pass on the
    speed-reference frequency; the rescored cls is shared across frequencies
    and colliding-everywhere trajectories are zeroed (full stop)."""
    unit = cfg.plan_speed_refer[1]
    if unit not in speed:
        return
    reg = speed[unit]["reg"]
    if unit == "5hz":
        # 5 Hz 6-step -> the two ~2 Hz-aligned steps (indices 2, 5); motion is
        # 2 Hz so take its first two steps (`:313-317`).
        plan_sub = reg[:, :, (2, 5)]
        motion_sub = motion_reg[:, :, :, (0, 1)]
    else:
        plan_sub = reg
        motion_sub = motion_reg
    new_cls, all_col = rescore(
        speed[unit]["cls"], plan_sub, motion_cls, motion_sub, det_anchors, det_conf
    )
    for u in speed:
        speed[u]["cls"] = new_cls
        speed[u]["reg"] = speed[u]["reg"] * (1.0 - all_col.astype(reg.dtype))[:, None, None, None]
