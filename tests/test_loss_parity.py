"""GOLDEN loss parity: the reference's own loss path vs ours.

The reference's target assigners and loss assembly
(`models/sparse_onedecoder.py:1095-1579`, `models/det/target.py:66-162`,
`models/map/target.py:14-157` + `match_cost.py`, `models/plan/target.py:
40-163`, `models/motion/target.py:37-100`, `models/det/losses.py`,
`models/map/loss.py`) are pure torch+scipy — loaded from /root/reference and
executed in place (`_reference_loader.load_loss`), with the mmdet loss
primitives provided as faithful CPU stand-ins. Shared random predictions and
shared GT go through both implementations; every loss scalar must agree.

This covers the full assignment machinery end to end: focal+L1 Hungarian
costs, permutation-invariant map matching, NaN/cone reg-weight handling,
cls_threshold_to_reg gating, the det->motion index reuse, and the plan
alignment coupling (reference-mode forcing across the 10 granularity groups
+ speed-bucket classification) the survey flags as "easy to get subtly
wrong" (SURVEY §7 hard part 5).

GT is kept NaN-free: the reference's cost path turns any NaN GT component
into a constant 1e8 cost row (`det/target.py:98-99` after `nan*0=nan` in the
weighted sum), making that GT's assignment a Hungarian tie — degenerate
upstream behavior our finite-cost implementation deliberately avoids
(targets/det.py nan_to_num). The NaN *loss* path (weights zeroed) is still
covered by the per-component reg-weight checks in test_targets_losses.py.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from _reference_loader import load_loss  # noqa: E402
from test_full_decoder_parity import _exec_reference_config  # noqa: E402

from hipad_tpu.configs.model import stage2  # noqa: E402
from hipad_tpu.data import synthetic  # noqa: E402
from hipad_tpu.losses import hipad_loss  # noqa: E402

BS = 2
L = 2          # decoder layers (loss sums over layers; 2 exercises the sum)
P_DET = 64     # anchor counts are free parameters of the loss
P_MAP = 24
SEED = 3


def _rand(rs, *shape, scale=1.0):
    return (rs.rand(*shape).astype(np.float32) - 0.5) * 2.0 * scale


@pytest.fixture(scope="module")
def both():
    ns = load_loss()
    cfgns = _exec_reference_config()
    head = cfgns["model"]["head"]["onedecoder_head"]
    cfg = stage2()

    # ---- shared predictions -------------------------------------------------
    rs = np.random.RandomState(SEED)
    C_det, C_map = cfg.num_det_classes, cfg.num_map_classes
    n_plan = cfg.plan_anchor_group * cfg.ego_fut_cmd * cfg.ego_fut_mode
    ts, fut_ts, fut_mode = cfg.ego_fut_ts, cfg.fut_ts, cfg.fut_mode
    preds = {
        "det_cls": _rand(rs, L, BS, P_DET, C_det, scale=2.0),
        "det_reg": _rand(rs, L, BS, P_DET, 11, scale=2.0),
        "det_qt": _rand(rs, L, BS, P_DET, 2, scale=2.0),
        "map_cls": _rand(rs, L, BS, P_MAP, C_map, scale=2.0),
        "map_reg": _rand(rs, L, BS, P_MAP, cfg.map_num_pts * 2, scale=12.0),
        "ego_status": _rand(rs, L, BS, 1, cfg.ego_status_dims),
        "plan_cls": _rand(rs, L, BS, 1, n_plan, scale=2.0),
        "plan_reg": _rand(rs, L, BS, 1, n_plan, ts, 2),
        "motion_cls": _rand(rs, L, BS, P_DET, fut_mode, scale=2.0),
        "motion_reg": _rand(rs, L, BS, P_DET, fut_mode, fut_ts, 2),
    }

    # ---- shared GT (padded for ours; lists/tensors for the reference) ------
    data = synthetic.make_gt(cfg, BS, seed=SEED)
    # non-trivial masks to exercise the weighting paths
    rs2 = np.random.RandomState(SEED + 1)
    data["ego_status_mask"] = (rs2.rand(BS, cfg.ego_status_dims) > 0.3).astype(
        np.float32)
    units = {t[1] for t in cfg.plan_anchor_types} | {cfg.plan_speed_refer[1]}
    for unit in units:
        key = "gt_ego_spat" if unit.endswith("m") else "gt_ego_fut"
        m = np.ones((BS, ts), np.float32)
        m[:, -2:] = (rs2.rand(BS, 2) > 0.3).astype(np.float32)
        data[f"{key}_masks_{unit}"] = m
    metas = synthetic.make_metas(cfg, BS, seed=SEED)
    data["gt_ego_fut_cmd"] = metas["gt_ego_fut_cmd"]

    t = torch.tensor
    nv = data["gt_valid"].sum(1)
    nm = data["gt_map_valid"].sum(1)
    ref_data = {
        "gt_labels_3d": [t(data["gt_labels_3d"][i, : nv[i]]).long()
                         for i in range(BS)],
        "gt_bboxes_3d": [t(data["gt_bboxes_3d"][i, : nv[i]]) for i in range(BS)],
        "gt_map_labels": [t(data["gt_map_labels"][i, : nm[i]]).long()
                          for i in range(BS)],
        "gt_map_pts": [t(data["gt_map_pts"][i, : nm[i]]) for i in range(BS)],
        "gt_agent_fut_trajs": [t(data["gt_agent_fut_trajs"][i, : nv[i]])
                               for i in range(BS)],
        "gt_agent_fut_masks": [t(data["gt_agent_fut_masks"][i, : nv[i]])
                               for i in range(BS)],
        "ego_status": t(data["ego_status"]),
        "ego_status_mask": t(data["ego_status_mask"]),
        "gt_ego_fut_cmd": t(data["gt_ego_fut_cmd"]),
    }
    for k, v in data.items():
        if k.startswith("gt_ego_fut_trajs") or k.startswith("gt_ego_fut_masks") \
                or k.startswith("gt_ego_spat"):
            ref_data[k] = t(v)

    # ---- reference side: a loss-only SparseOneDecoder (no forward graph) ---
    build = sys.modules["mmcv.utils"].build_from_cfg
    samplers = sys.modules["mmdet.core.bbox.builder"].BBOX_SAMPLERS
    losses_reg = sys.modules["mmdet.models"].LOSSES

    dec = object.__new__(ns.onedecoder.SparseOneDecoder)
    torch.nn.Module.__init__(dec)
    dec.task_select = list(head["task_select"])
    dec.combine_layer_loss = True
    dec.cls_threshold_to_reg = head["cls_threshold_to_reg"]
    dec.det_reg_weights = head["det_reg_weights"]
    dec.map_reg_weights = head["map_reg_weights"]
    dec.ego_fut_cmd = cfgns["ego_fut_cmd"]
    dec.ego_fut_ts = cfgns["ego_fut_ts"]
    dec.plan_anchor_types = [tuple(x) for x in cfgns["plan_anchor_types"]]
    dec.plan_anchor_refer = tuple(cfgns["plan_anchor_refer"])
    dec.plan_speed_refer = tuple(cfgns["plan_speed_refer"])
    dec.plan_anchor_group = len(dec.plan_anchor_types)
    dec.with_supervise_ego_status = head["with_supervise_ego_status"]
    for name in ("det_sampler", "map_sampler", "plan_sampler",
                 "align_sampler", "motion_sampler"):
        setattr(dec, name, build(head[name], samplers))
    for name in ("loss_det_cls", "loss_det_reg", "loss_map_cls",
                 "loss_map_reg", "loss_ego_status", "loss_plan_cls",
                 "loss_plan_reg", "loss_motion_cls", "loss_motion_reg"):
        setattr(dec, name, build(head[name], losses_reg))

    def layers(key):
        return [t(preds[key][i]) for i in range(L)]

    det_out = {"classification": layers("det_cls"),
               "prediction": layers("det_reg"), "quality": layers("det_qt")}
    map_out = {"classification": layers("map_cls"),
               "prediction": layers("map_reg"), "quality": [None] * L}
    ego_out = {"classification": [torch.zeros(BS, 1, 1)] * L,
               "prediction": [torch.zeros(BS, 1, 1)] * L,
               "status": layers("ego_status")}
    plan_out = {"classification": layers("plan_cls"),
                "prediction": layers("plan_reg")}
    motion_out = {"classification": layers("motion_cls"),
                  "prediction": layers("motion_reg")}
    with torch.no_grad():
        ref = ns.onedecoder.SparseOneDecoder.loss(
            dec, det_out, map_out, ego_out, plan_out, motion_out, None,
            ref_data)
    ref = {k: float(v) for k, v in ref.items()}

    # ---- our side -----------------------------------------------------------
    outputs = {
        "det": {"classification": jnp.asarray(preds["det_cls"]),
                "prediction": jnp.asarray(preds["det_reg"]),
                "quality": jnp.asarray(preds["det_qt"])},
        "map": {"classification": jnp.asarray(preds["map_cls"]),
                "prediction": jnp.asarray(preds["map_reg"])},
        "ego": {"status": jnp.asarray(preds["ego_status"])},
        "plan": {"classification": jnp.asarray(preds["plan_cls"]),
                 "prediction": jnp.asarray(preds["plan_reg"])},
        "motion": {"classification": jnp.asarray(preds["motion_cls"]),
                   "prediction": jnp.asarray(preds["motion_reg"])},
    }
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    ours = jax.jit(
        lambda o, d: hipad_loss.compute_losses(cfg, o, d)
    )(outputs, jdata)
    ours = {k: float(v) for k, v in ours.items()}
    return ref, ours


LOSS_KEYS = [
    "det_loss_cls", "det_loss_box", "det_loss_cns", "det_loss_yns",
    "map_loss_cls", "map_loss_line",
    "ego_loss_status",
    "motion_loss_cls", "motion_loss_reg",
    "plan_loss_temp_cls", "plan_loss_temp_reg",
    "plan_loss_spat_cls", "plan_loss_spat_reg",
    "plan_loss_speed_cls", "plan_loss_speed_reg",
]


def test_same_loss_keys(both):
    ref, ours = both
    assert set(ref) == set(LOSS_KEYS)
    assert set(LOSS_KEYS) <= set(ours)


@pytest.mark.parametrize("key", LOSS_KEYS)
def test_loss_scalar_matches_reference(both, key):
    ref, ours = both
    r, o = ref[key], ours[key]
    assert np.isfinite(r) and np.isfinite(o), (key, r, o)
    assert abs(r - o) <= 1e-4 + 1e-4 * abs(r), f"{key}: ref={r:.6f} ours={o:.6f}"


def test_total_loss_matches(both):
    ref, ours = both
    r = sum(ref.values())
    o = sum(v for k, v in ours.items() if k in LOSS_KEYS)
    assert abs(r - o) <= 1e-4 + 1e-4 * abs(r)
