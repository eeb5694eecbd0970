"""Open-loop evaluation runner (shared by tools/test.py and the mid-training
eval hook — the reference's ``CustomDistEvalHook``, `apis/mmdet_train.py:
169-197`, evaluates every ``num_iters_per_epoch*20`` iterations)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def run_openloop_eval(
    cfg,
    variables,
    dataset,
    max_frames: Optional[int] = None,
    dtype=None,
    eval_planning: bool = True,
    eval_det: bool = False,
    eval_map: bool = False,
    eval_motion: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Stream the val split in sequence order; -> metric summary dict."""
    import jax
    import jax.numpy as jnp

    from .. import postprocess
    from ..models.detector import HiPAD
    from ..train.train_step import META_KEYS
    from . import planning as plan_eval

    model = HiPAD(cfg, dtype=dtype)

    @jax.jit
    def step(variables, images, metas, banks):
        outputs, new_banks = model.apply(variables, images, metas, banks,
                                         train=False)
        return postprocess.post_process_arrays(
            cfg, outputs, metas["gt_ego_fut_cmd"]
        ), new_banks

    n = len(dataset) if max_frames is None else min(max_frames, len(dataset))
    metric = plan_eval.PlanningMetric()
    per_frame = []
    det_gt, det_pred = [], []
    map_gt, map_pred = [], []
    mot_gt, mot_pred = [], []
    banks = None
    prev_scene = None
    for i in range(n):
        frame = dataset[{"idx": i, "aug_config": None}]
        if frame["scene_token"] != prev_scene:
            banks = None
            prev_scene = frame["scene_token"]
        images = jnp.asarray(frame["images"])[None]
        metas = {k: jnp.asarray(np.asarray(frame[k]))[None] for k in META_KEYS
                 if k in frame}
        decoded, banks = step(variables, images, metas, banks)
        res = postprocess.to_result_dicts(decoded)[0]

        if eval_planning and "plan_temp_2hz" in res:
            boxes = frame["gt_bboxes_3d"][frame["gt_valid"]].copy()
            tmp = boxes[:, 3].copy()
            boxes[:, 3] = boxes[:, 4]
            boxes[:, 4] = tmp
            boxes[:, 6] = -boxes[:, 6] - np.pi / 2
            feats = frame["gt_attr_labels"][frame["gt_valid"]]
            gt_traj = np.cumsum(frame["gt_ego_fut_trajs_2hz"], axis=0)
            valid = bool((frame["gt_ego_fut_masks_2hz"] == 1).all())
            per_frame.append(plan_eval.compute_planner_metric_stp3(
                metric, np.asarray(res["plan_temp_2hz"]), gt_traj, boxes,
                feats, valid,
            ))
        if eval_det or eval_motion:
            from ..configs.model import DET_CLASS_NAMES

            names = np.asarray(DET_CLASS_NAMES)
            v = frame["gt_valid"]
            det_gt.append({"boxes": frame["gt_bboxes_3d"][v],
                           "names": names[frame["gt_labels_3d"][v]]})
            det_pred.append({
                "boxes": np.asarray(res["boxes_3d"])[:, :9],
                "names": names[np.asarray(res["labels_3d"])],
                "scores": np.asarray(res["scores_3d"]),
            })
        if eval_map and "vectors" in res:
            v = frame["gt_map_valid"]
            # GT permutation slot 0 is the canonical ordering
            map_gt.append({
                "vectors": [p for p in frame["gt_map_pts"][v][:, 0]],
                "labels": frame["gt_map_labels"][v],
            })
            map_pred.append({
                "vectors": np.asarray(res["vectors"]),
                "labels": np.asarray(res["labels"]),
                "scores": np.asarray(res["scores"]),
            })
        if eval_motion and "trajs_3d" in res:
            v = frame["gt_valid"]
            gt_cum = (np.cumsum(frame["gt_agent_fut_trajs"][v], axis=1)
                      + frame["gt_bboxes_3d"][v][:, None, :2])
            mot_gt.append({
                "boxes": frame["gt_bboxes_3d"][v][:, :2],
                "names": det_gt[-1]["names"],
                "fut_trajs": gt_cum,
                "fut_masks": frame["gt_agent_fut_masks"][v],
            })
            mot_pred.append({
                "boxes": det_pred[-1]["boxes"][:, :2],
                "names": det_pred[-1]["names"],
                "scores": det_pred[-1]["scores"],
                "trajs": np.asarray(res["trajs_3d"]),
                "traj_scores": np.asarray(res["trajs_score"]),
            })

    summary: Dict[str, Dict[str, float]] = {}
    if per_frame:
        summary["planning"] = plan_eval.aggregate_planning_metrics(per_frame)
    if eval_det and det_gt:
        from .detection import evaluate_detection

        summary["detection"] = evaluate_detection(det_gt, det_pred)
    if map_gt:
        from .map import evaluate_map

        summary["map"] = evaluate_map(map_gt, map_pred)
    if mot_gt:
        from .motion import evaluate_motion

        summary["motion"] = evaluate_motion(mot_gt, mot_pred)
    return summary
