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
        if eval_det:
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

    summary: Dict[str, Dict[str, float]] = {}
    if per_frame:
        summary["planning"] = plan_eval.aggregate_planning_metrics(per_frame)
    if det_gt:
        from .detection import evaluate_detection

        summary["detection"] = evaluate_detection(det_gt, det_pred)
    return summary
