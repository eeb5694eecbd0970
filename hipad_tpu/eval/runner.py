"""Open-loop evaluation runner (shared by tools/test.py and the mid-training
eval hook — the reference's ``CustomDistEvalHook``, `apis/mmdet_train.py:
169-197`, evaluates every ``num_iters_per_epoch*20`` iterations).

Three execution shapes, all producing identical per-frame records:

  * **streaming** (``batch_slots=1``): one frame per dispatch, banks threaded
    in dataset order, reset (``banks=None``) at every sequence boundary — the
    reference's `apis/test.py:49-98` loop.
  * **batched** (``batch_slots=B``): B independent sequences stream in
    parallel, one dispatch per B frames (the GroupInBatchSampler slot trick,
    `datasets/samplers/group_in_batch_sampler.py:123-171`, without the
    shuffle). Each sequence's FIRST frame still runs through the bs=1
    single-frame jit so the reference's first-frame semantics (temp_gnn value
    bypass) are preserved exactly; all later frames ride the batched temporal
    step with per-slot bank carries merged under a live mask. On the tunneled
    TPU this cuts the per-frame host sync cost ~B-fold.
  * **multi-rank** (``world>1``): the val split is sharded into contiguous,
    *sequence-aligned* spans per rank (the reference shards contiguous frames
    with a non-shuffled DistributedSampler and gathers rank-ordered pickles,
    `apis/test.py:122-167`; aligning to sequence boundaries additionally
    keeps every temporal carry valid), each rank writes its records to
    ``gather_dir``, and rank 0 merges in rank order before aggregating.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# Sequence scheduling
# --------------------------------------------------------------------------

def sequence_spans(flags, n: int) -> List[Tuple[int, int]]:
    """Contiguous [start, end) spans of equal sequence flag within [0, n)."""
    flags = np.asarray(flags)[:n]
    spans = []
    s = 0
    for i in range(1, n + 1):
        if i == n or flags[i] != flags[s]:
            spans.append((s, i))
            s = i
    return spans


def rank_spans(spans, rank: int, world: int) -> List[Tuple[int, int]]:
    """Contiguous per-rank shard, sequence-aligned, balanced by frame count.

    A sequence belongs to the rank whose ideal frame range contains its start
    index — every sequence lands on exactly one rank, shards stay contiguous
    and in order (the gather concatenates them back into dataset order).
    """
    if not spans:
        return []
    total = spans[-1][1]
    lo = round(total * rank / world)
    hi = round(total * (rank + 1) / world)
    return [sp for sp in spans if lo <= sp[0] < hi]


def _assign_slots(spans, batch_slots: int) -> List[List[int]]:
    """Greedy balanced assignment of sequences to slots (dataset order kept
    within a slot)."""
    slots: List[List[int]] = [[] for _ in range(batch_slots)]
    load = [0] * batch_slots
    for s, e in spans:
        k = int(np.argmin(load))
        slots[k].append((s, e))
        load[k] += e - s
    return slots


# --------------------------------------------------------------------------
# Per-frame record collection (identical across execution shapes)
# --------------------------------------------------------------------------

class _Collector:
    def __init__(self, eval_planning, eval_det, eval_map, eval_motion,
                 metric=None):
        from . import planning as plan_eval

        self.eval_planning = eval_planning
        self.eval_det = eval_det
        self.eval_map = eval_map
        self.eval_motion = eval_motion
        self.metric = metric or plan_eval.PlanningMetric()
        self.acc: Dict[str, List] = {
            "planning": [], "det_gt": [], "det_pred": [],
            "map_gt": [], "map_pred": [], "mot_gt": [], "mot_pred": [],
        }

    def collect(self, idx: int, frame: Dict, res: Dict):
        from . import planning as plan_eval

        if self.eval_planning and "plan_temp_2hz" in res:
            boxes = frame["gt_bboxes_3d"][frame["gt_valid"]].copy()
            tmp = boxes[:, 3].copy()
            boxes[:, 3] = boxes[:, 4]
            boxes[:, 4] = tmp
            boxes[:, 6] = -boxes[:, 6] - np.pi / 2
            feats = frame["gt_attr_labels"][frame["gt_valid"]]
            gt_traj = np.cumsum(frame["gt_ego_fut_trajs_2hz"], axis=0)
            valid = bool((frame["gt_ego_fut_masks_2hz"] == 1).all())
            self.acc["planning"].append((idx, plan_eval.compute_planner_metric_stp3(
                self.metric, np.asarray(res["plan_temp_2hz"]), gt_traj, boxes,
                feats, valid,
            )))
        det_gt_entry = None
        if self.eval_det or self.eval_motion:
            from ..configs.model import DET_CLASS_NAMES

            names = np.asarray(DET_CLASS_NAMES)
            v = frame["gt_valid"]
            det_gt_entry = {"boxes": frame["gt_bboxes_3d"][v],
                            "names": names[frame["gt_labels_3d"][v]]}
            det_pred_entry = {
                "boxes": np.asarray(res["boxes_3d"])[:, :9],
                "names": names[np.asarray(res["labels_3d"])],
                "scores": np.asarray(res["scores_3d"]),
            }
            self.acc["det_gt"].append((idx, det_gt_entry))
            self.acc["det_pred"].append((idx, det_pred_entry))
        if self.eval_map and "vectors" in res:
            v = frame["gt_map_valid"]
            # GT permutation slot 0 is the canonical ordering
            self.acc["map_gt"].append((idx, {
                "vectors": [p for p in frame["gt_map_pts"][v][:, 0]],
                "labels": frame["gt_map_labels"][v],
            }))
            self.acc["map_pred"].append((idx, {
                "vectors": np.asarray(res["vectors"]),
                "labels": np.asarray(res["labels"]),
                "scores": np.asarray(res["scores"]),
            }))
        if self.eval_motion and "trajs_3d" in res:
            v = frame["gt_valid"]
            gt_cum = (np.cumsum(frame["gt_agent_fut_trajs"][v], axis=1)
                      + frame["gt_bboxes_3d"][v][:, None, :2])
            self.acc["mot_gt"].append((idx, {
                "boxes": frame["gt_bboxes_3d"][v][:, :2],
                "names": det_gt_entry["names"],
                "fut_trajs": gt_cum,
                "fut_masks": frame["gt_agent_fut_masks"][v],
            }))
            self.acc["mot_pred"].append((idx, {
                "boxes": det_pred_entry["boxes"][:, :2],
                "names": det_pred_entry["names"],
                "scores": det_pred_entry["scores"],
                "trajs": np.asarray(res["trajs_3d"]),
                "traj_scores": np.asarray(res["trajs_score"]),
            }))


def _summarize(acc: Dict[str, List]) -> Dict[str, Dict[str, float]]:
    from . import planning as plan_eval

    def ordered(key):
        return [v for _, v in sorted(acc[key], key=lambda t: t[0])]

    summary: Dict[str, Dict[str, float]] = {}
    per_frame = ordered("planning")
    if per_frame:
        summary["planning"] = plan_eval.aggregate_planning_metrics(per_frame)
    det_gt, det_pred = ordered("det_gt"), ordered("det_pred")
    if det_gt and acc.get("_eval_det"):
        from .detection import evaluate_detection

        summary["detection"] = evaluate_detection(det_gt, det_pred)
    map_gt, map_pred = ordered("map_gt"), ordered("map_pred")
    if map_gt:
        from .map import evaluate_map

        summary["map"] = evaluate_map(map_gt, map_pred)
    mot_gt, mot_pred = ordered("mot_gt"), ordered("mot_pred")
    if mot_gt:
        from .motion import evaluate_motion

        summary["motion"] = evaluate_motion(mot_gt, mot_pred)
    return summary


# --------------------------------------------------------------------------
# Runner
# --------------------------------------------------------------------------

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
    batch_slots: int = 1,
    rank: int = 0,
    world: int = 1,
    gather_dir: Optional[str] = None,
    gather_timeout: float = 1800.0,
    num_workers: int = 0,
) -> Optional[Dict[str, Dict[str, float]]]:
    """Evaluate the val split; returns the metric summary (rank 0) or None
    (other ranks, whose records were written to ``gather_dir``)."""
    import jax
    import jax.numpy as jnp

    from .. import postprocess
    from ..configs.model import assert_supported_batch
    from ..models.detector import HiPAD
    from ..train.train_step import META_KEYS

    if batch_slots > 1:
        # refuse shapes that hard-crash the axon TPU worker
        # (tools/repro_bs2_fault.py, tools/PERF_NOTES.md)
        assert_supported_batch(cfg, batch_slots)
    model = HiPAD(cfg, dtype=dtype)

    @jax.jit
    def step(variables, images, metas, banks):
        outputs, new_banks = model.apply(variables, images, metas, banks,
                                         train=False)
        return postprocess.post_process_arrays(
            cfg, outputs, metas["gt_ego_fut_cmd"]
        ), new_banks

    @jax.jit
    def step_batched(variables, images, metas, banks, live):
        outputs, new_banks = model.apply(variables, images, metas, banks,
                                         train=False)
        merged = jax.tree.map(
            lambda n, o: jnp.where(
                live.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
            new_banks, banks)
        return postprocess.post_process_arrays(
            cfg, outputs, metas["gt_ego_fut_cmd"]
        ), merged

    n = len(dataset) if max_frames is None else min(max_frames, len(dataset))
    spans = sequence_spans(dataset.flag, n)
    my_spans = rank_spans(spans, rank, world) if world > 1 else spans

    col = _Collector(eval_planning, eval_det, eval_map, eval_motion)

    def load(idx):
        return dataset[{"idx": idx, "aug_config": None}]

    def to_metas(frames):
        stacked = {}
        for k in META_KEYS:
            if k in frames[0]:
                stacked[k] = jnp.asarray(
                    np.stack([np.asarray(f[k]) for f in frames]))
        return stacked

    def run_first(idx, frame):
        """Sequence-initial frame: the bs=1 single-frame variant (banks=None,
        reference first-frame semantics)."""
        images = jnp.asarray(frame["images"])[None]
        decoded, banks1 = step(variables, images, to_metas([frame]), None)
        col.collect(idx, frame, postprocess.to_result_dicts(decoded)[0])
        return banks1

    if batch_slots <= 1:
        for s, e in my_spans:
            banks = None
            for i in range(s, e):
                frame = load(i)
                if i == s:
                    banks = run_first(i, frame)
                    continue
                images = jnp.asarray(frame["images"])[None]
                decoded, banks = step(variables, images, to_metas([frame]),
                                      banks)
                col.collect(i, frame, postprocess.to_result_dicts(decoded)[0])
        acc = col.acc
    else:
        B = batch_slots
        slots = _assign_slots(my_spans, B)
        # flatten each slot's spans into (frame_idx, is_initial) streams
        streams = [[(i, i == s) for s, e in sl for i in range(s, e)]
                   for sl in slots]
        ptr = [0] * B
        banks_b = None
        pool = None
        if num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(num_workers)
        try:
            while any(ptr[k] < len(streams[k]) for k in range(B)):
                # 1) sequence-initial frames: bs=1 path, scatter bank slot
                for k in range(B):
                    if ptr[k] < len(streams[k]) and streams[k][ptr[k]][1]:
                        idx = streams[k][ptr[k]][0]
                        banks1 = run_first(idx, load(idx))
                        if banks_b is None:
                            banks_b = jax.tree.map(
                                lambda x: jnp.repeat(x, B, axis=0), banks1)
                        else:
                            banks_b = jax.tree.map(
                                lambda b, x, k=k: b.at[k].set(x[0]),
                                banks_b, banks1)
                        ptr[k] += 1
                # 2) batched temporal step over live slots
                active = [k for k in range(B) if ptr[k] < len(streams[k])]
                if not active:
                    continue
                reqs = [streams[k][ptr[k]][0] for k in active]
                frames = (list(pool.map(load, reqs)) if pool
                          else [load(i) for i in reqs])
                by_slot = dict(zip(active, frames))
                batch_frames = [by_slot.get(k, frames[0]) for k in range(B)]
                live = jnp.asarray(np.isin(np.arange(B), active))
                images = jnp.asarray(
                    np.stack([f["images"] for f in batch_frames]))
                decoded, banks_b = step_batched(
                    variables, images, to_metas(batch_frames), banks_b, live)
                results = postprocess.to_result_dicts(decoded)
                for k in active:
                    col.collect(streams[k][ptr[k]][0], by_slot[k], results[k])
                    ptr[k] += 1
        finally:
            if pool:
                pool.shutdown()
        acc = col.acc

    acc["_eval_det"] = eval_det

    if world > 1:
        if not gather_dir:
            raise ValueError("world > 1 requires gather_dir")
        os.makedirs(gather_dir, exist_ok=True)
        part = os.path.join(gather_dir, f"eval_part_{rank}.pkl")
        tmp = part + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(acc, f)
        os.replace(tmp, part)
        if rank != 0:
            return None
        # rank 0: gather in rank order (`apis/test.py:122-167` semantics)
        deadline = time.time() + gather_timeout
        for r in range(1, world):
            path = os.path.join(gather_dir, f"eval_part_{r}.pkl")
            while not os.path.exists(path):
                if time.time() > deadline:
                    raise TimeoutError(f"eval gather: missing {path}")
                time.sleep(0.2)
            with open(path, "rb") as f:
                acc_r = pickle.load(f)
            for k, v in acc_r.items():
                if isinstance(v, list):
                    acc[k].extend(v)

    return _summarize(acc)
