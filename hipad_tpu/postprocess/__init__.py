"""Unified post-processing: model outputs -> per-frame result dicts.

TPU counterpart of ``SparseOneDecoder.post_process``
(`models/sparse_onedecoder.py:1581-1605`) + ``SparseHead.post_process``
(`models/sparse_head.py:108-156`): the heavy parts (top-k, collision
rescoring) are jit-friendly batched jnp in `det.py`/`map.py`/`plan.py`;
``post_process`` assembles the reference's per-sample dict layout on host.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..configs.model import HiPADConfig
from .det import decode_det, decode_motion
from .map import decode_map
from .plan import decode_plan


def post_process_arrays(
    cfg: HiPADConfig,
    outputs: Dict,
    cmd_onehot: jnp.ndarray,
    with_rescore: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Batched (jittable) decode of every task head."""
    res: Dict[str, jnp.ndarray] = {}
    det_out = outputs.get("det")
    motion_out = outputs.get("motion")
    if det_out is not None:
        det_res = decode_det(
            det_out["classification"][-1],
            det_out["prediction"][-1],
            instance_id=det_out.get("instance_id"),
            quality=det_out["quality"][-1],
            num_output=cfg.det_num_output,
        )
        res.update({f"det_{k}": v for k, v in det_res.items()})
        if motion_out is not None:
            mo = decode_motion(
                det_res,
                motion_out["classification"][-1],
                motion_out["prediction"][-1],
            )
            res.update({f"motion_{k}": v for k, v in mo.items()})
    if "map" in outputs:
        mp = decode_map(
            outputs["map"]["classification"][-1], outputs["map"]["prediction"][-1]
        )
        res.update({f"map_{k}": v for k, v in mp.items()})
    if "plan" in outputs:
        res.update(
            decode_plan(cfg, outputs["plan"], det_out, motion_out, cmd_onehot,
                        with_rescore=with_rescore)
        )
    if "ego" in outputs:
        res["ego_status"] = outputs["ego"]["status"][-1][:, 0]
    return res


def to_result_dicts(arrays: Dict[str, jnp.ndarray]) -> List[Dict[str, np.ndarray]]:
    """Split batched arrays into the reference's per-sample result dicts."""
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    bs = next(iter(arrays.values())).shape[0]
    out = []
    for i in range(bs):
        d: Dict[str, np.ndarray] = {}
        for k, v in arrays.items():
            key_map = {
                "det_boxes_3d": "boxes_3d", "det_scores_3d": "scores_3d",
                "det_labels_3d": "labels_3d", "det_cls_scores": "cls_scores",
                "det_instance_ids": "instance_ids",
                "motion_trajs_3d": "trajs_3d", "motion_trajs_score": "trajs_score",
                "map_vectors": "vectors", "map_scores": "scores",
                "map_labels": "labels",
            }
            d[key_map.get(k, k)] = v[i]
        out.append(d)
    return out


def post_process(
    cfg: HiPADConfig,
    outputs: Dict,
    cmd_onehot,
    with_rescore: bool = True,
) -> List[Dict[str, np.ndarray]]:
    return to_result_dicts(
        post_process_arrays(cfg, outputs, jnp.asarray(cmd_onehot), with_rescore)
    )
