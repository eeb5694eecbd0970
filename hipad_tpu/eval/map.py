"""Online-map evaluation: Chamfer-distance AP (pure numpy).

Compact port of `datasets/evaluation/map/{mean_ap,tpfp,tpfp_chamfer}.py`
(585 LoC upstream, multiprocess): per class, predictions matched to GT
polylines when the symmetric Chamfer distance is below a threshold
(0.5 / 1.0 / 1.5 m), AP by score-ranked sweep with 101-point interpolation.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

THRESHOLDS = (0.5, 1.0, 1.5)
N_SAMPLE_PTS = 101


def _resample(line: np.ndarray, num: int = 100) -> np.ndarray:
    seg = np.linalg.norm(np.diff(line, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if s[-1] < 1e-9:
        return np.tile(line[:1], (num, 1))
    t = np.linspace(0, s[-1], num)
    return np.stack([np.interp(t, s, line[:, 0]), np.interp(t, s, line[:, 1])], axis=1)


def chamfer_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric mean Chamfer distance between two resampled polylines."""
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return float(0.5 * (d.min(axis=1).mean() + d.min(axis=0).mean()))


def evaluate_map(
    gt_by_frame: List[Dict],
    pred_by_frame: List[Dict],
    num_classes: int = 4,
    class_names: Sequence[str] = ("Broken", "Solid", "SolidSolid", "Center"),
    thresholds: Sequence[float] = THRESHOLDS,
    score_threshold: float = 0.0,
) -> Dict[str, float]:
    """Each GT frame: {"vectors": [list of [P,2]], "labels": [N]};
    predictions add "scores". -> {mAP, AP_{cls}@{th}, AP_{cls}}."""
    results = {}
    ap_per_class = []
    for cls in range(num_classes):
        aps = []
        for th in thresholds:
            npos, preds = 0, []
            for fi, (g, p) in enumerate(zip(gt_by_frame, pred_by_frame)):
                gsel = [v for v, l in zip(g["vectors"], g["labels"]) if l == cls]
                npos += len(gsel)
                for v, l, s in zip(p["vectors"], p["labels"], p["scores"]):
                    if l == cls and s >= score_threshold:
                        preds.append((float(s), fi, np.asarray(v)))
            if npos == 0:
                continue
            if not preds:
                aps.append(0.0)
                continue
            preds.sort(key=lambda t: -t[0])
            gt_cache = {}
            taken = set()
            tp, fp = [], []
            for s, fi, v in preds:
                if fi not in gt_cache:
                    g = gt_by_frame[fi]
                    gt_cache[fi] = [
                        _resample(np.asarray(vec)) for vec, l in
                        zip(g["vectors"], g["labels"]) if l == cls
                    ]
                vr = _resample(v)
                best_d, best_j = np.inf, None
                for j, gv in enumerate(gt_cache[fi]):
                    if (fi, j) in taken:
                        continue
                    d = chamfer_distance(vr, gv)
                    if d < best_d:
                        best_d, best_j = d, j
                if best_j is not None and best_d < th:
                    taken.add((fi, best_j))
                    tp.append(1)
                    fp.append(0)
                else:
                    tp.append(0)
                    fp.append(1)
            tp = np.cumsum(tp).astype(float)
            fp = np.cumsum(fp).astype(float)
            rec = tp / npos
            prec = tp / (tp + fp)
            ri = np.linspace(0, 1, N_SAMPLE_PTS)
            pi = np.interp(ri, rec, prec, right=0)
            ap = float(pi.mean())
            aps.append(ap)
            results[f"AP_{class_names[cls]}@{th}"] = ap
        if aps:
            results[f"AP_{class_names[cls]}"] = float(np.mean(aps))
            ap_per_class.append(np.mean(aps))
    results["mAP"] = float(np.mean(ap_per_class)) if ap_per_class else 0.0
    return results
