"""End-to-end open-loop evaluation: synthetic pkl -> dataset -> streaming
model inference -> STP3 planning summary (the tools/test.py path)."""

import os
import pickle
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import data_converter as dc  # noqa: E402

from hipad_tpu.configs.model import tiny  # noqa: E402
from hipad_tpu.data.bench2drive import Bench2DriveDataset  # noqa: E402
from hipad_tpu.eval.runner import run_openloop_eval  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from test_dataset_roundtrip import _raw_anno

    tmp = tmp_path_factory.mktemp("eval")
    frames = []
    for route in range(2):
        last = {}
        # 8 s per route so mid-route frames have the full 3 s 2 Hz future
        for i in range(80):
            fr = dc.convert_frame(_raw_anno(i / 10.0, 0.5 * i),
                                  f"v1/Town01_route{route}", i, "Town01", last)
            frames.append(fr)
    pkl = tmp / "val.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(frames, f)

    from hipad_tpu.configs.model import GROUND_HEIGHT, PointKeypointSpec

    cfg = tiny(
        num_cams=6, input_size=(64, 96), ego_fut_ts=6, fut_ts=6,
        plan_kps=PointKeypointSpec(6, 2, (0.0, 0.5), GROUND_HEIGHT),
        plan_anchor_types=(("temp", "2hz"), ("spat", "2m"),
                           ("speed", "2hz", (0.0, 3.0)),
                           ("speed", "2hz", (3.0, 999.0))),
        plan_anchor_refer=("spat", "2m"), plan_speed_refer=("temp", "2hz"),
    )
    aug_conf = {
        "resize_lim": (0.4, 0.4), "final_dim": (64, 96),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0.0, 0.0),
        "H": 160, "W": 240, "rand_flip": False, "rot3d_range": (0.0, 0.0),
    }
    dataset = Bench2DriveDataset(
        ann_file=str(pkl), map_file=None, test_mode=True,
        plan_anchor_types=cfg.plan_anchor_types, data_aug_conf=aug_conf,
    )

    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS
    import jax.numpy as jnp

    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))
    return cfg, variables, dataset


def test_openloop_eval_produces_planning_summary(setup):
    cfg, variables, dataset = setup
    summary = run_openloop_eval(cfg, variables, dataset, max_frames=8)
    assert "planning" in summary
    pl = summary["planning"]
    for k in ("plan_L2_1s", "plan_L2_2s", "plan_L2_3s", "plan_L2_avg",
              "plan_obj_box_col_avg"):
        assert k in pl
        assert np.isfinite(pl[k])


def test_openloop_eval_all_tasks(setup):
    cfg, variables, dataset = setup
    summary = run_openloop_eval(cfg, variables, dataset, max_frames=4,
                                eval_det=True, eval_map=True, eval_motion=True)
    assert "detection" in summary
    assert "mAP" in summary["detection"]
    # synthetic world has no map elements -> map summary may be empty dict,
    # but the pipeline must run without error; motion produces EPA per class
    assert "motion" in summary or "map" in summary


def _flat(summary):
    return {f"{k}/{m}": float(x) for k, d in summary.items()
            for m, x in d.items()}


def test_batched_eval_matches_streaming(setup):
    """batch_slots=B streams B sequences per dispatch with per-slot bank
    carries; per-frame records (and so the summary) must match the bs=1
    streaming loop. Uses both synthetic routes so both slots are live."""
    cfg, variables, dataset = setup
    n = 24  # three 8-frame sub-sequences (split_group interleaving), so both
    # slots are live and sequence resets happen mid-stream
    stream = run_openloop_eval(cfg, variables, dataset, max_frames=n)
    batched = run_openloop_eval(cfg, variables, dataset, max_frames=n,
                                batch_slots=2, num_workers=2)
    fs, fb = _flat(stream), _flat(batched)
    assert set(fs) == set(fb)
    for k in fs:
        assert fb[k] == pytest.approx(fs[k], rel=1e-4, abs=1e-5), k


def test_multirank_eval_matches_single(setup, tmp_path):
    """Contiguous sequence-aligned rank shards + rank-ordered pickle gather
    (`apis/test.py:122-167` semantics) reproduce the single-rank summary.
    The gather is filesystem-based (no collective), so running the two ranks
    sequentially in-process exercises exactly the production code path."""
    cfg, variables, dataset = setup
    n = 24
    single = run_openloop_eval(cfg, variables, dataset, max_frames=n)
    gd = str(tmp_path / "gather")
    r1 = run_openloop_eval(cfg, variables, dataset, max_frames=n,
                           rank=1, world=2, gather_dir=gd)
    assert r1 is None
    merged = run_openloop_eval(cfg, variables, dataset, max_frames=n,
                               rank=0, world=2, gather_dir=gd)
    fs, fm = _flat(single), _flat(merged)
    assert set(fs) == set(fm)
    for k in fs:
        assert fm[k] == pytest.approx(fs[k], rel=1e-6, abs=1e-8), k


def test_rank_spans_partition():
    from hipad_tpu.eval.runner import rank_spans, sequence_spans

    flags = np.array([0] * 7 + [1] * 5 + [2] * 9 + [3] * 3)
    spans = sequence_spans(flags, len(flags))
    assert spans == [(0, 7), (7, 12), (12, 21), (21, 24)]
    parts = [rank_spans(spans, r, 3) for r in range(3)]
    # every sequence on exactly one rank, contiguous and ordered
    assert [sp for p in parts for sp in p] == spans
    assert all(p for p in parts)


def test_report_tables_render():
    """Reference-style report tables render for every eval section
    (`bench2drive_dataset.py:1457-1597` counterpart)."""
    from hipad_tpu.eval.report import (format_map_table, format_motion_table,
                                       format_planning_table, format_summary)

    map_res = {"AP_Broken": 0.5, "AP_Solid": 0.25, "mAP": 0.375}
    mot_res = {"car_EPA": 0.4, "car_minADE": 1.0, "car_minFDE": 1.5,
               "car_MR": 0.2, "pedestrian_EPA": 0.1, "pedestrian_minADE": 0.8,
               "pedestrian_minFDE": 1.2, "pedestrian_MR": 0.3}
    plan_res = {"plan_L2_1s": 0.2, "plan_L2_2s": 0.5, "plan_L2_3s": 1.0,
                "plan_obj_col_1s": 0.0, "plan_obj_col_2s": 0.0,
                "plan_obj_col_3s": 0.01, "plan_obj_box_col_1s": 0.0,
                "plan_obj_box_col_2s": 0.01, "plan_obj_box_col_3s": 0.02,
                "plan_L2_avg": 0.566, "plan_obj_box_col_avg": 0.01}
    assert "map: 0.375" in format_map_table(map_res)
    mt = format_motion_table(mot_res)
    assert "car" in mt and "0.4000" in mt and "miss_rate_err" in mt
    pt = format_planning_table(plan_res)
    assert "avg" in pt and "0.5660" in pt
    full = format_summary({"map": map_res, "motion": mot_res,
                           "planning": plan_res})
    assert "map: 0.375" in full and "pedestrian" in full and "avg" in full
