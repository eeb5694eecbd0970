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
