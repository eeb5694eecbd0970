"""Converter -> pkl -> Bench2DriveDataset round trip on synthetic raw logs.

Builds raw CARLA-style anno dicts (the converter's input contract), converts
them to the info-dict format, and exercises the full dataset path: frame
interleaving, ego temporal/spatial GT synthesis, agent tracks, command/target
points and fixed-capacity padding — all without real data.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import data_converter as dc  # noqa: E402

from hipad_tpu.data.bench2drive import Bench2DriveDataset  # noqa: E402


def _raw_anno(t: float, ego_x: float):
    """One synthetic CARLA anno dict at 10 Hz; ego drives +x at 5 m/s."""
    def cam(yaw):
        c2e = np.eye(4)
        c2e[0, 3] = 1.0
        return {
            "cam2ego": c2e.tolist(),
            "intrinsic": [[1142.5, 0, 800], [0, 1142.5, 450], [0, 0, 1]],
            "world2cam": np.eye(4).tolist(),
        }

    ego_box = {
        "class": "ego_vehicle", "location": [ego_x, 0.0, 0.0],
        "center": [ego_x, 0.0, 0.0], "extent": [2.45, 0.92, 0.745],
        "rotation": [0, 0, 0], "distance": 0.0,
        "world2ego": np.linalg.inv(dc.yaw_matrix(0.0) + 0).tolist(),
    }
    # one moving car 10 m ahead, one pedestrian to the side
    car2world = np.eye(4)
    car2world[0, 3] = ego_x + 10.0
    car = {
        "class": "vehicle.car", "type_id": "vehicle.tesla.model3", "id": 7,
        "location": [ego_x + 10, 0.0, 0.0], "center": [ego_x + 10, 0.0, 0.0],
        "extent": [2.4, 0.9, 0.7], "rotation": [0, 0, 0], "distance": 10.0,
        "speed": 3.0, "num_points": 50,
        "world2vehicle": np.linalg.inv(car2world).tolist(),
    }
    ped = {
        "class": "walker", "type_id": "walker.pedestrian.0001", "id": 9,
        "location": [ego_x + 5, 4.0, 0.0], "center": [ego_x + 5, 4.0, 0.0],
        "extent": [0.3, 0.3, 0.9], "rotation": [0, 0, 30.0], "distance": 6.4,
        "num_points": 8,
    }
    w2l = np.eye(4)
    w2l[0, 3] = -ego_x  # world2lidar in CARLA frame before conversions
    return {
        "x": ego_x, "y": 0.0, "theta": np.pi / 2, "speed": 5.0,
        "acceleration": [0.1, 0.0, 0.0], "angular_velocity": [0.0, 0.0, 0.01],
        "steer": 0.05,
        "command_far": 4, "command_near": 4,
        "x_command_far": ego_x + 30, "y_command_far": 0.0,
        "x_command_near": ego_x + 10, "y_command_near": 0.0,
        "bounding_boxes": [ego_box, car, ped],
        "sensors": {
            **{cam_name: cam(0) for cam_name in dc.CAMERAS},
            "LIDAR_TOP": {"lidar2ego": np.eye(4).tolist(),
                          "world2lidar": w2l.tolist()},
        },
    }


@pytest.fixture(scope="module")
def tiny_pkl(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("b2d")
    frames = []
    # two sequences so the converter-side folder-change logic is exercised
    for route in range(2):
        last_pos = {}
        for i in range(40):  # 4 s at 10 Hz
            anno = _raw_anno(i / 10.0, ego_x=5.0 * i / 10.0)
            fr = dc.convert_frame(anno, f"v1/Town01_route{route}", i, "Town01",
                                  last_pos)
            assert fr is not None
            frames.append(fr)
    path = tmp / "b2d_infos_val.pkl"
    with open(path, "wb") as f:
        pickle.dump(frames, f)
    return str(path)


def test_dataset_loads_and_pads(tiny_pkl):
    ds = Bench2DriveDataset(
        ann_file=tiny_pkl, map_file=None, split_group=5,
        plan_anchor_types=(("temp", "2hz"), ("temp", "5hz"), ("spat", "2m")),
    )
    assert len(ds) == 80
    frame = ds[{"idx": 1, "aug_config": None}]
    assert frame["images"].shape == (6, 352, 640, 3)
    assert frame["gt_bboxes_3d"].shape[0] == frame["gt_valid"].shape[0]
    assert frame["gt_valid"].sum() == 2  # car + pedestrian
    assert frame["projection_mat"].shape == (6, 4, 4)
    assert frame["gt_ego_fut_cmd"].argmax() == 3  # LANE FOLLOW
    assert np.isfinite(frame["target_point"]).all()


def test_ego_temporal_trajs_match_motion(tiny_pkl):
    """Ego moves +5 m/s along lidar-y; 2 Hz offsets must be ~2.5 m steps."""
    ds = Bench2DriveDataset(ann_file=tiny_pkl, map_file=None, split_group=5,
                            plan_anchor_types=(("temp", "2hz"),))
    # frame with >=2 predecessors (the reference's clip-init guard zeroes
    # earlier frames) and enough future within its sequence.
    # interval=5 == 2 Hz on the 10 Hz source -> 0.5 s steps of 2.5 m.
    trajs, masks = ds.get_ego_temporal_trajs(4, 6, interval=5)
    valid = masks.astype(bool)
    assert valid[:3].all()
    steps = np.linalg.norm(trajs[valid], axis=1)
    np.testing.assert_allclose(steps, 2.5, atol=0.2)
    # 10 Hz stepping gives 0.5 m offsets
    trajs1, masks1 = ds.get_ego_temporal_trajs(4, 6, interval=1)
    np.testing.assert_allclose(
        np.linalg.norm(trajs1[masks1.astype(bool)], axis=1), 0.5, atol=0.1)


def test_agent_future_tracks(tiny_pkl):
    ds = Bench2DriveDataset(ann_file=tiny_pkl, map_file=None, split_group=5,
                            plan_anchor_types=(("temp", "2hz"),))
    off, mask = ds.get_agent_trajs(1, 6, 1)
    assert off.shape[0] == 2
    # the car is static in world -> in ego frame it recedes ~2.5 m per 0.5 s
    car_idx = 0
    v = np.linalg.norm(off[car_idx][mask[car_idx].astype(bool)], axis=1)
    if len(v):
        np.testing.assert_allclose(v, 2.5, atol=0.3)


def test_spatial_waypoints_spacing(tiny_pkl):
    ds = Bench2DriveDataset(ann_file=tiny_pkl, map_file=None, split_group=5,
                            plan_anchor_types=(("spat", "2m"),))
    off, mask = ds.get_ego_spatial_trajs(0, 6, dict(mode="uniform", sample_distance=2.0))
    sel = mask.astype(bool)
    assert sel.sum() >= 3
    d = np.linalg.norm(off[sel], axis=1)
    np.testing.assert_allclose(d, 2.0, atol=0.6)
