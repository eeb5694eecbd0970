"""Agent (PID, calibration, replay) and eval-metric tests."""

import numpy as np
import pytest

from hipad_tpu.agent.calib import lidar2img_matrices
from hipad_tpu.agent.pid import PIDController
from hipad_tpu.eval.detection import evaluate_detection
from hipad_tpu.eval.map import chamfer_distance, evaluate_map
from hipad_tpu.eval.motion import evaluate_motion
from hipad_tpu.eval.planning import (PlanningMetric, aggregate_planning_metrics,
                                     compute_planner_metric_stp3)


def test_calibration_matches_reference_tables():
    """Computed rig matrices vs. the values hardcoded upstream
    (`hipad_b2d_agent.py:39-134`)."""
    m = lidar2img_matrices()
    expect_front = np.array(
        [[1142.51841, 800.0, 0.0, -952.0],
         [0.0, 450.0, -1142.51841, -809.704417],
         [0.0, 1.0, 0.0, -1.19],
         [0.0, 0.0, 0.0, 1.0]])
    expect_fl = np.array(
        [[0.0, 1394.75744, 0.0, -920.539908],
         [-368.61842, 258.109396, -1142.51841, -647.29675],
         [-0.819152044, 0.573576436, 0.0, -0.829094072],
         [0.0, 0.0, 0.0, 1.0]])
    expect_back = np.array(
        [[-560.166031, -800.0, 0.0, -1288.0],
         [0.0, -450.0, -560.166031, -858.939847],
         [0.0, -1.0, 0.0, -1.61],
         [0.0, 0.0, 0.0, 1.0]])
    np.testing.assert_allclose(m["CAM_FRONT"], expect_front, atol=1e-3)
    np.testing.assert_allclose(m["CAM_FRONT_LEFT"], expect_fl, atol=1e-3)
    np.testing.assert_allclose(m["CAM_BACK"], expect_back, atol=1e-3)


def test_pid_accelerates_toward_waypoints():
    pid = PIDController(waypoint_time=0.2)
    # straight-ahead 5 Hz waypoints, 1 m per 0.2 s = 5 m/s desired
    wps = np.stack([np.zeros(6), np.arange(1, 7)], axis=1)
    steer, throttle, brake, meta = pid.control_pid(wps, None, 0.0, np.array([0, 20.0]))
    assert brake == 0.0
    assert throttle > 0.0
    assert abs(steer) < 0.2
    assert abs(meta["desired_speed"] - 5.0) < 1e-6


def test_pid_brakes_when_stopped_plan():
    pid = PIDController(waypoint_time=0.2)
    wps = np.zeros((6, 2))
    steer, throttle, brake, _ = pid.control_pid(wps, None, 3.0, np.array([0, 20.0]))
    assert brake == 1.0 and throttle == 0.0


def test_detection_eval_perfect_predictions():
    rng = np.random.RandomState(0)
    frames_gt, frames_pred = [], []
    for _ in range(3):
        n = 5
        boxes = np.zeros((n, 9))
        boxes[:, :2] = rng.uniform(-30, 30, (n, 2))
        boxes[:, 3:6] = rng.uniform(1, 3, (n, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        names = np.array(["car"] * n)
        frames_gt.append({"boxes": boxes, "names": names})
        frames_pred.append({"boxes": boxes.copy(), "names": names,
                            "scores": rng.uniform(0.5, 1, n)})
    res = evaluate_detection(frames_gt, frames_pred)
    assert res["AP_car"] > 0.95
    assert res["mATE"] < 0.05
    assert 0 <= res["NDS"] <= 1 + 1e-9


def test_detection_eval_garbage_predictions():
    rng = np.random.RandomState(1)
    gt, pred = [], []
    for _ in range(2):
        boxes = np.zeros((3, 9))
        boxes[:, :2] = rng.uniform(-20, 20, (3, 2))
        boxes[:, 3:6] = 2.0
        gt.append({"boxes": boxes, "names": np.array(["car"] * 3)})
        pb = boxes.copy()
        pb[:, :2] += 30  # all far off
        pred.append({"boxes": pb, "names": np.array(["car"] * 3),
                     "scores": np.ones(3) * 0.9})
    res = evaluate_detection(gt, pred)
    assert res["AP_car"] < 0.05


def test_map_eval_chamfer():
    line = np.stack([np.linspace(0, 10, 20), np.zeros(20)], axis=1)
    assert chamfer_distance(line, line) < 1e-9
    gt = [{"vectors": [line], "labels": np.array([0])}]
    pred = [{"vectors": [line + 0.1], "labels": np.array([0]),
             "scores": np.array([0.9])}]
    res = evaluate_map(gt, pred, num_classes=1, class_names=("Broken",))
    assert res["mAP"] > 0.9


def test_motion_eval_epa():
    gt = [{
        "boxes": np.array([[1.0, 1.0], [10.0, 10.0]]),
        "names": np.array(["car", "car"]),
        "fut_trajs": np.tile(np.array([[1.0, 1.0]]), (2, 6, 1)).cumsum(1),
        "fut_masks": np.ones((2, 6)),
    }]
    trajs = np.tile(gt[0]["fut_trajs"][:, None], (1, 3, 1, 1))
    pred = [{
        "boxes": gt[0]["boxes"].copy(),
        "names": gt[0]["names"],
        "scores": np.array([0.9, 0.9]),
        "trajs": trajs,
        "traj_scores": np.ones((2, 3)),
    }]
    res = evaluate_motion(gt, pred, class_names=("car",))
    assert res["car_EPA"] == 1.0
    assert res["car_minADE"] < 1e-6


def test_stp3_planning_metric():
    metric = PlanningMetric()
    # one parked vehicle 5 m ahead; plan A avoids, plan B drives through it
    boxes = np.array([[0.0, 5.0, 0.0, 2.0, 4.5, 1.5, -np.pi / 2, 0, 0]])
    feats = np.zeros((1, 34))
    feats[0, 12:18] = 1.0  # fut masks
    feats[0, 27] = 0  # vehicle class id
    gt_traj = np.stack([np.linspace(2, 12, 6), np.zeros(6)], axis=1)  # x fwd
    plan_avoid = gt_traj.copy()
    plan_hit = np.stack([np.zeros(6), np.linspace(1, 6, 6)], axis=1)  # +y = into agent

    m_avoid = compute_planner_metric_stp3(metric, plan_avoid, gt_traj, boxes,
                                          feats, True)
    m_hit = compute_planner_metric_stp3(metric, plan_hit, gt_traj, boxes,
                                        feats, True)
    assert m_avoid["plan_L2_3s"] < 1e-6
    assert m_hit["plan_obj_box_col_3s"] > 0
    assert m_avoid["plan_obj_box_col_3s"] == 0

    agg = aggregate_planning_metrics([m_avoid, m_hit])
    assert "plan_L2_avg" in agg
