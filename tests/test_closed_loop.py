"""Closed-loop agent integration test: fake sim -> agent -> control.

Exercises the full stack the CARLA adapter uses — JPEG-compressed camera
input, native/numpy preprocessing, streaming inference with the x10 bank
round-robin, plan decode and PID — without a simulator (SURVEY §4.3's mock
pattern).
"""

import jax
import numpy as np
import pytest

from hipad_tpu.agent.core import AgentCore
from hipad_tpu.agent.replay import FakeSim, run_replay
from hipad_tpu.configs.model import tiny


@pytest.fixture(scope="module")
def tiny_agent():
    # 6-camera tiny model so the real calibration applies; small source imgs.
    cfg = tiny(num_cams=6, input_size=(64, 128))
    aug_conf = {
        "resize_lim": (0.4, 0.4), "final_dim": (64, 128),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0.0, 0.0),
        "H": 90, "W": 160, "rand_flip": False, "rot3d_range": (0.0, 0.0),
    }
    import jax.numpy as jnp

    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init({"params": r}, images, metas,
                                             train=False))(jax.random.PRNGKey(0))
    return AgentCore(cfg, variables, dtype=None, jpeg_quality=20,
                     aug_conf=aug_conf, n_banks=3)


def test_replay_runs_and_controls_are_sane(tiny_agent):
    sim = FakeSim(route_length=30.0, img_hw=(90, 160))
    log = run_replay(tiny_agent, max_steps=7, sim=sim)
    assert len(log) == 7
    for entry in log:
        assert -1 <= entry["steer"] <= 1
        assert 0 <= entry["throttle"] <= 0.75
        assert 0 <= entry["brake"] <= 1
    # banks were populated round-robin
    assert all(b is not None for b in tiny_agent.banks)
    # metadata recorded per step
    assert set(tiny_agent.metric_info) == set(range(7))


def test_agent_bank_roundrobin_reuses_state(tiny_agent):
    """Step k and step k+n_banks hit the same bank slot."""
    n = len(tiny_agent.banks)
    before = [b for b in tiny_agent.banks]
    sim = FakeSim(route_length=1000.0, img_hw=(90, 160))
    run_replay(tiny_agent, max_steps=n, sim=sim)
    after = tiny_agent.banks
    # every slot replaced exactly once over n steps
    assert all(a is not b for a, b in zip(after, before))


def test_scripted_120_tick_drive_regression(tiny_agent):
    """≥100-tick scripted drive (straight + 90° left turn + straight): the
    closest attainable proxy to a CARLA run here (`hipad_b2d_agent.py:
    456-615`). The ego follows the script at 10 m/s while the agent observes
    every tick through a RoutePlanner(4, 50) fed like the reference's
    (`:359-393`). Asserts over 120 ticks / 40 bank wraps:
      * PID stability: every control finite + in-range, steer never pinned
        at a rail for the whole drive;
      * bank round-robin: slot (step % n) is replaced on EVERY tick and the
        other slots are untouched, across all 40 wraps;
      * route planner: pops are monotone (route never regrows), the live
        command transitions exactly 4 -> 1 -> 4 (straight/turn/straight),
        and >= 2 entries always remain."""
    from hipad_tpu.agent.replay import run_scripted_replay, scripted_route

    route = scripted_route(straight=20.0, turn_radius=10.0, turn_deg=90.0,
                           exit_straight=25.0, spacing=2.0)
    n = len(tiny_agent.banks)
    ids = [id(b) for b in tiny_agent.banks]
    rotations = []

    def on_tick(t, agent):
        changed = [i for i, b in enumerate(agent.banks) if id(b) != ids[i]]
        rotations.append(tuple(changed))
        for i in changed:
            ids[i] = id(agent.banks[i])

    log = run_scripted_replay(tiny_agent, route, n_ticks=120, speed=10.0,
                              img_hw=(90, 160), on_tick=on_tick)
    assert len(log) == 120

    # ---- PID stability
    steers = np.array([e["steer"] for e in log])
    for e in log:
        assert np.isfinite([e["steer"], e["throttle"], e["brake"]]).all()
        assert -1 <= e["steer"] <= 1 and 0 <= e["throttle"] <= 0.75
        assert 0 <= e["brake"] <= 1
    assert not (np.abs(steers) == 1.0).all(), "steer pinned at a rail"

    # ---- bank round-robin over wraps: exactly one slot per tick, in order
    start = tiny_agent.step - 119  # fixture is shared; offset to this run
    assert all(len(c) == 1 for c in rotations)
    assert [c[0] for c in rotations] == [(start + t) % n for t in range(120)]

    # ---- route planner pops + command transitions
    lens = [e["route_len"] for e in log]
    assert all(a >= b for a, b in zip(lens, lens[1:])), "route regrew"
    assert lens[0] > lens[-1], "planner never popped"
    assert min(lens) >= 2
    dedup = [log[0]["command"]]
    for e in log[1:]:
        if e["command"] != dedup[-1]:
            dedup.append(e["command"])
    assert dedup == [4, 1, 4], f"command transitions {dedup}"


def test_serving_input_path_matches_training_pipeline():
    """The agent's uint8 serving input path (`prepare_camera` + on-device
    mean/std) must reproduce the TRAINING pipeline byte-for-byte: same PIL
    resize/crop/flip pixels (`augment.py:46-92` counterpart), same RGB
    standardisation (`NormalizeMultiviewImage(to_rgb=True)`, stage2 config
    `hipad_b2d_stage2.py:497`). Guards the uint8-end-to-end optimization
    against drifting from the training input distribution."""
    import jax.numpy as jnp

    from hipad_tpu.agent.core import prepare_camera
    from hipad_tpu.data import pipelines as pp

    rng = np.random.RandomState(7)
    rgb = [rng.randint(0, 256, (90, 160, 3)).astype(np.uint8)
           for _ in range(2)]
    conf = dict(pp.DATA_AUG_CONF, H=90, W=160, final_dim=(32, 64),
                resize_lim=(0.45, 0.45), rot_lim=(0.0, 0.0), rand_flip=False)
    aug = pp.sample_aug_config(conf, test_mode=True)

    # training/eval fp32 path: dataset loads BGR, resize/crop in fp32,
    # normalize_image flips to RGB and standardises on host
    bgr = [im[..., ::-1].astype(np.float32) for im in rgb]
    identity = np.tile(np.eye(4, dtype=np.float32), (len(bgr), 1, 1))
    train_imgs, _ = pp.resize_crop_flip(bgr, identity, aug)
    train_out = pp.normalize_image(train_imgs, to_rgb=True)

    # agent serving path: RGB stays uint8 through resize/crop and the
    # host->device link; normalization runs inside the jitted forward
    served = np.stack([prepare_camera(im, aug, jpeg_quality=None)
                       for im in rgb])
    assert served.dtype == np.uint8
    dev_out = np.asarray(
        (jnp.asarray(served).astype(jnp.float32)
         - jnp.asarray(pp.IMG_MEAN)) / jnp.asarray(pp.IMG_STD))

    np.testing.assert_allclose(dev_out, train_out, atol=1e-5)


def test_split_routes_contiguous(tmp_path):
    """`tools/split_routes.py` (counterpart of bench2drive split_xml)."""
    import sys
    import xml.etree.ElementTree as ET

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    from split_routes import split_contiguous

    root = ET.Element("routes")
    for i in range(11):
        ET.SubElement(root, "route", id=str(i))
    routes = root.findall("route")
    chunks = split_contiguous(routes, 4)
    assert [len(c) for c in chunks] == [3, 3, 3, 2]
    flat = [r.get("id") for c in chunks for r in c]
    assert flat == [str(i) for i in range(11)]  # order preserved


_MOCK_EVALUATOR = '''\
"""Mock leaderboard_evaluator: records the worker's CLI contract and emits
a leaderboard-format checkpoint for the routes it was sharded."""
import json, sys
import xml.etree.ElementTree as ET

args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
records = []
for r in ET.parse(args["--routes"]).getroot().findall("route"):
    rid = int(r.get("id"))
    records.append({
        "route_id": f"RouteScenario_{rid}",
        "town_name": r.get("town"),
        "scenario_name": "MergerIntoSlowTraffic",
        "status": "Failed" if rid == 3 else "Completed",
        "scores": {"score_composed": 100.0 - 10.0 * rid},
        "infractions": {
            "collisions_vehicle": ["hit"] if rid == 3 else [],
            # min-speed alone must NOT fail a route
            "min_speed_infractions": ["slow"] if rid == 1 else [],
        },
    })
out = {"_checkpoint": {"global_record": {"index": len(records)},
                       "records": records},
       "port": args["--port"], "agent": args["--agent"],
       "resume": args["--resume"]}
with open(args["--checkpoint"], "w") as f:
    json.dump(out, f)
'''


def test_run_closed_loop_orchestration_mock_harness(tmp_path):
    """Drives `tools/run_closed_loop.sh` end-to-end against a mock CARLA
    binary + mock leaderboard evaluator (counterpart of
    `bench2drive/leaderboard/scripts/run_evaluation_multi_hipad.sh`): the
    real splitter shards the routes, two workers launch with distinct RPC
    ports, per-worker logs land, and `route_stats.py` merges the checkpoint
    JSONs into the DS/SR headline. Validates the orchestration layer the
    environment's missing simulator otherwise leaves untested."""
    import json
    import os
    import pathlib
    import subprocess
    import sys
    import xml.etree.ElementTree as ET

    repo = pathlib.Path(__file__).parents[1]
    carla_root = tmp_path / "carla"
    carla_root.mkdir()
    # exec so the orchestrator's `kill $CARLA_PID` reaps the whole mock
    (carla_root / "CarlaUE4.sh").write_text(
        "#!/bin/bash\necho carla up\nexec sleep 120\n")
    (carla_root / "CarlaUE4.sh").chmod(0o755)
    lb = tmp_path / "lb" / "leaderboard"
    lb.mkdir(parents=True)
    (lb / "leaderboard_evaluator.py").write_text(_MOCK_EVALUATOR)

    # 5 routes -> 2 contiguous shards via the real splitter CLI
    root = ET.Element("routes")
    for i in range(5):
        ET.SubElement(root, "route", id=str(i), town=f"Town{i % 2 + 1:02d}")
    src = tmp_path / "routes.xml"
    ET.ElementTree(root).write(src)
    splits = tmp_path / "splits"
    subprocess.run([sys.executable, str(repo / "tools" / "split_routes.py"),
                    "--routes", str(src), "--num", "2",
                    "--out-dir", str(splits)], check=True)

    out = tmp_path / "out"
    env = dict(os.environ, TASK_NUM="2", CARLA_BOOT_WAIT="1",
               CARLA_ROOT=str(carla_root),
               LEADERBOARD_ROOT=str(tmp_path / "lb"),
               ROUTES_DIR=str(splits), CKPT="work_dirs/dummy")
    res = subprocess.run(
        ["bash", str(repo / "tools" / "run_closed_loop.sh"), str(out)],
        env=env, capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr + res.stdout

    merged = json.loads((out / "merged.json").read_text())
    # route 3 fails (collision); route 1's min-speed infraction does NOT
    # fail it (`statistic_route_json.py:10-18` semantics)
    assert len(merged["routes"]) == 5
    assert merged["success_rate"] == pytest.approx(80.0)
    assert merged["driving_score"] == pytest.approx(
        sum(100.0 - 10.0 * i for i in range(5)) / 5)
    shard0 = json.loads((out / "route_0.json").read_text())
    shard1 = json.loads((out / "route_1.json").read_text())
    # distinct per-worker CARLA RPC ports (BASE_PORT + 150*i), resume on
    assert {shard0["port"], shard1["port"]} == {"20082", "20232"}
    assert shard0["resume"] == "True"
    # contiguous sharding: worker 0 got routes 0-2, worker 1 got 3-4
    assert [r["route_id"] for r in shard0["_checkpoint"]["records"]] == \
        [f"RouteScenario_{i}" for i in range(3)]
    # per-worker logs landed, and the agent handed to the evaluator is the
    # real in-repo CARLA adapter
    for i in (0, 1):
        assert (out / f"carla_{i}.log").exists()
        assert (out / f"eval_{i}.log").exists()
    assert pathlib.Path(shard0["agent"]).exists()
    assert shard0["agent"].endswith("hipad_tpu/agent/carla_adapter.py")


def test_agent_composite_visualization(tmp_path):
    """The per-step composite dump (multi-cam mosaic + BEV) renders and is
    saved (`hipad_b2d_agent.py:617-750` counterpart)."""
    import jax.numpy as jnp

    from hipad_tpu.agent.replay import FakeSim, run_replay
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    cfg = tiny(num_cams=6, input_size=(64, 128))
    aug_conf = {
        "resize_lim": (0.4, 0.4), "final_dim": (64, 128),
        "bot_pct_lim": (0.0, 0.0), "rot_lim": (0.0, 0.0),
        "H": 90, "W": 160, "rand_flip": False, "rot3d_range": (0.0, 0.0),
    }
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init({"params": r}, images, metas,
                                             train=False))(jax.random.PRNGKey(0))
    core = AgentCore(cfg, variables, dtype=None, jpeg_quality=None,
                     aug_conf=aug_conf, n_banks=2,
                     visualize_dir=str(tmp_path), visualize_interval=1)
    sim = FakeSim(route_length=30.0, img_hw=(90, 160))
    run_replay(core, max_steps=2, sim=sim)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names, "no composite dump written"
    if names[0].endswith(".jpg"):
        from PIL import Image

        img = np.asarray(Image.open(tmp_path / names[0]))
        h, w = img.shape[:2]
        assert h == 2 * 64 and w == 3 * 128 + 2 * 64  # 2x3 mosaic + BEV
