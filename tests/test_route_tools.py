"""Leaderboard route-tool parity: the reference's own statistic/ability/
efficiency scripts as golden oracles on synthetic leaderboard records.

These tools run after a CARLA evaluation, which this environment cannot
host — but their INPUTS are plain JSON with a fixed schema
(`_checkpoint.records[*]` route records + per-route `metric_info.json`),
so every aggregation rule is testable against the reference scripts
executed in place:

  * `statistic_route_json.py` / `merge_route_json.py` → tools/route_stats.py
  * `ability_benchmark.py` (Ability table; the CARLA junction refinement
    is out of scope here)                             → tools/ability_benchmark.py
  * `efficiency_smoothness_benchmark.py`              → tools/efficiency_benchmark.py
"""

import ast
import importlib.util
import json
import sys
import types

import numpy as np
import pytest

REF_TOOLS = "/root/reference/bench2drive/tools"
sys.path.insert(0, "/root/repo")  # tools/ imports


def _load_ref(name, stubs=()):
    for s in stubs:
        if s not in sys.modules:
            mod = types.ModuleType(s)
            if s == "prettytable":
                class PrettyTable:  # minimal: draw_table only
                    def __init__(self):
                        self.field_names = []
                        self.rows = []

                    def add_row(self, r):
                        self.rows.append(r)

                    def __str__(self):
                        return "\n".join(map(str, self.rows))
                mod.PrettyTable = PrettyTable
            sys.modules[s] = mod
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"{REF_TOOLS}/{name}.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# ---------------------------------------------------------------- records


def _record(route_id, status, infractions=None, score=77.5,
            scenario="HardBreakRoute", save_name=None):
    base = {k: [] for k in (
        "collisions_pedestrian", "collisions_vehicle", "collisions_layout",
        "red_light", "stop_infraction", "outside_route_lanes",
        "min_speed_infractions", "yield_emergency_vehicle_infractions",
        "scenario_timeouts", "route_dev", "vehicle_blocked", "route_timeout")}
    base.update(infractions or {})
    return {
        "route_id": f"RouteScenario_{route_id}",
        "town_name": "Town12",
        "scenario_name": scenario,
        "status": status,
        "index": 0,
        "save_name": save_name or f"route_{route_id}",
        "scores": {"score_composed": score, "score_route": 90.0,
                   "score_penalty": 0.9},
        "infractions": base,
    }


RECORDS = [
    _record(0, "Perfect", score=100.0),
    _record(1, "Completed",
            infractions={"min_speed_infractions": ["x 43.5% y"]},
            score=92.0),                                     # success
    _record(2, "Completed",
            infractions={"collisions_vehicle": ["hit"]}, score=60.0),
    _record(3, "Failed - Agent got blocked", score=11.0,
            scenario="YieldToEmergencyVehicle"),
    _record(4, "Completed", infractions={"red_light": ["ran red light"]},
            score=70.0, scenario="SignalizedJunctionLeftTurn"),
]


def _checkpoint_file(tmp_path, name, records, with_global=True):
    p = tmp_path / name
    p.write_text(json.dumps({"_checkpoint": {
        "records": records,
        "progress": [len(records), len(records)],
        "global_record": {"status": "done"} if with_global else {},
    }}))
    return p


# ------------------------------------------------------- route_stats parity


def test_is_success_matches_reference():
    ref = _load_ref("statistic_route_json", stubs=("prettytable",))
    from tools import route_stats

    cases = RECORDS + [
        _record(9, "Completed",
                infractions={"min_speed_infractions": ["a"],
                             "stop_infraction": ["b"]}),
        _record(10, "Failed - TickRuntime"),
    ]
    for rec in cases:
        assert route_stats.is_success(rec) == ref.is_success(rec), rec


def test_route_stats_aggregate_matches_reference_formula(tmp_path):
    """DS = mean(score_composed), SR = successes/routes*100
    (statistic_route_json.py:121-122)."""
    ref = _load_ref("statistic_route_json", stubs=("prettytable",))
    from tools import route_stats

    _checkpoint_file(tmp_path, "shard0.json", RECORDS[:3])
    _checkpoint_file(tmp_path, "shard1.json", RECORDS[3:])
    _checkpoint_file(tmp_path, "broken.json", [RECORDS[0]],
                     with_global=False)  # incomplete shard: skipped
    rows, incomplete = route_stats.collect(str(tmp_path))

    assert len(rows) == len(RECORDS)
    assert [p.name for p in map(__import__("pathlib").Path, incomplete)] \
        == ["broken.json"]
    ds = sum(r["driving_score"] for r in rows) / len(rows)
    sr = sum(r["success"] for r in rows)

    exp_ds = np.average([r["scores"]["score_composed"] for r in RECORDS])
    exp_sr = sum(ref.is_success(r) for r in RECORDS)
    assert ds == pytest.approx(exp_ds)
    assert sr == exp_sr == 2  # Perfect + min-speed-only Completed


# -------------------------------------------------------- ability parity


def test_ability_table_matches_reference():
    """Our ABILITY grouping == the reference's `Ability` dict
    (ability_benchmark.py:12-18; not importable there — it imports carla —
    so extract the literal from the AST)."""
    from tools.ability_benchmark import ABILITY

    tree = ast.parse(open(f"{REF_TOOLS}/ability_benchmark.py").read())
    ref_tbl = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and getattr(node.targets[0], "id", "") == "Ability"):
            ref_tbl = ast.literal_eval(node.value)
    assert ref_tbl is not None
    assert set(ABILITY) == set(ref_tbl)
    for k in ref_tbl:
        # reference lists contain duplicates (e.g. Traffic_Signs repeats
        # OppositeVehicleTakingPriority); membership semantics are set-like
        assert set(ABILITY[k]) == set(ref_tbl[k]), k


def test_ability_success_attribution():
    from tools.ability_benchmark import ABILITY, is_success

    # HardBreakRoute → Emergency_Brake only; SignalizedJunctionLeftTurn →
    # Merging AND Traffic_Signs; YieldToEmergencyVehicle → Give_Way.
    stats = {a: [0, 0] for a in ABILITY}
    for rec in RECORDS:
        ok = is_success(rec)
        for ability, scen in ABILITY.items():
            if rec["scenario_name"] in scen:
                stats[ability][1] += 1
                stats[ability][0] += ok
    assert stats["Emergency_Brake"] == [2, 3]   # routes 0,1 ok; 2 failed
    assert stats["Give_Way"] == [0, 1]
    assert stats["Merging"] == [0, 1]           # red-light route failed
    assert stats["Traffic_Signs"] == [0, 1]


# ----------------------------------------------------- efficiency parity


def _synthetic_state(rng, n, wild=False):
    scale = 6.0 if wild else 1.0
    yaw = rng.uniform(-np.pi, np.pi)
    heading = yaw + np.cumsum(rng.randn(n) * 0.02 * scale)
    fwd = np.stack([np.cos(heading), np.sin(heading),
                    np.zeros(n)], axis=1)
    rgt = np.stack([-np.sin(heading), np.cos(heading),
                    np.zeros(n)], axis=1)
    return {
        "acceleration": rng.randn(n, 3) * 0.8 * scale,
        "angular_velocity": np.stack(
            [rng.randn(n) * 0.05, rng.randn(n) * 0.05,
             rng.randn(n) * 0.25 * scale], axis=1),
        "forward_vector": fwd,
        "right_vector": rgt,
        "location": rng.randn(n, 3) * 50,
        "rotation": np.stack([np.zeros(n), np.zeros(n),
                              np.degrees(heading)], axis=1),
    }


@pytest.mark.parametrize("n,wild", [(20, False), (45, False), (45, True),
                                    (160, False), (160, True)])
def test_comfort_matches_reference(n, wild):
    ref = _load_ref("efficiency_smoothness_benchmark")
    from tools import efficiency_benchmark as eff

    rng = np.random.RandomState(n + int(wild))
    st = _synthetic_state(rng, n, wild)
    golden = ref.seg_compute_comfort_metric(**st)
    if isinstance(golden, list):  # >1 window: reference returns per-window
        golden = golden.count(True) / len(golden)
    ours = eff.route_comfort(st["acceleration"], st["angular_velocity"],
                             st["forward_vector"], st["right_vector"])
    assert ours == pytest.approx(float(golden))


def test_generate_video_stitches_bev_frames(tmp_path, monkeypatch):
    """tools/generate_video.py end-to-end: bev_*.png frames -> animated GIF
    (counterpart of the reference's ffmpeg mp4 composition)."""
    from PIL import Image

    from tools import generate_video

    for i in range(4):
        Image.new("RGB", (32, 24), (10 * i, 0, 0)).save(
            tmp_path / f"bev_{i:04d}.png")
    out = tmp_path / "run.gif"
    monkeypatch.setattr(sys, "argv", [
        "generate_video", "--frames", str(tmp_path), "--out", str(out)])
    generate_video.main()
    gif = Image.open(out)
    assert gif.is_animated and gif.n_frames == 4


def test_driving_efficiency_matches_reference(tmp_path):
    ref = _load_ref("efficiency_smoothness_benchmark")
    from tools import efficiency_benchmark as eff

    recs = [
        _record(0, "Completed", infractions={"min_speed_infractions": [
            "speed was 37.25% of traffic", "speed 61.0% there"]}),
        _record(1, "Completed", infractions={"min_speed_infractions": [
            "bogus 20000% reading", "ok 55.5% kept"]}),
        _record(2, "Perfect"),  # no infraction → not counted
    ]
    # reference read_from_json also loads metric_info for every record
    rng = np.random.RandomState(0)
    for rec in recs:
        d = tmp_path / rec["save_name"]
        d.mkdir()
        st = _synthetic_state(rng, 25)
        info = {str(i): {k: st[k][i].tolist() for k in st}
                for i in range(25)}
        (d / "metric_info.json").write_text(json.dumps(info))
    merged = tmp_path / "merged.json"
    merged.write_text(json.dumps({"_checkpoint": {"records": recs}}))

    _, golden_eff = ref.read_from_json(str(merged), str(tmp_path))
    ours = [e for e in (eff.parse_driving_efficiency(r) for r in recs)
            if e is not None]
    assert ours == pytest.approx(golden_eff)
    assert len(ours) == 2 and ours[0] == pytest.approx((37.25 + 61.0) / 2)
