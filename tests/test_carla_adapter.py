"""Leaderboard-adapter integration test with mock CARLA sensors.

Drives ``HiPADTpuAgent`` (`agent/carla_adapter.py`) — the layer above
``AgentCore`` that test_closed_loop.py already covers — through its real
leaderboard entry points (``setup``/``sensors``/``run_step``) using the
leaderboard's ``input_data`` wire format (`hipad_b2d_agent.py:363-455`:
BGRA camera tuples, 7-float IMU, GNSS lat/lon, speedometer dict) without a
``carla``/``leaderboard`` install: the adapter's import-gated
``AutonomousAgent`` stub and plain-dict control return make the full path
runnable anywhere.
"""

import json
import math
from types import SimpleNamespace

import numpy as np
import pytest

from hipad_tpu.agent.calib import CAMERAS
from hipad_tpu.agent.carla_adapter import HiPADTpuAgent, get_entry_point
from hipad_tpu.agent.planner import EARTH_RADIUS_EQUA, gps_to_location
from hipad_tpu.configs.model import tiny

LAT_REF, LON_REF = 42.0, 2.0


def location_to_gps(x: float, y: float, lat_ref=LAT_REF, lon_ref=LON_REF):
    """Inverse of ``planner.gps_to_location`` (test-side only)."""
    scale = math.cos(lat_ref * math.pi / 180.0)
    lon = (x + scale * lon_ref * math.pi * EARTH_RADIUS_EQUA / 180.0) \
        * 180.0 / (math.pi * EARTH_RADIUS_EQUA * scale)
    my = scale * EARTH_RADIUS_EQUA * math.log(
        math.tan((90.0 + lat_ref) * math.pi / 360.0)) - y
    lat = 360.0 / math.pi * math.atan(
        math.exp(my / (EARTH_RADIUS_EQUA * scale))) - 90.0
    return lat, lon


class TinyAgent(HiPADTpuAgent):
    """Adapter with the test-scale model wired through the real hooks."""

    def _make_config(self, name):
        assert name == "tiny"  # proves the conf-string option reached us
        return tiny(num_cams=6, input_size=(64, 128))

    def _agent_core_kwargs(self):
        aug_conf = {
            "resize_lim": (0.4, 0.4), "final_dim": (64, 128),
            "bot_pct_lim": (0.0, 0.0), "rot_lim": (0.0, 0.0),
            "H": 90, "W": 160, "rand_flip": False, "rot3d_range": (0.0, 0.0),
        }
        return dict(dtype=None, jpeg_quality=None, aug_conf=aug_conf,
                    n_banks=2)


def _make_route(n=8, spacing=3.0):
    """Straight-line world route + its GNSS twin, leaderboard-formatted."""
    world, gps = [], []
    for i in range(n):
        x, y = 1.0 + spacing * i, 2.0
        cmd = 4  # RoadOption.LANEFOLLOW
        world.append((SimpleNamespace(
            location=SimpleNamespace(x=x, y=y, z=0.0)), cmd))
        lat, lon = location_to_gps(x, y)
        gps.append(({"lat": lat, "lon": lon, "z": 0.0}, cmd))
    return world, gps


def _input_data(pos_xy, rng):
    lat, lon = location_to_gps(*pos_xy)
    data = {
        "GPS": (0, np.array([lat, lon, 0.0])),
        "IMU": (0, np.array([0.1, 0.0, 9.8, 0.0, 0.0, 0.01, math.pi / 2])),
        "SPEED": (0, {"speed": 2.0}),
    }
    for cam in CAMERAS:
        data[cam] = (0, rng.randint(0, 255, (90, 160, 4), np.uint8))
    return data


@pytest.fixture(scope="module")
def agent(tmp_path_factory):
    save_root = tmp_path_factory.mktemp("agent_out")
    import os

    os.environ["SAVE_PATH"] = str(save_root)
    ag = TinyAgent("carla_host_port_junk")  # leaderboard passes junk args
    ag.setup("+routes_town01+config=tiny")
    world, gps = _make_route()
    # leaderboard populates these before the first run_step
    ag._global_plan = gps
    ag._global_plan_world_coord = world
    return ag


def test_entry_point_and_sensor_rig(agent):
    assert get_entry_point() == "HiPADTpuAgent"
    specs = agent.sensors()
    cams = [s for s in specs if s["type"] == "sensor.camera.rgb"]
    assert {c["id"] for c in cams} == set(CAMERAS)
    assert {s["id"] for s in specs} - {c["id"] for c in cams} \
        == {"IMU", "GPS", "SPEED"}


def test_run_step_controls_and_artifacts(agent):
    rng = np.random.RandomState(0)
    out = agent.run_step(_input_data((1.0, 2.0), rng), timestamp=0.05)
    # no carla installed -> plain control dict
    assert -1.0 <= out["steer"] <= 1.0
    assert 0.0 <= out["throttle"] <= 0.75
    assert 0.0 <= out["brake"] <= 1.0
    # lat/lon ref recovered from the first gps<->world pair, planner seeded
    assert agent.lat_ref == pytest.approx(LAT_REF, abs=1e-3)
    assert agent.lon_ref == pytest.approx(LON_REF, abs=1e-3)
    assert agent._route_planner is not None
    # metric_info.json dumped in the leaderboard layout
    dumped = json.loads((agent.save_path / "metric_info.json").read_text())
    assert "0" in dumped
    assert agent.save_path.name == "routes_town01"


def test_route_pops_as_ego_advances(agent):
    rng = np.random.RandomState(1)
    n_before = len(agent._route_planner.route)
    # ego at the 4th waypoint: everything behind (within min_distance of a
    # passed point) pops, >= 2 entries always survive
    agent.run_step(_input_data((1.0 + 3.0 * 3, 2.0), rng), timestamp=0.10)
    n_after = len(agent._route_planner.route)
    assert 2 <= n_after < n_before
