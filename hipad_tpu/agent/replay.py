"""Fake closed-loop driver (CARLA mock).

The reference's only no-simulator testing device is scenario_runner's
``carla_mocks`` (SURVEY §4.3). Here: a kinematic toy world that feeds the
agent synthetic camera frames + route targets at 20 Hz, integrates the
returned control with a bicycle model, and reports route progress — enough to
exercise the full agent stack (preprocessing, streaming banks, plan decode,
PID) without CARLA.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .calib import CAMERAS, IMG_H, IMG_W
from .core import FRAME_RATE, AgentCore


class FakeSim:
    """Straight-road kinematic world in CARLA conventions."""

    def __init__(self, route_length: float = 100.0, seed: int = 0,
                 img_hw=(IMG_H, IMG_W)):
        self.rng = np.random.RandomState(seed)
        self.route_length = route_length
        self.img_hw = img_hw
        self.pos = np.zeros(2)  # CARLA frame (y right)
        self.yaw = 0.0  # CARLA compass=0 -> facing +x? compass handled below
        self.speed = 0.0
        self.t = 0

    def observe(self) -> Dict:
        h, w = self.img_hw
        images = {
            cam: self.rng.randint(0, 255, (h, w, 3), np.uint8)
            for cam in CAMERAS
        }
        target = np.array([min(self.pos[0] + 20.0, self.route_length), 0.0])
        return {
            "images": images,
            "pos": self.pos.copy(),
            "speed": self.speed,
            "compass": np.pi / 2,  # facing +x in CARLA compass terms
            "acceleration": np.zeros(3),
            "angular_velocity": np.zeros(3),
            "target_xy": target,
            "command": 4,  # LANE FOLLOW
        }

    def apply(self, control: Dict):
        dt = 1.0 / FRAME_RATE
        accel = 3.0 * control["throttle"] - 8.0 * control["brake"] - 0.1
        self.speed = float(np.clip(self.speed + accel * dt, 0.0, 20.0))
        self.yaw += control["steer"] * self.speed * dt * 0.2
        self.pos += self.speed * dt * np.array([np.cos(self.yaw), np.sin(self.yaw)])
        self.t += 1

    @property
    def done(self) -> bool:
        return self.pos[0] >= self.route_length


def run_replay(agent: AgentCore, max_steps: int = 40, sim: Optional[FakeSim] = None):
    """Run the agent against the fake sim; returns per-step control log."""
    sim = sim or FakeSim()
    log: List[Dict] = []
    for _ in range(max_steps):
        control = agent.run_step(sim.observe())
        sim.apply(control)
        log.append({**control, "pos": sim.pos.copy(), "speed": sim.speed})
        if sim.done:
            break
    return log
