"""Driving efficiency + smoothness benchmark.

Counterpart of `bench2drive/tools/efficiency_smoothness_benchmark.py`: from
the agents' per-step metadata (``metric_info.json`` written by the agent) and
the leaderboard route records, report

  * efficiency: mean ego speed relative to the surrounding traffic / limit
    proxy (here: mean speed over driven steps, plus route completion time);
  * smoothness: mean absolute jerk (d(accel)/dt) and steering rate.

    python tools/efficiency_benchmark.py --agent-dirs out/agent_*
"""

from __future__ import annotations

import argparse
import glob
import json

import numpy as np

FRAME_RATE = 20.0


def analyze_agent_dir(path: str):
    with open(f"{path}/metric_info.json") as f:
        info = json.load(f)
    steps = sorted(int(k) for k in info)
    if len(steps) < 3:
        return None
    speed = np.array([info[str(s)].get("speed", 0.0) for s in steps])
    steer = np.array([info[str(s)].get("steer", 0.0) for s in steps])
    accel = np.diff(speed) * FRAME_RATE
    jerk = np.diff(accel) * FRAME_RATE
    return {
        "steps": len(steps),
        "mean_speed": float(speed.mean()),
        "driving_time_s": len(steps) / FRAME_RATE,
        "mean_abs_accel": float(np.abs(accel).mean()),
        "mean_abs_jerk": float(np.abs(jerk).mean()),
        "mean_abs_steer_rate": float(np.abs(np.diff(steer)).mean() * FRAME_RATE),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agent-dirs", nargs="+", required=True,
                   help="agent output dirs (globs ok)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    dirs = []
    for pattern in args.agent_dirs:
        dirs.extend(sorted(glob.glob(pattern)))
    rows = []
    for d in dirs:
        try:
            r = analyze_agent_dir(d)
        except FileNotFoundError:
            continue
        if r:
            rows.append({"dir": d, **r})
            print(f"{d}: speed {r['mean_speed']:.2f} m/s  "
                  f"jerk {r['mean_abs_jerk']:.2f} m/s^3  "
                  f"steer-rate {r['mean_abs_steer_rate']:.3f}/s")
    if not rows:
        print("no agent metric_info found")
        return
    agg = {k: float(np.mean([r[k] for r in rows]))
           for k in rows[0] if k != "dir"}
    print("mean:", json.dumps({k: round(v, 3) for k, v in agg.items()}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"per_agent": rows, "mean": agg}, f, indent=2)


if __name__ == "__main__":
    main()
