"""Driving efficiency + comfort (smoothness) benchmark.

Counterpart of `bench2drive/tools/efficiency_smoothness_benchmark.py`
(reference, 285 LoC) with the same two headline numbers:

  * **Driving Efficiency** (`read_from_json`, reference lines 238-262):
    every `min_speed_infractions` entry embeds the ego's speed as a
    percentage of the surrounding traffic's; parse those percentages
    (dropping the >1000% outliers the reference drops) and average them
    per route, then across routes.  A route with no min-speed infraction
    contributes nothing (the reference skips it too — driving at traffic
    speed never triggers the infraction, so there is no sample).
  * **Comfort** (`seg_compute_comfort_metric`, reference lines 39-63):
    split each route's per-tick actor state into 20-tick windows and score
    the fraction of windows where ALL six nuPlan kinematic bounds hold on
    savitzky-golay-smoothed signals (window 7, poly 2, dt 0.1 s):
    lon accel in [-4.05, 2.40], |lat accel| < 4.89, |magnitude jerk| <
    8.37, |lon jerk| < 4.13, |yaw accel| < 1.93, |yaw rate| < 0.95.

Parity notes (divergences cited, behaviour otherwise identical — verified
against the reference module as oracle in tests/test_route_tools.py):

  * The reference computes `_z_yaw_acc` with `savgol_filter(...)` but
    forgets `deriv=1` (line 91-96), so its "yaw acceleration" bound is
    really the smoothed yaw *rate* checked against the 1.93 rad/s^2
    threshold.  We reproduce that exactly (comfort scores must match the
    published tool), and additionally report a `yaw_acc_true` rate with
    the derivative applied, separately.
  * The reference computes `comfort_res` but only prints Driving
    Efficiency (line 284); we print both.

Input schema: the leaderboard's `metric_info.json` written by
`autonomous_agent.get_metric_info` (leaderboard/autoagents/
autonomous_agent.py:146-161): per-tick `acceleration`, `angular_velocity`,
`forward_vector`, `right_vector`, `location`, `rotation` (3-vectors).

    python tools/efficiency_benchmark.py -f merged.json -m metric_dir/
"""

from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np
from scipy.signal import savgol_filter

# nuPlan comfort bounds (reference lines 9-26).
MAX_ABS_MAG_JERK = 8.37     # m/s^3
MAX_ABS_LAT_ACCEL = 4.89    # m/s^2
MAX_LON_ACCEL = 2.40        # m/s^2
MIN_LON_ACCEL = -4.05
MAX_ABS_YAW_ACCEL = 1.93    # rad/s^2
MAX_ABS_LON_JERK = 4.13     # m/s^3
MAX_ABS_YAW_RATE = 0.95     # rad/s

WINDOW_TICKS = 20           # comfort scored per 20-tick (1 s) window
SG_WINDOW = 7
SG_POLY = 2
DT = 0.1


def _phase_unwrap(headings: np.ndarray) -> np.ndarray:
    """Unwrap 2*pi jumps (reference `_phase_unwrap`, lines 216-236)."""
    two_pi = 2.0 * np.pi
    adjustments = np.zeros_like(headings)
    adjustments[..., 1:] = np.cumsum(
        np.round(np.diff(headings, axis=-1) / two_pi), axis=-1)
    return headings - two_pi * adjustments


def _within(metric, lo=None, hi=None) -> bool:
    lo = lo if lo else float(-np.inf)
    hi = hi if hi else float(np.inf)
    m = np.asarray(metric)
    return bool(np.all((m > lo) & (m < hi)))


def comfort_window(acceleration, angular_velocity, forward_vector,
                   right_vector) -> dict:
    """Six nuPlan bound checks on one window of actor state.

    Mirrors `compute_comfort_metric` (reference lines 65-166): project the
    2-D acceleration onto the ego's forward/right axes, smooth everything
    with savgol(window=min(7, n), poly=2), differentiate the accelerations
    for jerks.  Returns each check plus the corrected yaw-accel check.
    """
    acc2 = np.asarray(acceleration, np.float64)[:, :2]
    fwd2 = np.asarray(forward_vector, np.float64)[:, :2]
    rgt2 = np.asarray(right_vector, np.float64)[:, :2]
    yaw_rate_raw = _phase_unwrap(
        np.asarray(angular_velocity, np.float64)[:, 2])

    win = min(SG_WINDOW, len(acc2))
    if not SG_POLY < win:
        raise ValueError(f"{SG_POLY} < {win} does not hold!")

    lon_acc = savgol_filter(np.einsum("ij,ij->i", acc2, fwd2),
                            polyorder=SG_POLY, window_length=win)
    lat_acc = savgol_filter(np.einsum("ij,ij->i", acc2, rgt2),
                            polyorder=SG_POLY, window_length=win)
    mag_acc = savgol_filter(np.hypot(acc2[:, 0], acc2[:, 1]),
                            polyorder=SG_POLY, window_length=win)
    # Reference quirk reproduced: its `_z_yaw_acc` omits deriv=1, so the
    # published "yaw accel" bound tests the SMOOTHED RATE against the
    # accel threshold.  `yaw_acc_true` is the corrected derivative.
    yaw_rate = savgol_filter(yaw_rate_raw, polyorder=SG_POLY,
                             window_length=win)
    yaw_acc_asref = yaw_rate
    yaw_acc_true = savgol_filter(yaw_rate_raw, polyorder=SG_POLY,
                                 window_length=win, deriv=1, delta=DT)
    mag_jerk = savgol_filter(mag_acc, polyorder=SG_POLY, window_length=win,
                             deriv=1, delta=DT)
    lon_jerk = savgol_filter(lon_acc, polyorder=SG_POLY, window_length=win,
                             deriv=1, delta=DT)

    return {
        "lon_acc": _within(lon_acc, MIN_LON_ACCEL, MAX_LON_ACCEL),
        "lat_acc": _within(lat_acc, -MAX_ABS_LAT_ACCEL, MAX_ABS_LAT_ACCEL),
        "mag_jerk": _within(mag_jerk, -MAX_ABS_MAG_JERK, MAX_ABS_MAG_JERK),
        "lon_jerk": _within(lon_jerk, -MAX_ABS_LON_JERK, MAX_ABS_LON_JERK),
        "yaw_acc": _within(yaw_acc_asref, -MAX_ABS_YAW_ACCEL,
                           MAX_ABS_YAW_ACCEL),
        "yaw_rate": _within(yaw_rate, -MAX_ABS_YAW_RATE, MAX_ABS_YAW_RATE),
        "yaw_acc_true": _within(yaw_acc_true, -MAX_ABS_YAW_ACCEL,
                                MAX_ABS_YAW_ACCEL),
    }


def route_comfort(acceleration, angular_velocity, forward_vector,
                  right_vector) -> float:
    """Fraction of full 20-tick windows where all six reference checks pass
    (`seg_compute_comfort_metric`, reference lines 39-63).  Routes shorter
    than one window are scored as a single window (reference line 52-54)."""
    n = len(angular_velocity)

    def ok(sl):
        c = comfort_window(acceleration[sl], angular_velocity[sl],
                           forward_vector[sl], right_vector[sl])
        return all(c[k] for k in ("lon_acc", "lat_acc", "mag_jerk",
                                  "lon_jerk", "yaw_acc", "yaw_rate"))

    if n <= WINDOW_TICKS:
        return 1.0 if ok(slice(None)) else 0.0
    wins = [slice(i * WINDOW_TICKS, (i + 1) * WINDOW_TICKS)
            for i in range(n // WINDOW_TICKS)]
    res = [ok(w) for w in wins]
    return res.count(True) / len(res)


def parse_driving_efficiency(record) -> float | None:
    """Mean min-speed percentage for one route record, or None if the route
    has no min-speed infraction (reference `read_from_json` lines 251-261,
    incl. dropping >1000% outliers)."""
    entries = record["infractions"].get("min_speed_infractions", [])
    if len(entries) < 1:
        return None
    vals = []
    for msg in entries:
        m = re.search(r"\b\d+\.?\d*%", msg)
        if m is None:
            continue
        v = float(m.group().rstrip("%"))
        if v > 1000:
            continue
        vals.append(v)
    if not vals:
        return None
    return sum(vals) / len(vals)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-f", "--file", required=True,
                   help="merged leaderboard json (route records)")
    p.add_argument("-m", "--metric-dir", required=True,
                   help="dir holding <save_name>/metric_info.json per route")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    with open(args.file) as f:
        data = json.load(f)
    records = data["_checkpoint"]["records"]

    eff, comfort, comfort_true = [], [], []
    for rec in records:
        e = parse_driving_efficiency(rec)
        if e is not None:
            eff.append(e)
        mpath = os.path.join(args.metric_dir, rec.get("save_name", ""),
                             "metric_info.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            info = json.load(f)
        ticks = [info[k] for k in sorted(info, key=lambda s: int(s))]
        state = {fld: np.array([t[fld] for t in ticks])
                 for fld in ("acceleration", "angular_velocity",
                             "forward_vector", "right_vector")}
        comfort.append(route_comfort(**state))

    out = {
        "driving_efficiency": sum(eff) / len(eff) if eff else float("nan"),
        "efficiency_routes": len(eff),
        "comfort": sum(comfort) / len(comfort) if comfort else float("nan"),
        "comfort_routes": len(comfort),
    }
    print(f"Driving Efficiency={out['driving_efficiency']}"
          f"  (over {out['efficiency_routes']} routes with min-speed data)")
    print(f"Comfort={out['comfort']}  (mean in-bounds window fraction over "
          f"{out['comfort_routes']} routes)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
