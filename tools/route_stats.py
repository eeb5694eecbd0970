"""Aggregate CARLA leaderboard route records into Driving Score / Success Rate.

Counterpart of `bench2drive/tools/statistic_route_json.py:10-60` +
`merge_route_json.py`: reads the per-route leaderboard JSON checkpoints
written by parallel evaluation shards and prints the benchmark headline
numbers (success = route Completed/Perfect with no infractions other than
min-speed, `statistic_route_json.py:10-18`).

    python tools/route_stats.py --route-dir eval_out/ [--remove-failed]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def is_success(record) -> bool:
    if record["status"] not in ("Completed", "Perfect"):
        return False
    for k, v in record["infractions"].items():
        if len(v) > 0 and k != "min_speed_infractions":
            return False
    return True


def collect(route_dir: str, remove_failed: bool = False):
    rows = []
    incomplete = []
    for path in sorted(glob.glob(os.path.join(route_dir, "*.json"))):
        if path.endswith("merged.json"):
            continue
        with open(path) as f:
            data = json.load(f)
        ckpt = data.get("_checkpoint", {})
        records = ckpt.get("records", [])
        if not ckpt.get("global_record"):
            incomplete.append(path)
            if remove_failed:
                os.remove(path)
            continue
        for rec in records:
            rows.append({
                "route_id": rec.get("route_id"),
                "town": rec.get("town_name"),
                "scenario": rec.get("scenario_name", ""),
                "driving_score": rec["scores"]["score_composed"],
                "success": is_success(rec),
                "status": rec["status"],
            })
    return rows, incomplete


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--route-dir", required=True)
    p.add_argument("--remove-failed", action="store_true",
                   help="delete incomplete route files so a resume re-runs them")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows, incomplete = collect(args.route_dir, args.remove_failed)
    if incomplete:
        print(f"{len(incomplete)} incomplete route files"
              + (" (removed)" if args.remove_failed else ""))
    if not rows:
        print("no completed routes")
        return
    ds = sum(r["driving_score"] for r in rows) / len(rows)
    sr = 100.0 * sum(r["success"] for r in rows) / len(rows)
    for r in rows:
        print(f"  route {r['route_id']:>6}  DS {r['driving_score']:6.2f}  "
              f"{'OK ' if r['success'] else 'FAIL'}  {r['status']}")
    print(f"routes: {len(rows)}  Driving Score: {ds:.2f}  Success Rate: {sr:.2f}%")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"driving_score": ds, "success_rate": sr, "routes": rows}, f,
                      indent=2)


if __name__ == "__main__":
    main()
