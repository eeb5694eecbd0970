"""Per-ability Bench2Drive success breakdown.

Counterpart of `bench2drive/tools/ability_benchmark.py`: groups the 44
scenario types into the paper's five driving abilities and reports a success
rate per ability plus the multi-ability mean (no CARLA needed — route
scenario names come from the route XML or the record's scenario_name).

Parity: the ABILITY grouping below is checked against the reference's
`Ability` dict (ability_benchmark.py:12-18) in tests/test_route_tools.py.
Cited divergence: the reference re-scores Traffic_Signs routes a second
time by junction-completion fraction (lines 119-147), which requires a
live CARLA map to locate the junction waypoint — without a simulator we
count Traffic_Signs by full-route success only, like the other abilities.

    python tools/ability_benchmark.py --route-dir out/ [--routes-xml routes.xml]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import xml.etree.ElementTree as ET

ABILITY = {
    "Overtaking": [
        "Accident", "AccidentTwoWays", "ConstructionObstacle",
        "ConstructionObstacleTwoWays", "HazardAtSideLaneTwoWays",
        "HazardAtSideLane", "ParkedObstacleTwoWays", "ParkedObstacle",
        "VehicleOpensDoorTwoWays"],
    "Merging": [
        "CrossingBicycleFlow", "EnterActorFlow", "HighwayExit",
        "InterurbanActorFlow", "HighwayCutIn", "InterurbanAdvancedActorFlow",
        "MergerIntoSlowTrafficV2", "MergerIntoSlowTraffic",
        "NonSignalizedJunctionLeftTurn", "NonSignalizedJunctionRightTurn",
        "NonSignalizedJunctionLeftTurnEnterFlow", "ParkingExit",
        "SequentialLaneChange", "SignalizedJunctionLeftTurn",
        "SignalizedJunctionRightTurn", "SignalizedJunctionLeftTurnEnterFlow"],
    "Emergency_Brake": [
        "BlockedIntersection", "DynamicObjectCrossing", "HardBreakRoute",
        "OppositeVehicleTakingPriority", "OppositeVehicleRunningRedLight",
        "ParkingCutIn", "PedestrianCrossing", "ParkingCrossingPedestrian",
        "StaticCutIn", "VehicleTurningRoute", "VehicleTurningRoutePedestrian",
        "ControlLoss"],
    "Give_Way": ["InvadingTurn", "YieldToEmergencyVehicle"],
    "Traffic_Signs": [
        "BlockedIntersection", "OppositeVehicleTakingPriority",
        "OppositeVehicleRunningRedLight", "PedestrianCrossing",
        "VehicleTurningRoute", "VehicleTurningRoutePedestrian",
        "EnterActorFlow", "CrossingBicycleFlow",
        "NonSignalizedJunctionLeftTurn", "NonSignalizedJunctionRightTurn",
        "NonSignalizedJunctionLeftTurnEnterFlow",
        "SignalizedJunctionLeftTurn", "SignalizedJunctionRightTurn",
        "SignalizedJunctionLeftTurnEnterFlow", "T_Junction",
        "VanillaNonSignalizedTurn", "VanillaSignalizedTurnEncounterGreenLight",
        "VanillaSignalizedTurnEncounterRedLight",
        "VanillaNonSignalizedTurnEncounterStopsign"],
}


def route_scenarios_from_xml(xml_path: str):
    """route_id -> scenario type, from the Bench2Drive route XML."""
    out = {}
    root = ET.parse(xml_path).getroot()
    for route in root.iter("route"):
        scenarios = route.find("scenarios")
        if scenarios is not None and scenarios.find("scenario") is not None:
            out[route.get("id")] = scenarios.find("scenario").get("type")
    return out


def is_success(record) -> bool:
    if record["status"] not in ("Completed", "Perfect"):
        return False
    return not any(len(v) > 0 for k, v in record["infractions"].items()
                   if k != "min_speed_infractions")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--route-dir", required=True)
    p.add_argument("--routes-xml", default=None)
    args = p.parse_args()

    xml_map = route_scenarios_from_xml(args.routes_xml) if args.routes_xml else {}
    stats = {a: [0, 0] for a in ABILITY}
    per_scenario = {}
    for path in sorted(glob.glob(os.path.join(args.route_dir, "*.json"))):
        if path.endswith("merged.json"):
            continue
        with open(path) as f:
            data = json.load(f)
        for rec in data.get("_checkpoint", {}).get("records", []):
            rid = str(rec.get("route_id", "")).split("_")[-1]
            scen = rec.get("scenario_name") or xml_map.get(rid, "")
            ok = is_success(rec)
            sc = per_scenario.setdefault(scen, [0, 0])
            sc[1] += 1
            sc[0] += ok
            for ability, scenarios in ABILITY.items():
                if scen in scenarios:
                    stats[ability][1] += 1
                    stats[ability][0] += ok

    print(f"{'scenario':<45} success")
    for scen, (s, n) in sorted(per_scenario.items()):
        print(f"  {scen:<43} {s}/{n}")
    rates = []
    for ability, (s, n) in stats.items():
        rate = 100.0 * s / n if n else float("nan")
        rates.append(rate if n else 0.0)
        print(f"{ability:<20} {rate:6.2f}%  ({s}/{n})")
    valid = [r for a, r in zip(stats.values(), rates) if a[1]]
    if valid:
        print(f"{'mean ability':<20} {sum(valid)/len(valid):6.2f}%")


if __name__ == "__main__":
    main()
