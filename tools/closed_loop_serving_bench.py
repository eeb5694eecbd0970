"""Stage-2-scale closed-loop serving artifact (round-3 verdict item 6).

Runs the scripted replay (`agent/replay.py:run_scripted_replay`) with the
REAL serving configuration — ``stage2_serving`` (or overrides), bf16,
collision rescore on, the x10 closed-loop bank round-robin, JPEG-compressed
synthetic cameras, native C++ resize/crop when libhipad_io.so is built
(``tools/build_native.sh``; PIL fallback otherwise — the summary records
which path ran as ``native_preproc``) — for >=120 ticks on the TPU, and
records per-tick wall latency + control-sanity stats. This is the closest
possible stand-in for the reference's CARLA leaderboard run
(`hipad_b2d_agent.py:161-615`, 20 Hz tick) that this environment allows:
it measures the agent loop end to end (host preprocessing + streaming
inference + plan decode + PID), not just the bare model step.

Writes one JSONL line per tick to --out (docs/r4_closed_loop_serving.jsonl
by default) and prints a one-line JSON summary.

Run: python tools/closed_loop_serving_bench.py [--ticks 120]
     [--config stage2_serving] [--set k=v ...] [--out PATH]
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipad_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=120)
    ap.add_argument("--config", default="stage2_serving")
    ap.add_argument("--set", action="append", default=[],
                    help="cfg override key=python_literal")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "r4_closed_loop_serving.jsonl"))
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipad_tpu.agent.calib import IMG_H, IMG_W
    from hipad_tpu.agent.core import AgentCore
    from hipad_tpu.agent.replay import run_scripted_replay, scripted_route
    from hipad_tpu.configs import model as config_lib
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    cfg = getattr(config_lib, args.config)(**overrides)

    model = HiPAD(cfg, dtype=jnp.bfloat16)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    # the production agent: bf16, rescore ON, x10 banks, JPEG input path
    agent = AgentCore(cfg, variables, dtype=jnp.bfloat16, jpeg_quality=20,
                      with_rescore=True)

    route = scripted_route()

    # pre-render a pool of synthetic camera frames: frame production is the
    # simulator's job (CARLA renders in its own process); cycling a pool
    # keeps adjacent dispatch inputs distinct (tunnel-dedup defense) without
    # billing the ~26 MP/tick random render to the agent
    from hipad_tpu.agent.calib import CAMERAS

    rng = np.random.RandomState(0)
    pool = [{cam: rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
             for cam in CAMERAS} for _ in range(8)]

    def images_fn(t):
        return pool[t % len(pool)]

    ticks = []
    phases = []

    def on_tick(t, ag):
        ticks.append(time.perf_counter())
        phases.append(dict(ag.last_phase_ms))

    # warm: one tick compiles both streaming variants (first tick = banks
    # None path, later ticks = temporal path); exclude compile from stats by
    # dropping the first n_banks+1 ticks (each bank slot's first visit runs
    # the cold-start variant).
    t_start = time.perf_counter()
    log = run_scripted_replay(agent, route, n_ticks=args.ticks, speed=5.0,
                              img_hw=(IMG_H, IMG_W), on_tick=on_tick,
                              images_fn=images_fn)
    wall = time.perf_counter() - t_start

    # per-tick latencies (tick i = ticks[i] - previous timestamp)
    stamps = np.asarray([t_start] + ticks)
    lat = np.diff(stamps)  # seconds, includes compile on early ticks
    warm = lat[len(agent.banks) + 1:]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for i, (entry, dt, ph) in enumerate(zip(log, lat, phases)):
            f.write(json.dumps({
                "tick": i,
                "latency_ms": round(float(dt) * 1e3, 2),
                **{k: round(v, 2) for k, v in ph.items()},
                "steer": round(float(entry["steer"]), 4),
                "throttle": round(float(entry["throttle"]), 4),
                "brake": round(float(entry["brake"]), 4),
                "command": entry["command"],
                "route_len": entry["route_len"],
            }) + "\n")

    steers = np.asarray([e["steer"] for e in log])
    thr = np.asarray([e["throttle"] for e in log])
    brk = np.asarray([e["brake"] for e in log])
    sane = bool(np.isfinite(steers).all() and (np.abs(steers) <= 1).all()
                and (thr >= 0).all() and (thr <= 1).all()
                and (brk >= 0).all() and (brk <= 1).all())
    warm_ph = phases[len(agent.banks) + 1:]
    phase_med = {
        f"{k}_ms_median": round(float(np.median([p[k] for p in warm_ph])), 1)
        for k in (warm_ph[0] if warm_ph else {})
    }
    summary = {
        "config": args.config, "overrides": overrides, "ticks": len(log),
        "warm_ticks": int(len(warm)),
        "tick_ms_median": round(float(np.median(warm)) * 1e3, 1),
        "tick_ms_p90": round(float(np.percentile(warm, 90)) * 1e3, 1),
        "ticks_per_s_warm": round(1.0 / float(np.median(warm)), 2),
        **phase_med,
        "wall_s_total": round(wall, 1),
        "controls_sane": sane,
        "native_preproc": __import__(
            "hipad_tpu.data.native", fromlist=["serving_available"]
        ).serving_available(),
        "commands_seen": sorted({e["command"] for e in log}),
        "out": os.path.relpath(args.out),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
