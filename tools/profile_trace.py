"""Device-trace profile of the stage-2 streaming forward.

Runs a few hard-synced frames under jax.profiler.trace and aggregates the
device trace's per-op durations (Chrome-trace JSON inside the TensorBoard
logdir) — names the actual top HLO fusions instead of inferring from
microbenches. Falls back gracefully if the backend emits no device track.

Run: python -u tools/profile_trace.py [--set k=v ...]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hipad_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def run_model(overrides, frames=3, bs=1):
    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.train.train_step import META_KEYS

    cfg = stage2(**overrides)
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    # variables must be a jit ARGUMENT: closed-over device arrays embed as
    # HLO constants, and the ~50 MB of weights trips the axon remote-compile
    # service's request-body limit (HTTP 413).
    @jax.jit
    def step(variables, img, banks):
        out, banks = model.apply(variables, img, metas, banks, train=False)
        return out["plan"]["final_waypoints"], banks

    banks = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)
    imgs = [images + jnp.asarray(i * 1e-3, images.dtype) for i in range(4)]
    wp, banks = step(variables, imgs[0], banks)  # compile outside the trace
    float(jnp.sum(wp))

    logdir = "/tmp/hipad_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(frames):
            wp, banks = step(variables, imgs[1 + i % 3], banks)
            float(jnp.sum(wp))
    return logdir, frames


def run_train(overrides, steps=2, bs=1):
    """Trace the full jitted train step (forward + losses + backward + AdamW)."""
    import optax

    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.train.train_step import create_train_state, make_train_step

    cfg = stage2(**overrides)
    tx = optax.adamw(2e-4)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=bs)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(cfg, bs).items()}
    banks = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(2)
    state, banks, metrics = step(state, banks, batch, rng)
    float(metrics["total_loss"])

    logdir = "/tmp/hipad_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, banks, metrics = step(state, banks, batch,
                                         jax.random.fold_in(rng, i))
            float(metrics["total_loss"])
    return logdir, steps


def aggregate(logdir, frames):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace.json.gz found — backend emitted no device trace;"
              f" contents: {glob.glob(logdir + '/**', recursive=True)[:20]}")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    # Only the leaf "XLA Ops" lanes: the Steps / XLA Modules / TensorFlow
    # Name Scope lanes nest the same time again (a module event spans all
    # its ops), which double-counts and buries the real hotspots.
    op_lanes = {k for k, n in thread_names.items()
                if k[0] in dev_pids and "XLA Ops" in n}
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lanes:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            name = e.get("name", "?")
            by_op[name] += dur
            total += dur
    if not by_op:  # fall back to every device event (older trace format)
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                dur = e.get("dur", 0) / 1e3
                by_op[e.get("name", "?")] += dur
                total += dur
    if not by_op:
        print(f"device pids {dev_pids} had no X events; "
              f"processes: {list(proc_names.values())[:10]}")
        return
    print(f"total device time {total:.1f} ms over {frames} frames "
          f"({total/frames:.1f} ms/frame)")
    print(f"{'ms/frame':>9}  {'%':>5}  op")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms/frames:9.2f}  {100*ms/total:5.1f}  {name[:110]}")
    # Prefix aggregation: the per-(task, layer) scopes make the flat list a
    # soup of sub-ms entries — sum families like plan_deformable_*, fusion.*.
    import re as _re

    by_family = defaultdict(float)
    for name, ms in by_op.items():
        fam = _re.sub(r"[_.]?\d+(\.\d+)?$", "", name)
        fam = _re.sub(r"_\d+(?=[_.])", "", fam)
        by_family[fam] += ms
    print(f"\n{'ms/frame':>9}  {'%':>5}  op family (trailing indices stripped)")
    for name, ms in sorted(by_family.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms/frames:9.2f}  {100*ms/total:5.1f}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--train", action="store_true",
                    help="trace the jitted train step instead of the forward")
    args = ap.parse_args()
    import ast

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = ast.literal_eval(v)
    if args.train:
        logdir, frames = run_train(overrides)
    else:
        logdir, frames = run_model(overrides)
    aggregate(logdir, frames)
