"""Data-parallel train-step scaling on the virtual CPU mesh.

Round-2 verdict item 8: "scale with the mesh" was only a claim — measure
it. No multi-chip TPU exists here, so this measures the 8-virtual-device
CPU mesh (conftest's XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT trick). Read the
numbers with the host's physical core count in hand (printed): on an
N-core host the virtual devices map onto real parallelism and the
samples/sec slope measures DP efficiency; on a 1-core host every virtual
device serializes onto the same core, so flat samples/sec (NOT flat
per-step time) is the correct outcome and the run validates work
conservation + collective overhead instead of speedup.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/bench_scaling.py [--stage2-shaped]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# This image's sitecustomize pins JAX_PLATFORMS=axon at interpreter boot, so
# env-var setdefault does NOT stick (round-4 incident: this tool silently ran
# on — and contended for — the one real TPU chip). Force the platform via
# jax.config, which wins over the boot-time pin, and the device count via
# XLA_FLAGS before the first backend init.
os.environ["XLA_FLAGS"] = (
    " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count"))
    + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage2-shaped", action="store_true",
                    help="stage-2 query structure with shrunk backbone/input")
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs.model import stage2, tiny
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.parallel import mesh as mesh_lib
    from hipad_tpu.train import optim
    from hipad_tpu.train.train_step import create_train_state, jit_train_step

    if args.stage2_shaped:
        cfg = stage2(input_size=(64, 96), backbone_stage_blocks=(1, 1, 1, 1),
                     backbone_base_planes=16, backbone_remat=False,
                     decoder_remat=False, num_temporal_layers=1)
    else:
        cfg = tiny()
    tx = optim.make_optimizer(total_steps=100)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)

    print(json.dumps({"host_cores": os.cpu_count(),
                      "devices": len(jax.devices()),
                      "config": "stage2_shaped" if args.stage2_shaped
                      else "tiny"}))
    rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = mesh_lib.make_mesh(jax.devices()[:n_dev])
        bs = n_dev  # 1 sample per device
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic.make_batch(cfg, bs).items()}
        banks = init_bank_states(cfg, bs, feature_dtype=jnp.float32)
        st = mesh_lib.replicate(mesh, state)
        bt = mesh_lib.shard_batch(mesh, batch)
        bk = mesh_lib.shard_batch(mesh, banks)
        step = jit_train_step(cfg, model, mesh, donate=False)
        rng = jax.random.PRNGKey(7)
        st, bk, metrics = step(st, bk, bt, rng)  # compile + warm
        jax.block_until_ready(metrics["total_loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            rng, sub = jax.random.split(rng)
            st, bk, metrics = step(st, bk, bt, sub)
            float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / args.steps
        row = {"n_dev": n_dev, "global_bs": bs,
               "step_ms": round(dt * 1e3, 1),
               "samples_per_s": round(bs / dt, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["samples_per_s"]
    print("\n| devices | global bs | step ms | samples/s | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_dev']} | {r['global_bs']} | {r['step_ms']} "
              f"| {r['samples_per_s']} | {r['samples_per_s'] / base:.2f}x |")


if __name__ == "__main__":
    main()
