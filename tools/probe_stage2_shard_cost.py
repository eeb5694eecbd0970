"""Phase-timing probe for the stage-2-shaped sharded train-step test.

The first attempt at `test_stage2_shaped_sharded_train_step` (embed 256)
ran >50 min on this 1-core host without completing, and an earlier attempt
died with a C++ abort during execution. This probe times each phase
(state init, lower, compile, execute) at reduced embed dims on 1- and
8-device CPU meshes so the test can be sized to something that actually
terminates here while still exercising the stage-2 query structure
(900/100/480/1 sections, 10 plan anchor types, motion, both op programs).

Run: python tools/probe_stage2_shard_cost.py [--embed 64] [--groups 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.parallel import mesh as mesh_lib
    from hipad_tpu.train import optim
    from hipad_tpu.train.train_step import create_train_state, jit_train_step

    t0 = time.perf_counter()
    cfg = stage2(input_size=(64, 96), backbone_stage_blocks=(1, 1, 1, 1),
                 backbone_base_planes=16, backbone_remat=False,
                 decoder_remat=False, num_temporal_layers=1,
                 embed_dims=args.embed, num_groups=args.groups)
    tx = optim.make_optimizer(total_steps=10)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)
    print(json.dumps({"phase": "init", "s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    for n_dev in args.devices:
        mesh = mesh_lib.make_mesh(jax.devices()[:n_dev])
        bs = n_dev
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic.make_batch(cfg, bs).items()}
        banks = init_bank_states(cfg, bs, feature_dtype=jnp.float32)
        st = mesh_lib.replicate(mesh, state)
        bt = mesh_lib.shard_batch(mesh, batch)
        bk = mesh_lib.shard_batch(mesh, banks)
        step = jit_train_step(cfg, model, mesh, donate=False)
        rng = jax.random.PRNGKey(7)

        t0 = time.perf_counter()
        lowered = step.lower(st, bk, bt, rng)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(st, bk, bt, rng)
        jax.block_until_ready(out)
        t_exec1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(st, bk, bt, rng)
        jax.block_until_ready(out)
        t_exec2 = time.perf_counter() - t0
        loss = float(out[2]["total_loss"])
        print(json.dumps({
            "n_dev": n_dev, "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "exec1_s": round(t_exec1, 1), "exec2_s": round(t_exec2, 1),
            "total_loss": round(loss, 3)}), flush=True)


if __name__ == "__main__":
    main()
