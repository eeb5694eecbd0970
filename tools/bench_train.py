"""Honest training-step timing on one TPU chip (stage-2 scale, bs=1).

Chained hard-synced dispatches (state chained between steps, a loss value
materialised each step) with the trivial-dispatch RTT subtracted — see the
verify skill's timing gotchas.

Reference baseline: stage-2 trains 18 epochs x 234,769 frames / 48 global
batch = 88,038 steps in ~46 h on 8x RTX 4090 => ~1.88 s/step at global
batch 48; each GPU handles 6 samples per step => ~313 ms/sample per GPU.
"""

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from hipad_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from hipad_tpu.configs.model import stage2
from hipad_tpu.data import synthetic
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train.train_step import create_train_state, make_train_step

N = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[],
                    help="config overrides, e.g. --set decoder_remat=False")
    ap.add_argument("--bs", type=int, default=1)
    args = ap.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = ast.literal_eval(v)
    cfg = stage2(**overrides)
    tx = optax.adamw(2e-4)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=args.bs)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(cfg, args.bs).items()}
    banks = init_bank_states(cfg, args.bs, feature_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0, 1))

    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    rtts = []
    for i in range(8):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"RTT {rtt*1e3:.1f} ms")

    rng = jax.random.PRNGKey(2)
    state, banks, metrics = step(state, banks, batch, rng)
    float(metrics["total_loss"])
    times = []
    for i in range(N):
        t0 = time.perf_counter()
        state, banks, metrics = step(state, banks, batch,
                                     jax.random.fold_in(rng, i))
        float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2] - rtt
    per = p50 / args.bs
    print(f"train step (bs={args.bs}): {p50*1e3:.1f} ms, "
          f"{per*1e3:.1f} ms/sample "
          f"(4090 baseline ~313 ms/sample per GPU; "
          f"ratio {313.0/(per*1e3):.2f}x)")


if __name__ == "__main__":
    main()
