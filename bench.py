"""Benchmark: full 6-camera HiP-AD forward (stage-2 scale) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing is done by scanning N streaming frames *inside one jit* with the
temporal bank state carried between iterations — per-dispatch timing through
the axon tunnel dedupes identical calls and can return from block_until_ready
early, both of which inflate naive fps (see .claude/skills/verify/SKILL.md).

Baseline: the reference runs closed-loop CARLA at a 20 Hz tick with one model
inference per tick on an RTX 4090 (`hipad_b2d_agent.py:250`,
`run_evaluation_multi_hipad.sh:23-24` — two sims per GPU, so ~40 fps/GPU
sustained). BASELINE.json's north star is >=3x.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 40.0  # RTX 4090: 20 Hz tick x 2 concurrent sims per GPU
N_ITERS = 16


def main(**overrides):
    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.train.train_step import META_KEYS

    cfg = stage2(**overrides)
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    bs = 1
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    # jit the init: eager init would dispatch thousands of tiny ops through
    # the device tunnel.
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def stream(variables, images, metas, banks):
        """N streaming frames with bank carry, one dispatch."""
        def body(banks, _):
            outputs, banks = model.apply(variables, images, metas, banks,
                                         train=False)
            return banks, outputs["plan"]["final_waypoints"][0, 0, 0]
        banks, tick = jax.lax.scan(body, banks, None, length=N_ITERS)
        return banks, tick.sum()

    banks0 = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)
    banks, s = stream(variables, images, metas, banks0)  # compile + warm
    float(s)

    # perturb the timed call's input: the axon tunnel can dedupe a dispatch
    # that exactly repeats the previous one (see verify skill gotchas)
    images_t = images + jnp.asarray(1e-3, images.dtype)
    t0 = time.perf_counter()
    banks, s = stream(variables, images_t, metas, banks0)
    float(s)
    dt = time.perf_counter() - t0
    fps = N_ITERS * bs / dt

    print(json.dumps({
        "metric": "e2e_forward_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    # config overrides for sampler A/B runs, e.g.
    #   python bench.py --set sampler_row_packed=True --set sampler_cam_k=2
    parser = argparse.ArgumentParser()
    parser.add_argument("--set", action="append", default=[],
                        help="cfg override key=python_literal")
    args = parser.parse_args()
    import ast as _ast

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = _ast.literal_eval(v)
    main(**overrides)
