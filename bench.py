"""Benchmark: full 6-camera HiP-AD forward (stage-2 scale) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs closed-loop CARLA at a 20 Hz tick with one model
inference per tick on an RTX 4090 (`hipad_b2d_agent.py:250`,
`run_evaluation_multi_hipad.sh:23-24` — two sims per GPU, so ~40 fps/GPU
sustained). We report single-chip frames/sec for the full bs=1 6-cam forward
(backbone + unified decoder + temporal banks) against that 40 fps/4090
baseline; BASELINE.json's north star is >=3x.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 40.0  # RTX 4090: 20 Hz tick x 2 concurrent sims per GPU


def main():
    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    cfg = stage2()
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
    def forward(variables, images, metas, banks):
        return model.apply(variables, images, metas, banks, train=False)

    # Cold start: run once without banks, then benchmark the steady-state
    # temporal path (what the closed-loop agent runs every tick).
    outputs, banks = forward(variables, images, metas, None)
    jax.block_until_ready(outputs)

    outputs, banks = forward(variables, images, metas, banks)
    jax.block_until_ready(outputs)

    # Timed: sequential frames with bank carry (streaming inference).
    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        outputs, banks = forward(variables, images, metas, banks)
    jax.block_until_ready((outputs, banks))
    dt = time.perf_counter() - t0
    fps = n_iters * bs / dt

    print(json.dumps({
        "metric": "e2e_forward_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
