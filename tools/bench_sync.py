"""Per-frame-synced timing of the full forward: forces a host value transfer
from EVERY dispatch, so no pipelining/dedup/early-return artifact can hide
work. Upper bound on per-frame latency (includes one tunnel RTT per frame).
"""

import time

import jax
import jax.numpy as jnp

from hipad_tpu.configs.model import stage2
from hipad_tpu.data import synthetic
from hipad_tpu.models.detector import HiPAD
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train.train_step import META_KEYS

N = 16


def main():
    cfg = stage2()
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    bs = 1
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))
    banks0 = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)

    @jax.jit
    def step(img, banks):
        out, banks = model.apply(variables, img, metas, banks, train=False)
        return out["plan"]["final_waypoints"], banks

    frames = [images + jnp.asarray(i * 1e-3, images.dtype) for i in range(4)]
    wp, banks = step(frames[0], banks0)
    float(jnp.sum(wp))

    banks = banks0
    times = []
    tot = 0.0
    for i in range(N):
        t0 = time.perf_counter()
        wp, banks = step(frames[i % 4], banks)
        s = float(jnp.sum(wp))  # hard sync: value must exist
        dt = time.perf_counter() - t0
        times.append(dt)
        tot += s
    times_ms = sorted(t * 1e3 for t in times)
    print(f"per-frame synced: p50={times_ms[len(times_ms)//2]:.2f} ms "
          f"min={times_ms[0]:.2f} max={times_ms[-1]:.2f} "
          f"fps(p50)={1e3/times_ms[len(times_ms)//2]:.1f} (checksum {tot:.3f})")


if __name__ == "__main__":
    main()
