"""Cross-frame pipelining A/B: monolithic step vs backbone/decoder split.

Round-2 verdict item 4: the serving step was a single jitted program
(`bench.py`); backbone(t+1) has no data dependency on banks(t) (the banks
only feed the decoder), so a two-dispatch pipeline — issue backbone(t+1)
before syncing decoder(t) — could in principle hide part of the decoder's
gather-latency-bound tail. The TPU caveat up front: one v5e TensorCore runs
ONE XLA program at a time, so split programs cannot overlap ON DEVICE; what
a 2-deep chain can hide is the host/tunnel side (dispatch, transfers,
python) of frame t+1 behind the device time of frame t. This tool measures
all three shapes honestly and PERF_NOTES records the outcome either way.

Shapes measured (N frames, temporal banks chained, distinct inputs/frame,
value materialisation per frame — the anti-dedup rules from PERF_NOTES):
  A. monolithic: one jit(backbone+decoder) per frame (bench.py's shape);
  B. split-serial: jit(backbone) then jit(decoder), synced per frame;
  C. split-pipelined: dispatch backbone(t+1) after dispatching decoder(t),
     sync only decoder(t)'s output (what the agent needs per tick).

Run on the TPU: `python tools/bench_pipeline.py [--config stage2]`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRAMES = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="stage2",
                    help="stage2 = exact semantics; stage2_serving = pruned")
    ap.add_argument("--frames", type=int, default=N_FRAMES)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs import model as config_lib
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.train.train_step import META_KEYS

    cfg = getattr(config_lib, args.config)()
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def mono(variables, images, metas, banks):
        outputs, banks = model.apply(variables, images, metas, banks,
                                     train=False)
        return outputs["plan"]["final_waypoints"], banks

    @jax.jit
    def backbone(variables, images):
        return model.apply(variables, images, train=False,
                           method=HiPAD.extract_feat)

    @jax.jit
    def decoder(variables, fmaps, metas, banks):
        def run(m, fmaps, metas, banks):
            out, new_banks = m.decoder(fmaps, metas, banks, train=False)
            return out["plan"]["final_waypoints"], new_banks

        return model.apply(variables, fmaps, metas, banks, method=run)

    banks0 = init_bank_states(cfg, 1, feature_dtype=jnp.bfloat16)
    n = args.frames
    frames = [images + jnp.asarray(i * 1e-3, images.dtype) for i in range(n)]

    # warm/compile all three programs
    wp, _ = mono(variables, frames[0], metas, banks0)
    jax.block_until_ready(wp)
    fm = backbone(variables, frames[0])
    wp, _ = decoder(variables, fm, metas, banks0)
    jax.block_until_ready(wp)

    # tunnel RTT floor (PERF_NOTES: subtract from per-dispatch medians)
    @jax.jit
    def _triv(c):
        return c + 1, (c * 2).astype(jnp.float32)

    c = jnp.int32(1)
    c, v = _triv(c)
    float(v)
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        c, v = _triv(c)
        float(v)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    results = {}

    # ---- A. monolithic, per-frame sync
    banks = banks0
    t0 = time.perf_counter()
    for i in range(n):
        wp, banks = mono(variables, frames[i], metas, banks)
        float(jnp.sum(wp))
    results["mono"] = time.perf_counter() - t0

    # ---- B. split, serial sync
    banks = banks0
    t0 = time.perf_counter()
    for i in range(n):
        fm = backbone(variables, frames[i])
        wp, banks = decoder(variables, fm, metas, banks)
        float(jnp.sum(wp))
    results["split_serial"] = time.perf_counter() - t0

    # ---- C. split, 2-deep pipeline: backbone(t+1) dispatched before
    # decoder(t) is synced; only the decoder output (the agent's per-tick
    # need) is materialised.
    banks = banks0
    t0 = time.perf_counter()
    fm = backbone(variables, frames[0])
    for i in range(n):
        wp, banks = decoder(variables, fm, metas, banks)
        if i + 1 < n:
            fm = backbone(variables, frames[i + 1])
        float(jnp.sum(wp))
    results["split_pipelined"] = time.perf_counter() - t0

    out = {"config": args.config, "frames": n,
           "rtt_ms": round(rtt * 1e3, 2)}
    for k, total in results.items():
        per = total / n
        out[f"{k}_ms_per_frame"] = round(per * 1e3, 2)
        out[f"{k}_fps_rtt_adj"] = round(1.0 / max(per - rtt, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
