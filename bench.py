"""Benchmark: full 6-camera HiP-AD forward (stage-2 scale) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing: N sequential per-frame dispatches of the jitted streaming step with
the temporal bank state chained between calls — exactly the closed-loop
serving pattern. The chain makes frames data-dependent and every call's
inputs distinct, which defeats the axon tunnel's dispatch dedup and its
early block_until_ready (the two artifacts that inflate naive timings).
An earlier version timed a lax.scan over frames instead; on this backend a
scan body pays a ~60x penalty on gather ops (tools/microbench_scan_vs_seq.py:
1833 ms vs 30 ms per identical iteration), so in-scan fps UNDERSTATES the
per-dispatch serving rate that the agent actually gets.

Baseline: the reference runs closed-loop CARLA at a 20 Hz tick with one model
inference per tick on an RTX 4090 (`hipad_b2d_agent.py:250`,
`run_evaluation_multi_hipad.sh:23-24` — two sims per GPU, so ~40 fps/GPU
sustained). BASELINE.json's north star is >=3x.

Default config is ``stage2_serving_det`` — the production latency
configuration: renormalised cam_k=2 + weight-top-k keypoint pruning (error
bounds tested in tests/test_sampling.py) plus det-query pruning by the
banks' persistent confidence ranking (``with_topk_det``). Headline decision
(round 5, made ON the trained-weights sweep): a 500-step TPU-trained
checkpoint was fed to tools/serving_error_sweep.py; det pruning measured
nearly free on the decoded plan trajectory (0.02 m L2, zero winner flips)
while the faster plan-mode knob (``with_topk_mode``,
`sparse_onedecoder.py:982-1007`) still cost 0.53 m plan L2 there — its
per-layer score ranking is exactly the property that checkpoint cannot
certify (retention ~coin-flip, docs/r5_retention_trained.json). Only the
measured-safe knob is promoted; ``stage2_serving_topk`` (+plan-mode) and
``stage2_serving_prune`` (both knobs, fastest) stay opt-in pending
real-checkpoint validation. ``--config stage2`` benches the exact
reference semantics; all numbers are reported in README.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from hipad_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()  # skips the ~20 min stage-2 compile on re-runs

BASELINE_FPS = 40.0  # RTX 4090: 20 Hz tick x 2 concurrent sims per GPU
N_ITERS = 16


def summarize(times, rtts, bs):
    """Pure timing→record summary (unit-tested: tests/test_configs.py).

    Median-of-times with the median tunnel RTT subtracted — UNLESS the RTT
    is a major share of the frame (``rtt > 0.5*med``), in which case the
    subtraction is REFUSED and the raw wall rate is reported with an
    ``rtt_anomaly`` flag. This guard exists because round 3's pre-measured
    RTT (172 ms, drifted) exceeded the ~90 ms frame median and the then
    ``max(med - rtt, 1e-9)`` clamp printed a 1e9-fps artifact with rc=0
    (BENCH_r03.json; PERF_NOTES "Benchmark honesty").
    """
    times = sorted(times)
    med = times[len(times) // 2]
    rtt = sorted(rtts)[len(rtts) // 2]
    rtt_anomaly = rtt > 0.5 * med
    fps = bs / med if rtt_anomaly else bs / (med - rtt)
    record = {
        "metric": "e2e_forward_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        # raw measured throughput including the ~26 ms axon tunnel dispatch
        # RTT (absent in a real deployment) — recorded so both the
        # device-time estimate (value) and the measured wall rate coexist.
        "fps_unadjusted": round(bs / med, 2),
        "rtt_ms": round(rtt * 1e3, 2),
    }
    if rtt_anomaly:
        record["rtt_anomaly"] = True  # value == fps_unadjusted (no subtraction)
    return record


def main(sync=False, bs=1, config="stage2", **overrides):
    from hipad_tpu.configs import model as config_lib
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.models.instance_bank import init_bank_states
    from hipad_tpu.train.train_step import META_KEYS

    cfg = getattr(config_lib, config)(**overrides)
    # refuse shapes that hard-crash the axon TPU worker (repro_bs2_fault.py)
    config_lib.assert_supported_batch(cfg, bs)
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    # bs > 1 = several independent closed-loop streams batched per chip —
    # the 40 fps/GPU baseline is itself a 2-sims-per-GPU aggregate
    # (`run_evaluation_multi_hipad.sh:23-24`), so bs=2 is the
    # apples-to-apples serving configuration.
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    # jit the init: eager init would dispatch thousands of tiny ops through
    # the device tunnel.
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def step(variables, images, metas, banks):
        """One streaming frame (the closed-loop agent's per-tick call)."""
        outputs, banks = model.apply(variables, images, metas, banks,
                                     train=False)
        return outputs["plan"]["final_waypoints"], banks

    banks0 = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)
    # distinct per-frame inputs (no two dispatches identical)
    frames = [images + jnp.asarray(i * 1e-3, images.dtype) for i in range(4)]
    wp, banks = step(variables, frames[0], metas, banks0)  # compile + warm
    jax.block_until_ready(wp)

    # Tunnel round-trip floor (trivial op, hard-synced): subtracted from the
    # per-frame time so the metric reflects device time, not the axon
    # tunnel's ~26 ms dispatch round trip (absent in a real deployment).
    # Measured INTERLEAVED with the frame loop (not once up front): the
    # tunnel's RTT drifts by >100 ms across minutes (round-3 artifact:
    # a pre-measured 172 ms RTT vs a 90 ms frame produced a clamped
    # "1e9 fps" — see PERF_NOTES "Benchmark honesty").
    @jax.jit
    def _triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = _triv(c); float(v)

    def _measure_rtt():
        nonlocal c
        t0 = time.perf_counter()
        c, v = _triv(c)
        float(v)
        return time.perf_counter() - t0

    # Per-frame HARD sync: a host transfer of a computed value from EVERY
    # dispatch — nothing can pipeline/dedup/return-early (the tunnel's
    # block_until_ready lies; an un-synced chain once "measured" 490 fps).
    banks = banks0
    times, rtts = [], []
    for i in range(N_ITERS):
        rtts.append(_measure_rtt())
        t0 = time.perf_counter()
        wp, banks = step(variables, frames[i % 4], metas, banks)
        float(jnp.sum(wp))
        times.append(time.perf_counter() - t0)
    rtts.append(_measure_rtt())
    if sync:
        print({"per_frame_ms": [round(t * 1e3, 2) for t in sorted(times)],
               "rtt_ms_all": [round(t * 1e3, 2) for t in rtts]})

    record = summarize(times, rtts, bs)
    record.update({"config": config, "bs": bs})
    if overrides:
        record["overrides"] = {k: repr(v) for k, v in sorted(overrides.items())}
    print(json.dumps(record))


if __name__ == "__main__":
    # config overrides for sampler A/B runs, e.g.
    #   python bench.py --set sampler_row_packed=True --set sampler_cam_k=2
    parser = argparse.ArgumentParser()
    parser.add_argument("--set", action="append", default=[],
                        help="cfg override key=python_literal")
    parser.add_argument("--sync", action="store_true",
                        help="per-frame host sync (latency upper bound)")
    parser.add_argument("--bs", type=int, default=1,
                        help="independent streams batched per chip")
    parser.add_argument("--config", default="stage2_serving_det",
                        help="config factory in hipad_tpu.configs.model "
                             "(stage2_serving_det = production latency "
                             "config, see module docstring; stage2_serving "
                             "= sampler knobs only; stage2 = exact "
                             "reference semantics; stage2_serving_topk / "
                             "stage2_serving_prune = +plan-mode pruning "
                             "variants; stage2_r101_2x | stage1)")
    args = parser.parse_args()
    import ast as _ast

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = _ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v  # bare strings, e.g. --set sampler=zero
    main(sync=args.sync, bs=args.bs, config=args.config, **overrides)
