"""First-principles FLOPs/bytes/MFU accounting for the training step.

Round-4 verdict item 1: the device-trace attribution claimed ~440 ms/step of
conv fusions while the serving ablation (sampler zeroed) runs the whole
non-sampler forward at ~10.6 ms — an order-of-magnitude contradiction. Trace
"while shells and their inner fusions overlap, so shares are approximate"
(tools/PERF_NOTES.md) was the suspect. This tool replaces attribution by
arithmetic + end-to-end ablation:

  --analytic (CPU, no TPU needed)
      * analytic conv FLOPs of the ResNet50+FPN at stage-2 shape (per stage,
        fwd; bwd = 2x fwd for dgrad+wgrad; remat replay = +1x fwd of the
        rematerialized stages)
      * XLA's own post-optimization cost model (`compiled.cost_analysis()`)
        for backbone fwd, backbone fwd+bwd and (optionally, ~5 min compile)
        the full train step — includes whatever XLA actually schedules
        (remat replay, fused adjoints), not what the module tree suggests

  --run (one TPU chip, chained hard-synced dispatches per the verify-skill
        timing gotchas: distinct inputs per call from a pool, full-output
        reductions, value materialisation per call, interleaved-RTT
        subtraction)
      * bb_fwd:        backbone-only forward
      * bb_fwd_bwd:    backbone-only forward+backward (remat as configured)
      * train_full:    full train step (baseline, = tools/bench_train.py)
      * train_stopfmap: full step with cfg.stop_fmap_gradient=True — kills
        conv dgrad/wgrad + remat replay + the sampler's dense feature-map
        adjoints in ONE cut; the delta vs train_full bounds that whole
        family end to end, immune to trace double-counting

Peaks used for the % columns (TPU v5e / v5 lite, public spec): 197 TFLOP/s
bf16 matmul, 819 GB/s HBM. Results land in tools/PERF_NOTES.md ("Round-5
MFU accounting").
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # FLOP/s, TPU v5e
PEAK_HBM = 819e9    # B/s


# ---------------------------------------------------------------------------
# Analytic conv FLOPs (multiply-add = 2 FLOPs), stage-2 ResNet50 + FPN
# ---------------------------------------------------------------------------

def conv_flops(n, h, w, cin, cout, k, stride=1):
    oh, ow = h // stride, w // stride
    return 2.0 * n * oh * ow * cin * cout * k * k, (n, oh, ow, cout)


def backbone_flops_table(cfg, bs=1):
    """Per-stage fwd conv FLOPs; returns (rows, total_fwd)."""
    n = bs * cfg.num_cams
    H, W = cfg.input_size
    rows = []

    f, (n_, h, w, c) = conv_flops(n, H, W, 3, cfg.backbone_base_planes, 7, 2)
    rows.append(("stem 7x7/2", f))
    h, w = h // 2, w // 2  # maxpool

    cin = cfg.backbone_base_planes
    stage_flops = []
    for si, blocks in enumerate(cfg.backbone_stage_blocks):
        planes = cfg.backbone_base_planes * (2 ** si)
        stride = 1 if si == 0 else 2
        total = 0.0
        for b in range(blocks):
            s = stride if b == 0 else 1
            total += conv_flops(n, h, w, cin, planes, 1)[0]          # conv1
            total += conv_flops(n, h, w, planes, planes, 3, s)[0]    # conv2
            hh, ww = h // s, w // s
            total += conv_flops(n, hh, ww, planes, planes * 4, 1)[0] # conv3
            if b == 0:
                total += conv_flops(n, h, w, cin, planes * 4, 1, s)[0]
            h, w = hh, ww
            cin = planes * 4
        rows.append((f"stage{si} x{blocks} @{h}x{w}", total))
        stage_flops.append(total)

    # FPN: lateral 1x1 per level + 3x3 out conv per level
    H4, W4 = H // 4, W // 4
    fpn = 0.0
    for i, cs in enumerate((256, 512, 1024, 2048)):
        lh, lw = H4 // (2 ** i), W4 // (2 ** i)
        fpn += conv_flops(n, lh, lw, cs * cfg.backbone_base_planes // 64,
                          cfg.embed_dims, 1)[0]
        fpn += conv_flops(n, lh, lw, cfg.embed_dims, cfg.embed_dims, 3)[0]
    rows.append(("FPN lat+out", fpn))
    return rows, sum(f for _, f in rows)


# ---------------------------------------------------------------------------
# Jitted subgraphs
# ---------------------------------------------------------------------------

def make_backbone(cfg, dtype):
    import jax
    import jax.numpy as jnp

    from hipad_tpu.models.backbone import ResNetFPN

    bb = ResNetFPN(stage_blocks=cfg.backbone_stage_blocks,
                   base_planes=cfg.backbone_base_planes,
                   out_channels=cfg.embed_dims, remat=cfg.backbone_remat,
                   remat_stages=cfg.backbone_remat_stages, dtype=dtype)
    H, W = cfg.input_size
    img = jnp.zeros((1, cfg.num_cams, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r: bb.init({"params": r}, img, train=False))(
        jax.random.PRNGKey(0))
    return bb, variables, img


def bb_fwd_fn(bb, train=False):
    import jax.numpy as jnp

    def f(variables, img):
        fmaps = bb.apply(variables, img, train=False)
        # full-output reduction (DCE defense) + a scalar to chain frames on
        s = sum(jnp.sum(m.astype(jnp.float32)) for m in fmaps)
        return s

    return f


def bb_fwd_bwd_fn(bb):
    import jax
    import jax.numpy as jnp

    def loss(params, variables, img):
        fmaps = bb.apply({**variables, "params": params}, img, train=True,
                         mutable=["batch_stats"])[0]
        return sum(jnp.sum(m.astype(jnp.float32) ** 2) for m in fmaps)

    def f(variables, img):
        l, g = jax.value_and_grad(loss)(variables["params"], variables, img)
        gs = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree_util.tree_leaves(g))
        return l + gs * 1e-12  # keeps every wgrad live in one scalar

    return f


# ---------------------------------------------------------------------------


def cost_of(jitted, *args):
    """Post-optimization XLA cost model of a jitted callable."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"gflops": c.get("flops", 0.0) / 1e9,
                "gbytes": c.get("bytes accessed", 0.0) / 1e9}
    except Exception as e:  # cost model unavailable on some backends
        return {"error": str(e)[:120]}


def timed(step, feeds, sync, n=6):
    """Median chained-dispatch seconds with interleaved RTT subtracted."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)

    c = jnp.int32(1)
    c, v = triv(c); float(v)

    def rtt_once():
        nonlocal c
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        return time.perf_counter() - t0

    sync(step(feeds(0)))  # warm/compile
    times, rtts = [], []
    for i in range(n):
        rtts.append(rtt_once())
        t0 = time.perf_counter()
        sync(step(feeds(i + 1)))
        times.append(time.perf_counter() - t0)
    rtts.append(rtt_once())
    med = sorted(times)[len(times) // 2]
    rtt = sorted(rtts)[len(rtts) // 2]
    if rtt > 0.5 * med:  # anomaly guard (PERF_NOTES "Benchmark honesty")
        return {"s": med, "rtt_s": rtt, "rtt_anomaly": True}
    return {"s": med - rtt, "rtt_s": rtt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analytic", action="store_true")
    ap.add_argument("--full-step-cost", action="store_true",
                    help="also cost_analysis the full train step (~5 min CPU compile)")
    ap.add_argument("--run", action="store_true", help="timed TPU ablations")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs.model import stage2

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = ast.literal_eval(v)
    cfg = stage2(**overrides)
    out = {"platform": jax.default_backend()}

    # ---- analytic conv table (always cheap) -------------------------------
    rows, total_fwd = backbone_flops_table(cfg)
    out["conv_fwd_gflops"] = {k: round(f / 1e9, 1) for k, f in rows}
    out["conv_fwd_total_gflops"] = round(total_fwd / 1e9, 1)
    # dgrad+wgrad ~ 2x fwd; remat replay adds 1x fwd of the remat stages
    # (stem+FPN are outside the remat scope)
    replay = sum(f for (name, f) in rows
                 if name.startswith("stage")
                 and int(name[5]) in cfg.backbone_remat_stages) \
        if cfg.backbone_remat else 0.0
    out["conv_train_total_gflops"] = round((3 * total_fwd + replay) / 1e9, 1)
    out["conv_time_at_peak_ms"] = {
        "fwd": round(total_fwd / PEAK_BF16 * 1e3, 2),
        "fwd_bwd_replay": round((3 * total_fwd + replay) / PEAK_BF16 * 1e3, 2),
    }

    if args.analytic:
        bb, variables, img = make_backbone(cfg, jnp.bfloat16)
        f_fwd = jax.jit(bb_fwd_fn(bb))
        out["xla_bb_fwd"] = cost_of(f_fwd, variables, img)
        f_bwd = jax.jit(bb_fwd_bwd_fn(bb))
        out["xla_bb_fwd_bwd"] = cost_of(f_bwd, variables, img)

    if args.full_step_cost:
        import optax

        from hipad_tpu.data import synthetic
        from hipad_tpu.models.instance_bank import init_bank_states
        from hipad_tpu.train.train_step import create_train_state, make_train_step

        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          optax.adamw(2e-4), batch_size=1)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic.make_batch(cfg, 1).items()}
        banks = init_bank_states(cfg, 1, feature_dtype=jnp.bfloat16)
        step = jax.jit(make_train_step(cfg, model))
        out["xla_train_step"] = cost_of(step, state, banks, batch,
                                        jax.random.PRNGKey(2))

    if args.run:
        import optax

        from hipad_tpu.data import synthetic
        from hipad_tpu.models.instance_bank import init_bank_states
        from hipad_tpu.train.train_step import create_train_state, make_train_step

        # backbone-only forward / forward+backward
        bb, variables, img = make_backbone(cfg, jnp.bfloat16)
        pool = [img + jnp.float32(i) * 1e-3 for i in range(4)]
        for name, fn in (("bb_fwd", bb_fwd_fn(bb)),
                         ("bb_fwd_bwd", bb_fwd_bwd_fn(bb))):
            jf = jax.jit(fn)
            r = timed(lambda i, jf=jf: jf(variables, pool[i % 4]),
                      feeds=lambda i: i, sync=lambda x: float(x))
            out[name] = {"ms": round(r["s"] * 1e3, 1),
                         "rtt_ms": round(r["rtt_s"] * 1e3, 1)}
            if r.get("rtt_anomaly"):
                out[name]["rtt_anomaly"] = True

        # full train step, baseline and stop_fmap_gradient
        for name, extra in (("train_full", {}),
                            ("train_stopfmap", {"stop_fmap_gradient": True})):
            c2 = stage2(**{**overrides, **extra})
            model, state = create_train_state(c2, jax.random.PRNGKey(0),
                                              optax.adamw(2e-4), batch_size=1)
            batch = {k: jnp.asarray(v)
                     for k, v in synthetic.make_batch(c2, 1).items()}
            banks = init_bank_states(c2, 1, feature_dtype=jnp.bfloat16)
            step = jax.jit(make_train_step(c2, model), donate_argnums=(0, 1))
            state_l, banks_l = state, banks
            rng = jax.random.PRNGKey(2)

            def one(i):
                nonlocal state_l, banks_l
                state_l, banks_l, metrics = step(
                    state_l, banks_l, batch, jax.random.fold_in(rng, i))
                return metrics["total_loss"]

            r = timed(one, feeds=lambda i: i, sync=lambda x: float(x))
            out[name] = {"ms": round(r["s"] * 1e3, 1),
                         "rtt_ms": round(r["rtt_s"] * 1e3, 1)}
            if r.get("rtt_anomaly"):
                out[name]["rtt_anomaly"] = True

        if "train_full" in out and "train_stopfmap" in out:
            out["fmap_grad_family_ms"] = round(
                out["train_full"]["ms"] - out["train_stopfmap"]["ms"], 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
