"""Component-level timing of the stage-2 forward on the real TPU.

Timing method: N sequential jitted dispatches with a data dependency chained
through a carried scalar and distinct inputs per call. NOT lax.scan — a scan
body pays a ~60x penalty on gather ops on this backend
(tools/microbench_scan_vs_seq.py), and identical repeated dispatches get
deduped by the axon tunnel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from hipad_tpu.configs.model import stage2
from hipad_tpu.data import synthetic
from hipad_tpu.models.detector import HiPAD
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train.train_step import META_KEYS

N = 16


def measure_rtt():
    """Tunnel round-trip floor: trivial op, hard-synced."""
    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


RTT = None


def timed_chain(fn, x0):
    """fn: jitted (x, c:int32) -> (c', scalar).

    Per-call HARD sync (host transfer of a computed value) — the only
    artifact-proof method through the axon tunnel — then subtract the
    measured trivial-dispatch round trip. p50 of N calls."""
    global RTT
    if RTT is None:
        RTT = measure_rtt()
        print(f"tunnel RTT floor       {RTT*1e3:8.2f} ms (subtracted below)")
    c = jnp.int32(1)
    c1, v = fn(x0, c)
    float(v)
    times = []
    for i in range(N):
        t0 = time.perf_counter()
        c, v = fn(x0, c + i)
        float(v)
        times.append(time.perf_counter() - t0)
    return max(0.0, sorted(times)[len(times) // 2] - RTT)


def main(**overrides):
    cfg = stage2(**overrides)
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    bs = 1
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))
    banks0 = init_bank_states(cfg, bs, feature_dtype=jnp.bfloat16)

    # -- backbone only --
    from hipad_tpu.models.backbone import ResNetFPN
    bb = ResNetFPN(stage_blocks=cfg.backbone_stage_blocks,
                   base_planes=cfg.backbone_base_planes,
                   out_channels=cfg.embed_dims, remat=False,
                   dtype=jnp.bfloat16)
    bbvars = jax.jit(lambda r: bb.init(r, images, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def bb_step(img, c):
        out = bb.apply(bbvars, img + c.astype(img.dtype) * 1e-6,
                       train=False)[0]
        v = out.astype(jnp.float32).sum()
        return v.astype(jnp.int32) % 1024, v

    print(f"backbone+FPN           {timed_chain(bb_step, images)*1e3:8.2f} ms")

    # -- one fused sampler call at stage-2 scale (per layer cost) --
    from hipad_tpu.ops.sampling import deformable_samples_topk_flat
    M0 = (cfg.num_det_anchor * 13 + cfg.num_map_anchor * 300
          + cfg.num_plan_anchor * 90 + 13)
    cams, L, G = cfg.num_cams, cfg.num_levels, cfg.num_groups
    shapes = [(bs, cams, 88, 160, 256), (bs, cams, 44, 80, 256),
              (bs, cams, 22, 40, 256), (bs, cams, 11, 20, 256)]
    k = jax.random.PRNGKey(1)
    fmaps = [jax.random.normal(jax.random.fold_in(k, i), s, jnp.bfloat16)
             for i, s in enumerate(shapes)]
    pts = jax.random.uniform(jax.random.fold_in(k, 9), (bs, M0, cams, 2),
                             jnp.float32)
    wts = jax.nn.softmax(jax.random.normal(
        jax.random.fold_in(k, 10), (bs, M0, cams, L, G), jnp.bfloat16))

    @jax.jit
    def samp_step(pts, c):
        out = deformable_samples_topk_flat(
            fmaps, pts + c.astype(pts.dtype) * 1e-7, wts,
            cam_k=cfg.sampler_cam_k,
            matmul_levels=cfg.sampler_matmul_levels,
            row_packed=cfg.sampler_row_packed)
        v = out.astype(jnp.float32).sum()
        return v.astype(jnp.int32) % 1024, v

    t = timed_chain(samp_step, pts)
    print(f"fused sampler (1 call) {t*1e3:8.2f} ms  (M0={M0}) x6 = {t*6e3:.1f} ms")

    # -- full forward --
    @jax.jit
    def full_step(img, banks):
        out, banks = model.apply(variables, img, metas, banks, train=False)
        return out["plan"]["final_waypoints"], banks

    frames = [images + jnp.asarray(i * 1e-3, images.dtype) for i in range(4)]
    wp, banks = full_step(frames[0], banks0)
    float(jnp.sum(wp))
    banks = banks0
    times = []
    for i in range(N):
        t0 = time.perf_counter()
        wp, banks = full_step(frames[i % 4], banks)
        float(jnp.sum(wp))
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2] - (RTT or 0.0)
    print(f"full forward           {p50*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
