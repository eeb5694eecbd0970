"""Component-level timing of the stage-2 forward on the real TPU.

Times (in-jit scan, data-dependent carry — see verify skill):
  1. backbone+FPN only
  2. full forward (temporal variant, like bench.py)
  3. full forward with the deformable sampler stubbed to zeros
  4. one fused sampler call at stage-2 scale (per layer cost)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.configs.model import stage2
from hipad_tpu.data import synthetic
from hipad_tpu.models.detector import HiPAD
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train.train_step import META_KEYS

N = 8


def timed(fn, *args, iters=N):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32), leaf.ravel()[0]
        c, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return ys.sum()

    r = run(*args); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(*args); r.block_until_ready()
    return (time.perf_counter() - t0) / iters


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

    # -- backbone only --
    from hipad_tpu.models.backbone import ResNetFPN
    bb = ResNetFPN(stage_blocks=cfg.backbone_stage_blocks,
                   base_planes=cfg.backbone_base_planes,
                   out_channels=cfg.embed_dims, remat=False,
                   dtype=jnp.bfloat16)
    bbvars = jax.jit(lambda r: bb.init(r, images, train=False))(
        jax.random.PRNGKey(0))

    def bb_fn(images):
        return bb.apply(bbvars, images, train=False)[0]

    @jax.jit
    def run_bb(images):
        def body(c, _):
            out = bb_fn(images + c.astype(images.dtype))
            v = out.astype(jnp.float32).sum()
            return v * 1e-9, v
        c, ys = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return ys.sum()

    # perturb the timed call's input: the axon tunnel can dedupe an
    # entire dispatch that exactly repeats the previous one
    r = run_bb(images); r.block_until_ready()
    images_b = images + jnp.bfloat16(1e-3)
    t0 = time.perf_counter(); r = run_bb(images_b); r.block_until_ready()
    print(f"backbone+FPN           {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

    # -- one fused sampler call at stage-2 scale --
    from hipad_tpu.ops.sampling import deformable_samples_topk_flat
    M0 = (cfg.num_det_anchor * 13 + cfg.num_map_anchor * 300
          + cfg.num_plan_anchor * 6 * 5 * 3 // 90 * 90 + 13)
    M0 = cfg.num_det_anchor * 13 + cfg.num_map_anchor * 300 + cfg.num_plan_anchor * 90 + 13
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

    def samp(pts):
        return deformable_samples_topk_flat(
            fmaps, pts, wts, cam_k=cfg.sampler_cam_k,
            matmul_levels=cfg.sampler_matmul_levels)

    @jax.jit
    def run_samp(pts):
        def body(c, _):
            out = samp(pts + c.astype(pts.dtype))
            v = out.astype(jnp.float32).sum()
            return v * 1e-9, v
        c, ys = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return ys.sum()

    r = run_samp(pts); r.block_until_ready()
    pts_b = pts + 1e-4
    t0 = time.perf_counter(); r = run_samp(pts_b); r.block_until_ready()
    t_samp = (time.perf_counter() - t0) / N
    print(f"fused sampler (1 call) {t_samp*1e3:8.2f} ms  (M0={M0}) x6 layers = {t_samp*6e3:.1f} ms")
    # -- full forward (with banks, like bench.py) --
    def full(images):
        out, _ = model.apply(variables, images, metas, banks0, train=False)
        return out["plan"]["final_waypoints"]

    # carry dependency through images so scan iterations serialize
    @jax.jit
    def run_full(images):
        def body(c, _):
            out = full(images + c.astype(images.dtype))
            v = out.astype(jnp.float32).sum()
            return v * 1e-9, v
        c, ys = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return ys.sum()

    try:
        r = run_full(images); r.block_until_ready()
        images_c = images + jnp.asarray(1e-3, images.dtype)
        t0 = time.perf_counter(); r = run_full(images_c); r.block_until_ready()
        t_full = (time.perf_counter() - t0) / N
        print(f"full forward           {t_full*1e3:8.2f} ms")
    except Exception as e:
        print(f"full forward FAILED: {(str(e).splitlines() or [''])[0][:120]}")



if __name__ == "__main__":
    main()
