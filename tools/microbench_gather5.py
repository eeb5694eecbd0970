"""Microbench v5: clean A/B of the production patch gather vs packed-row.

Model-scale shapes: feat [1, 6, 88, 160, 256] bf16 (level 0), M = 255k
compacted samples (85k x cam_k=3) — exactly one decoder layer's level-0 load.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BS, CAMS, H, W, C = 1, 6, 88, 160, 256
M = 254739  # 84913 * 3
ITERS = 16


def bench(fn, data, denom, idx, iters=ITERS):
    """Times fn(data, perturbed_idx) with a carried data dependency."""

    @jax.jit
    def run(data, idx):
        def body(c, _):
            out = fn(data, (idx + c) % denom)
            # reduce over EVERYTHING gathered: using only out[0] lets XLA
            # shrink the whole gather to a single row (slice-of-gather),
            # and a `% 1` carry constant-folds to zero and the body gets
            # hoisted out of the scan entirely. Both burned us.
            v = out.astype(jnp.float32).sum()
            return v.astype(jnp.int32), v
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return ys.sum()

    r = run(data, idx); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(data, idx); r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    k = jax.random.PRNGKey(0)
    feat = jax.random.normal(k, (BS, CAMS, H, W, C), jnp.bfloat16)
    cam = jax.random.randint(jax.random.fold_in(k, 1), (BS, M), 0, CAMS, jnp.int32)
    sy = jax.random.randint(jax.random.fold_in(k, 2), (BS, M), 0, H - 2, jnp.int32)
    sx = jax.random.randint(jax.random.fold_in(k, 3), (BS, M), 0, W - 2, jnp.int32)

    # reference row gather baseline (same-load calibration vs earlier runs)
    fm2 = feat.reshape(BS * CAMS * H * W, C)
    flat_idx = ((cam * H + sy) * W + sx).reshape(-1)
    fn0 = lambda fm2, idx: jnp.take(fm2, idx, axis=0)
    dt = bench(fn0, fm2, CAMS * H * W, flat_idx)
    print(f"row gather C=256 flat   : {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/row")

    # A. production _patch_gather formulation (ops/sampling.py)
    _PATCH_DN = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))

    def patch_gather(feat, sy):
        def g(f, ic, iy, ix):
            starts = jnp.stack([ic, iy, ix], axis=-1)
            return jax.lax.gather(
                f, starts, _PATCH_DN, slice_sizes=(1, 2, 2, C),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jax.vmap(g)(feat, cam, sy, sx)

    dt = bench(patch_gather, feat, H - 2, sy)
    print(f"prod patch (1,2,2,C)    : {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/patch")

    # B. quad-packed single-row gather
    def build_quad(feat):
        f = feat
        q = jnp.concatenate([
            f,
            jnp.roll(f, -1, axis=3),
            jnp.roll(f, -1, axis=2),
            jnp.roll(jnp.roll(f, -1, axis=2), -1, axis=3),
        ], axis=-1)  # [bs, cams, H, W, 4C]
        return q.reshape(BS, CAMS * H * W, 4 * C)

    quad = jax.jit(build_quad)(feat)
    fidx = (cam * H + sy) * W + sx  # [BS, M]

    def quad_gather(quad, fidx):
        return jnp.take_along_axis(quad, fidx[..., None], axis=1)

    dt = bench(quad_gather, quad, CAMS * H * W, fidx)
    print(f"quad row (4C=2KB)       : {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/row")

    # B2. quad via vmapped lax.gather (PROMISE_IN_BOUNDS)
    dn2 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def quad_gather2(quad, fidx):
        def g(q, i):
            return jax.lax.gather(q, i[:, None], dn2, slice_sizes=(1, 4 * C),
                                  mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return jax.vmap(g)(quad, fidx)

    dt = bench(quad_gather2, quad, CAMS * H * W, fidx)
    print(f"quad row lax PIB        : {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/row")

    # C. build cost of the quad map
    dt = bench(lambda f, _i: build_quad(f + 0.0 * _i), feat, 7,
               jnp.zeros((), jnp.int32))
    print(f"quad build              : {dt*1e3:8.2f} ms")

    # D. quad gather + bilinear interp epilogue (full level sample)
    wy = jax.random.uniform(jax.random.fold_in(k, 5), (BS, M, 2), jnp.bfloat16)
    wx = jax.random.uniform(jax.random.fold_in(k, 6), (BS, M, 2), jnp.bfloat16)

    def quad_sample(quad, fidx):
        rows = jnp.take_along_axis(quad, fidx[..., None], axis=1)
        patch = rows.reshape(BS, M, 2, 2, C)
        return jnp.einsum("bmijC,bmi,bmj->bmC", patch, wy, wx)

    dt = bench(quad_sample, quad, CAMS * H * W, fidx)
    print(f"quad row + interp       : {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/sample")


if __name__ == "__main__":
    main()
