"""A/B: two per-level patch gathers vs ONE dual-level 13C combo-row gather.

Model scale: level0 [6, 88, 160, 256], level1 [6, 44, 80, 256], M = 255k
compacted samples. Timed inside one jit with a genuinely data-dependent
carry and a full-output reduction (see microbench_gather5 for the two traps)
plus perturbed timed inputs (tunnel dedup).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BS, CAMS, C = 1, 6, 256
H0, W0 = 88, 160
H1, W1 = 44, 80
M = 254739
ITERS = 16


def bench(fn, data, idx, denom):
    @jax.jit
    def run(data, idx):
        def body(c, _):
            out = fn(data, (idx + c) % denom)
            v = out.astype(jnp.float32).sum()
            return v.astype(jnp.int32) % 1024, v
        c, ys = jax.lax.scan(body, jnp.int32(1), None, length=ITERS)
        return ys.sum()

    r = run(data, idx); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(data, (idx + 7) % denom); r.block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def main():
    k = jax.random.PRNGKey(0)
    f0 = jax.random.normal(k, (BS, CAMS, H0, W0, C), jnp.bfloat16)
    f1 = jax.random.normal(jax.random.fold_in(k, 1), (BS, CAMS, H1, W1, C),
                           jnp.bfloat16)
    cam = jax.random.randint(jax.random.fold_in(k, 2), (BS, M), 0, CAMS, jnp.int32)
    sy0 = jax.random.randint(jax.random.fold_in(k, 3), (BS, M), 0, H0 - 2, jnp.int32)
    sx0 = jax.random.randint(jax.random.fold_in(k, 4), (BS, M), 0, W0 - 2, jnp.int32)
    wy = jax.random.uniform(jax.random.fold_in(k, 5), (BS, M, 2), jnp.bfloat16)
    wx = jax.random.uniform(jax.random.fold_in(k, 6), (BS, M, 2), jnp.bfloat16)
    wy3 = jax.random.uniform(jax.random.fold_in(k, 7), (BS, M, 3), jnp.bfloat16)
    wx3 = jax.random.uniform(jax.random.fold_in(k, 8), (BS, M, 3), jnp.bfloat16)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))

    def patch2(feats, sy):
        """current scheme: one (1,2,2,C) patch gather per (sample, level)"""
        f0_, f1_ = feats
        total = jnp.zeros((), jnp.float32)
        out = 0.0
        sy1 = jnp.clip((sy - 1) // 2, 0, H1 - 2)
        sx1 = jnp.clip((sx0 - 1) // 2, 0, W1 - 2)
        for f, iy, ix, hh in ((f0_, sy, sx0, H0), (f1_, sy1, sx1, H1)):
            def g(fm, ic, yy, xx):
                starts = jnp.stack([ic, yy, xx], axis=-1)
                return jax.lax.gather(
                    fm, starts, dn, slice_sizes=(1, 2, 2, C),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            patch = jax.vmap(g)(f, cam, iy, ix)  # [BS, M, 2, 2, C]
            out = out + jnp.einsum("bmijC,bmi,bmj->bmC",
                                   patch.astype(jnp.bfloat16), wy, wx)
        return out

    def build_combo(f0_, f1_):
        """[BS, CAMS*H0*W0, 13C]: lvl0 2x2 patch + lvl1 3x3 patch per cell."""
        r = lambda f, dy, dx: jnp.roll(jnp.roll(f, -dy, axis=2), -dx, axis=3)
        p0 = jnp.concatenate([r(f0_, i, j) for i in (0, 1) for j in (0, 1)],
                             axis=-1)  # [.., H0, W0, 4C]
        p1 = jnp.concatenate([r(f1_, i, j) for i in (0, 1, 2) for j in (0, 1, 2)],
                             axis=-1)  # [.., H1, W1, 9C]
        # upsample p1 to the level-0 grid at the anchor rule e=(y0-1)//2
        y0 = jnp.arange(H0)
        x0 = jnp.arange(W0)
        ey = jnp.clip((y0 - 1) // 2, 0, H1 - 3)
        ex = jnp.clip((x0 - 1) // 2, 0, W1 - 3)
        p1u = p1[:, :, ey][:, :, :, ex]  # [.., H0, W0, 9C]
        combo = jnp.concatenate([p0, p1u], axis=-1)  # [.., 13C]
        return combo.reshape(BS, CAMS * H0 * W0, 13 * C)

    combo = jax.jit(build_combo)(f0, f1)

    def combo_gather(combo, sy):
        fidx = (cam * H0 + sy) * W0 + sx0
        rows = jnp.take_along_axis(combo, fidx[..., None], axis=1)
        pa = rows[..., : 4 * C].reshape(BS, M, 2, 2, C)
        pb = rows[..., 4 * C :].reshape(BS, M, 3, 3, C)
        out0 = jnp.einsum("bmijC,bmi,bmj->bmC", pa, wy, wx)
        out1 = jnp.einsum("bmijC,bmi,bmj->bmC", pb, wy3, wx3)
        return out0 + out1

    dt = bench(patch2, (f0, f1), sy0, H0 - 2)
    print(f"two patch gathers  : {dt*1e3:8.2f} ms  {dt/M*1e9:6.2f} ns/sample")
    dt = bench(combo_gather, combo, sy0, H0 - 2)
    print(f"combo 13C row      : {dt*1e3:8.2f} ms  {dt/M*1e9:6.2f} ns/sample")

    dtb = bench(lambda fs, _i: build_combo(fs[0] + _i.astype(jnp.bfloat16) * 1e-6,
                                           fs[1]),
                (f0, f1), jnp.zeros((), jnp.int32), 7)
    print(f"combo build        : {dtb*1e3:8.2f} ms (once per frame)")


if __name__ == "__main__":
    main()
