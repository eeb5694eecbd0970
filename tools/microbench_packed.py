"""Isolate the packed-row sampler pieces at stage-2 level-0 scale.

bench.py measured row_packed=True SLOWER end-to-end (4.28 vs 5.83 fps);
this times each piece separately (chained distinct-input dispatches,
full-output reduction carries, RTT subtracted — see PERF_NOTES):

  a) patch gather baseline: (2,2,C) slice gather, M samples
  b) packed-row gather: take_along_axis on [1, R, 4C] with M indices
  c) build_packed_level alone (3 rolls + concat + reshape)
  d) b with the packed table built in the same jit (CSE/materialisation
     behaviour when fused with its producer)

Run: python -u tools/microbench_packed.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.ops.sampling import build_packed_level

BS, CAMS, H, W, C = 1, 6, 88, 160, 256
M = 170_000  # one layer's level-0 samples at cam_k=2


def rtt_measure():
    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def timed(name, fn, args_list, rtt, iters=8):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2] - rtt
    print(f"{name}: {med*1e3:.2f} ms")
    return med


def main():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(BS, CAMS, H, W, C), jnp.bfloat16)
    R = CAMS * H * W
    idxs = [jnp.asarray(rng.randint(0, R - W - 1, (BS, M)), jnp.int32)
            for _ in range(4)]
    cams_i = [jnp.asarray(rng.randint(0, CAMS, (BS, M)), jnp.int32)
              for _ in range(4)]
    sy = [jnp.asarray(rng.randint(0, H - 2, (BS, M)), jnp.int32)
          for _ in range(4)]
    sx = [jnp.asarray(rng.randint(0, W - 2, (BS, M)), jnp.int32)
          for _ in range(4)]

    rtt = rtt_measure()
    print(f"rtt {rtt*1e3:.1f} ms")

    # a) patch slice gather
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))

    @jax.jit
    def patch(f, ic, iy, ix):
        def g(fb, c, y, x):
            starts = jnp.stack([c, y, x], axis=-1)
            return jax.lax.gather(
                fb, starts, dn, slice_sizes=(1, 2, 2, C),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        out = jax.vmap(g)(f, ic, iy, ix)  # [BS, M, 2, 2, C]
        return out.astype(jnp.float32).sum(axis=(2, 3))

    timed("a) patch (2,2,C) gather", patch,
          [(feat, c, y, x) for c, y, x in zip(cams_i, sy, sx)], rtt)

    # b) packed-row gather from a PREBUILT table
    packed = build_packed_level(feat)
    packed = jax.block_until_ready(packed)

    @jax.jit
    def rowgather(p, i):
        rows = jnp.take_along_axis(p, i[..., None], axis=1)  # [BS, M, 4C]
        return rows.astype(jnp.float32).sum(axis=-1)

    timed("b) packed 4C-row gather (prebuilt)", rowgather,
          [(packed, i) for i in idxs], rtt)

    # c) packing alone
    @jax.jit
    def build(f, eps):
        return build_packed_level(f + eps).astype(jnp.float32).sum()

    timed("c) build_packed_level", build,
          [(feat, jnp.bfloat16(i * 1e-3)) for i in range(4)], rtt)

    # d) pack + gather in one jit (what the model does per frame)
    @jax.jit
    def build_and_gather(f, i):
        p = build_packed_level(f)
        rows = jnp.take_along_axis(p, i[..., None], axis=1)
        return rows.astype(jnp.float32).sum(axis=-1)

    timed("d) pack+gather fused", build_and_gather,
          [(feat, i) for i in idxs], rtt)

    # e) narrow-row gather for reference (C-wide rows, 4x M rows)
    @jax.jit
    def rowgather_narrow(f, i):
        fm = f.reshape(BS, R, C)
        rows = jnp.take_along_axis(fm, i[..., None], axis=1)
        return rows.astype(jnp.float32).sum(axis=-1)

    timed("e) 256ch-row gather (M rows)", rowgather_narrow,
          [(feat, i) for i in idxs], rtt)


if __name__ == "__main__":
    main()
