"""Surgical per-stage timing of deformable_samples_topk_flat at stage-2
scale (hard-synced, RTT-subtracted): prepare/compaction vs gather levels vs
matmul levels vs epilogue.
"""

import time

import jax
import jax.numpy as jnp

from hipad_tpu.ops import sampling as S

BS, CAMS, C, L, G = 1, 6, 256, 4, 8
M0 = 84913
N = 8


def rtt_floor():
    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def timed(fn, pts, rtt):
    @jax.jit
    def f(pts, c):
        out = fn(pts + c.astype(pts.dtype) * 1e-7)
        v = out.astype(jnp.float32).sum()
        return v.astype(jnp.int32) % 1024, v

    c = jnp.int32(1)
    c, v = f(pts, c); float(v)
    ts = []
    for i in range(N):
        t0 = time.perf_counter()
        c, v = f(pts, c + i)
        float(v)
        ts.append(time.perf_counter() - t0)
    return max(0.0, sorted(ts)[len(ts) // 2] - rtt)


def main():
    k = jax.random.PRNGKey(1)
    shapes = [(BS, CAMS, 88, 160, C), (BS, CAMS, 44, 80, C),
              (BS, CAMS, 22, 40, C), (BS, CAMS, 11, 20, C)]
    fmaps = [jax.random.normal(jax.random.fold_in(k, i), s, jnp.bfloat16)
             for i, s in enumerate(shapes)]
    pts = jax.random.uniform(jax.random.fold_in(k, 9), (BS, M0, CAMS, 2),
                             jnp.float32)
    wts = jax.nn.softmax(jax.random.normal(
        jax.random.fold_in(k, 10), (BS, M0, CAMS, L, G), jnp.bfloat16))
    rtt = rtt_floor()
    print(f"RTT {rtt*1e3:.2f} ms")

    # 1. compaction/prepare only: camera selection + one-hot compaction.
    def compact(p, sel_fn, k=3):
        inside = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        cam_idx = sel_fn(inside, k)
        sel = jax.nn.one_hot(cam_idx, CAMS, dtype=wts.dtype)
        pp = jnp.einsum("bmkc,bmcd->bmkd", sel.astype(p.dtype), p)
        ins = jnp.einsum("bmkc,bmc->bmk", sel, inside.astype(wts.dtype))
        ww = jnp.einsum("bmkc,bmclg->bmklg", sel, wts)
        w = (ww * ins[..., None, None])
        return pp.sum() + w.sum() + cam_idx.astype(p.dtype).sum()

    def sel_topk(inside, k):
        score = inside.astype(jnp.float32) - jnp.arange(CAMS) * 1e-6
        _, cam_idx = jax.lax.top_k(score, k)
        return cam_idx

    def sel_argmax(inside, k):
        score = inside.astype(jnp.float32)
        picks = []
        for _ in range(k):
            idx = jnp.argmax(score, axis=-1)
            picks.append(idx)
            score = score - 2.0 * jax.nn.one_hot(idx, CAMS, dtype=score.dtype)
        return jnp.stack(picks, axis=-1)

    def sel_only(p, sel_fn, k=3):
        inside = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        return sel_fn(inside, k).astype(jnp.float32).sum()

    print(f"cam select top_k  only  : {timed(lambda p: sel_only(p, sel_topk), pts, rtt)*1e3:8.2f} ms")
    print(f"cam select argmax only  : {timed(lambda p: sel_only(p, sel_argmax), pts, rtt)*1e3:8.2f} ms")
    print(f"prep/compact (top_k)    : {timed(lambda p: compact(p, sel_topk), pts, rtt)*1e3:8.2f} ms")
    print(f"prep/compact (argmax)   : {timed(lambda p: compact(p, sel_argmax), pts, rtt)*1e3:8.2f} ms")

    # 2. gather levels 0+1 only (no matmul levels)
    def g01(p):
        return S.deformable_samples_topk_flat(
            fmaps[:2], p, wts[..., :2, :], cam_k=3, matmul_levels=())

    print(f"gather lvls 0+1 (+prep) : {timed(g01, pts, rtt)*1e3:8.2f} ms")

    # 3. matmul levels 2+3 only
    def mm23(p):
        return S.deformable_samples_topk_flat(
            fmaps[2:], p, wts[..., 2:, :], cam_k=3, matmul_levels=(0, 1))

    print(f"matmul lvls 2+3 (+prep) : {timed(mm23, pts, rtt)*1e3:8.2f} ms")

    # 4. gather level 0 only
    def g0(p):
        return S.deformable_samples_topk_flat(
            fmaps[:1], p, wts[..., :1, :], cam_k=3, matmul_levels=())

    print(f"gather lvl 0 (+prep)    : {timed(g0, pts, rtt)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
