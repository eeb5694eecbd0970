"""Microbench: dense-einsum vs sort+segment feature-map adjoint.

The deformable sampler's feature-map gradient (`ops/sampling.py:
_dense_fmap_grad`) is a chunked one-hot einsum costing 2*M*R*W*C FLOPs per
(layer, level) — ~44 TFLOP per stage-2 train step. This bench prototypes an
exact sparse alternative and times both at stage-2 scale on the real chip:

  sort samples by target cell id; the 4 bilinear-corner streams stay sorted
  under constant cell offsets (+1, +W, +W+1), so ONE [M, 4C] cumsum + ONE
  boundary-row gather (positions from a two-level histogram matmul — no
  scatter anywhere) yields every cell's segment sum; corner offsets become
  static shifted slices of the per-cell diff array.

Honest-timing rules per tools/PERF_NOTES.md: distinct inputs per dispatch,
chained carry, full-output reduction materialised each step.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.ops import sampling


def segment_fmap_grad(feat_shape, cam, sy, sx, wy, wx, g_out):
    """Exact d(feat) via sort + segmented cumsum. Shapes as _dense_fmap_grad.

    feat_shape: (bs, cams, H, W, C); cam/sy/sx [bs, M]; wy/wx [bs, M, 2];
    g_out [bs, M, C] (already group-weighted). Returns [bs, cams, H, W, C] f32.
    """
    bs, cams, H, W, C = feat_shape
    M = cam.shape[1]
    NC = cams * H * W
    OFFS = (0, 1, W, W + 1)  # corner (i, j) -> cell offset i*W + j

    def one(cam1, sy1, sx1, wy1, wx1, g1):
        cell = (cam1 * H + sy1) * W + sx1  # [M]
        skeys, sidx = jax.lax.sort_key_val(cell, jnp.arange(M, dtype=jnp.int32))
        pdt = g1.dtype  # bf16 under mixed-precision training
        payload = jnp.concatenate(
            [g1, wy1.astype(pdt), wx1.astype(pdt)], axis=1)  # [M, C+4]
        ps = jnp.take(payload, sidx, axis=0)  # ONE row gather
        gs = ps[:, :C].astype(jnp.float32)
        wys, wxs = ps[:, C:C + 2].astype(jnp.float32), ps[:, C + 2:].astype(jnp.float32)

        # V[p, k, c] for the 4 corners, in sorted order
        wk = jnp.stack([wys[:, 0] * wxs[:, 0], wys[:, 0] * wxs[:, 1],
                        wys[:, 1] * wxs[:, 0], wys[:, 1] * wxs[:, 1]], axis=1)
        v = wk[:, :, None] * gs[:, None, :]  # [M, 4, C]
        mean = v.mean(axis=0)  # [4, C]
        cs = jnp.concatenate(
            [jnp.zeros((1, 4, C), jnp.float32),
             jnp.cumsum(v - mean[None], axis=0)], axis=0)  # [M+1, 4, C]

        # exact per-cell counts via two one-hot einsums (f32 accumulate)
        LOW = 128
        nb = -(-NC // LOW)
        oh_hi = jax.nn.one_hot((cell // LOW), nb, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot((cell % LOW), LOW, dtype=jnp.bfloat16)
        counts = jnp.einsum("pb,pl->bl", oh_hi, oh_lo,
                            preferred_element_type=jnp.float32)
        counts = counts.reshape(nb * LOW)[:NC]
        end = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.cumsum(counts)]).astype(jnp.int32)  # [NC+1]

        # ONE boundary gather shared by all corners
        G = jnp.take(cs.reshape(M + 1, 4 * C), end, axis=0)  # [NC+1, 4C]
        D = (G[1:] - G[:-1]).reshape(NC, 4, C)
        D = D + counts[:, None, None] * mean[None]  # un-center

        out = jnp.zeros((NC, C), jnp.float32)
        for k, off in enumerate(OFFS):
            if off == 0:
                out = out + D[:, k]
            else:
                out = out.at[off:].add(D[:-off, k])  # static-slice add
        return out.reshape(cams, H, W, C)

    return jax.vmap(one)(cam, sy, sx, wy, wx, g_out)


def dense_fmap_grad_wmajor(feat_shape, cam, sy, sx, wy, wx, g_out):
    """_dense_fmap_grad with the accumulator kept in the matmul's native
    W-major layout ([bs, W, R, C]) and ONE transpose at the end.

    Hypothesis from the train-step device trace: the per-chunk einsum
    "bpr,bpwc->brwc" emits f32[R,W,C]{2,0,1} (W-major) which XLA relayouts
    into the [R,W,C] row-major accumulator every chunk (~5 ms x 12 chunks
    per level-0 instance). Accumulating W-major should make the add free
    and pay one 86 MB transpose per instance instead.
    """
    bs, cams, H, W, C = feat_shape
    M = cam.shape[1]
    R = cams * H
    row = cam * H + sy
    P = 2048
    n = -(-M // P)
    pad = n * P - M

    def pad_chunks(a):
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        a = jnp.pad(a, widths)
        a = a.reshape((bs, n, P) + a.shape[2:])
        return a.swapaxes(0, 1)

    rr = jnp.arange(R)
    cc = jnp.arange(W)
    bf = g_out.dtype

    def step(acc, ch):
        row_c, sx_c, wy_c, wx_c, g_c = ch
        w_row = (wy_c[..., 0:1] * (rr == row_c[..., None])
                 + wy_c[..., 1:2] * (rr == row_c[..., None] + 1))
        w_col = (wx_c[..., 0:1] * (cc == sx_c[..., None])
                 + wx_c[..., 1:2] * (cc == sx_c[..., None] + 1))
        v = (w_row[..., None] * g_c[:, :, None, :]).astype(bf)  # [b,P,R,C]
        return acc + jnp.einsum("bpw,bprc->bwrc", w_col.astype(bf), v,
                                preferred_element_type=jnp.float32), None

    chunks = tuple(pad_chunks(a) for a in (row, sx, wy, wx, g_out))
    acc0 = jnp.zeros((bs, W, R, C), jnp.float32)
    g_acc, _ = jax.lax.scan(step, acc0, chunks)
    return g_acc.transpose(0, 2, 1, 3).reshape(bs, cams, H, W, C)


def make_inputs(rng, bs, cams, H, W, C, M, dtype=jnp.bfloat16, conc=False):
    ks = jax.random.split(rng, 6)
    if conc:
        # adversarial concentration: all samples in a 8x8 patch of cam 0
        cam = jnp.zeros((bs, M), jnp.int32)
        sy = jax.random.randint(ks[1], (bs, M), 0, 8)
        sx = jax.random.randint(ks[2], (bs, M), 0, 8)
    else:
        cam = jax.random.randint(ks[0], (bs, M), 0, cams)
        sy = jax.random.randint(ks[1], (bs, M), 0, H - 1)
        sx = jax.random.randint(ks[2], (bs, M), 0, W - 1)
    wy = jax.random.uniform(ks[3], (bs, M, 2), dtype)
    wx = jax.random.uniform(ks[4], (bs, M, 2), dtype)
    g = jax.random.normal(ks[5], (bs, M, C), dtype)
    return cam, sy, sx, wy, wx, g


def time_fn(fn, args_list):
    o = fn(*args_list[0])
    float(o.sum())
    ts = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        o = fn(*args)
        float(o.sum())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def parity(H=24, W=40, C=64, M=3000, conc=False):
    rng = jax.random.PRNGKey(1 + conc)
    cam, sy, sx, wy, wx, g = make_inputs(rng, 1, 6, H, W, C, M,
                                         dtype=jnp.float32, conc=conc)
    feat = jnp.zeros((1, 6, H, W, C), jnp.float32)
    ref = sampling._dense_fmap_grad(feat, cam, sy, sx, wy, wx, g)
    new = segment_fmap_grad(feat.shape, cam, sy, sx, wy, wx, g)
    wmaj = dense_fmap_grad_wmajor(feat.shape, cam, sy, sx, wy, wx, g)
    scale = jnp.abs(ref).max() + 1e-9
    return float(jnp.maximum(jnp.abs(ref - new).max(),
                             jnp.abs(ref - wmaj).max()) / scale)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend())
    print(f"parity (uniform): rel_err={parity():.2e}")
    print(f"parity (concentrated): rel_err={parity(conc=True):.2e}")

    bs, cams, C = 1, 6, 256
    M = 170_000
    rng = jax.random.PRNGKey(0)
    for (H, W) in [(88, 160), (44, 80)]:
        feat_shape = (bs, cams, H, W, C)
        feat = jnp.zeros(feat_shape, jnp.bfloat16)
        args_list = [make_inputs(jax.random.fold_in(rng, i), bs, cams, H, W,
                                 C, M) for i in range(6)]
        dense = jax.jit(functools.partial(sampling._dense_fmap_grad, feat))
        t_d = time_fn(dense, args_list)
        seg = jax.jit(functools.partial(segment_fmap_grad, feat_shape))
        t_s = time_fn(seg, args_list)
        wmaj = jax.jit(functools.partial(dense_fmap_grad_wmajor, feat_shape))
        t_w = time_fn(wmaj, args_list)
        print(f"level H={H} W={W} M={M}: dense={t_d*1e3:.1f} ms  "
              f"segment={t_s*1e3:.1f} ms  wmajor={t_w*1e3:.1f} ms")


if __name__ == "__main__":
    main()
