"""Multi-camera multi-scale deformable feature sampling (XLA reference).

This is the TPU-native equivalent of the reference's hand-written CUDA op
``deformable_aggregation_ext`` (`ops/src/deformable_aggregation_cuda.cu:129-187`):
for every (anchor, keypoint, camera, level) it bilinearly samples a feature
pyramid at a normalised 2D location, multiplies by a per-(point, camera,
level, group) weight, and accumulates into a per-anchor feature vector.

Design notes (TPU-first):
  * Feature maps stay as a list of per-level ``[bs, cams, H, W, C]`` NHWC
    tensors. The reference's flattened "column" format + scale_start_index
    bookkeeping (`ops/__init__.py:33-103`) exists only to feed a single CUDA
    kernel; on TPU, per-level XLA gathers fuse fine and keep shapes static.
  * Out-of-bounds handling is masking, not early-exit: samples with a
    normalised location outside the open interval (0, 1) get weight zero
    (semantics of `.cu:169-171`), and each bilinear corner outside the map
    contributes zero (semantics of `bilinear_sampling`, `.cu:13-59`).
  * The group-weighted reduction is one einsum per (level, corner) so the
    full [.., C]-broadcast weight tensor is never materialised.

This function is the *oracle* for the Pallas kernel in ``pallas_interp.py`` and
is itself fully differentiable (XLA derives gathers' scatter-add adjoints,
no atomics involved).
"""

from __future__ import annotations

import functools

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def topk_by_argmax(score: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the ``k`` largest entries along the last axis, via ``k``
    iterative argmaxes (ties -> lowest index).

    Deliberately NOT ``lax.top_k``: on this backend top_k lowers to a
    variadic sort that measured ~8 ms per call at stage-2 scale
    (tools/microbench_sampler_stages.py) and faulted the TPU worker at bs=2
    (bench.py --bs 2 bisect). argmax+mask is pure VPU work, and for the
    order-invariant one-hot consumers in this module the selection set is
    identical.
    """
    n = score.shape[-1]
    picks = []
    for _ in range(k):
        idx = jnp.argmax(score, axis=-1)
        picks.append(idx)
        score = jnp.where(jax.nn.one_hot(idx, n, dtype=score.dtype) > 0,
                          -jnp.inf, score)
    return jnp.stack(picks, axis=-1)


def deformable_aggregation(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted multi-view multi-scale bilinear sampling.

    Args:
      feature_maps: per-level tensors ``[bs, cams, H_l, W_l, C]``.
      points_2d: ``[bs, anchor, pts, cams, 2]`` sampling locations normalised
        to [0, 1] in (x, y) order.
      weights: ``[bs, anchor, pts, cams, levels, groups]`` softmax weights;
        channels are split into ``groups`` contiguous blocks.

    Returns:
      ``[bs, anchor, C]`` aggregated features in the weights' dtype.
    """
    bs, num_anchor, num_pts, num_cams, _ = points_2d.shape
    num_levels = len(feature_maps)
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    group_dims = channels // groups

    # Mask samples outside the open unit square once for all levels.
    inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)  # [b,a,p,c]

    # [b, cams, anchor, pts]
    x = jnp.transpose(points_2d[..., 0], (0, 3, 1, 2))
    y = jnp.transpose(points_2d[..., 1], (0, 3, 1, 2))
    inside = jnp.transpose(inside, (0, 3, 1, 2))
    # weights -> [b, cams, anchor, pts, levels, groups]
    w = jnp.transpose(weights, (0, 3, 1, 2, 4, 5))

    out = jnp.zeros((bs, num_anchor, channels), dtype=weights.dtype)
    for lvl in range(num_levels):
        feat = feature_maps[lvl]
        h_l, w_l = feat.shape[2], feat.shape[3]
        fm = feat.reshape(bs * num_cams, h_l * w_l, channels)

        px = x * w_l - 0.5
        py = y * h_l - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        w_lvl = w[..., lvl, :] * inside[..., None]  # [b,c,a,p,G]

        for dy, dx, cw in (
            (0, 0, (1.0 - fy) * (1.0 - fx)),
            (0, 1, (1.0 - fy) * fx),
            (1, 0, fy * (1.0 - fx)),
            (1, 1, fy * fx),
        ):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            idx = jnp.clip(yi, 0, h_l - 1) * w_l + jnp.clip(xi, 0, w_l - 1)
            idx = idx.reshape(bs * num_cams, num_anchor * num_pts)
            gathered = jnp.take_along_axis(fm, idx[:, :, None], axis=1)
            gathered = gathered.reshape(bs, num_cams, num_anchor, num_pts, groups, group_dims)
            corner_w = (cw * valid).astype(weights.dtype)[..., None] * w_lvl
            out = out + jnp.einsum(
                "bcapgd,bcapg->bagd", gathered.astype(weights.dtype), corner_w
            ).reshape(bs, num_anchor, channels)
    return out


def deformable_aggregation_patch(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Patch-gather variant of :func:`deformable_aggregation` — identical
    semantics, 4x fewer gather rows.

    XLA:TPU gathers are *row-latency bound* (~17 ns/row regardless of row
    width or dtype, measured on v5e), so the 4 per-corner row gathers per
    (sample, level) are replaced by ONE ``(2, 2, C)`` slice gather; the
    bilinear corner weights are re-expressed against the clamped patch
    origin: ``w_row(r) = max(0, 1 - |py - r|)`` for the two patch rows
    (exactly the reference's corner weights with out-of-bounds corners
    receiving weight 0 — see the derivation in the repo notes).

    Args / returns: same as :func:`deformable_aggregation`.
    """
    bs, num_anchor, num_pts, num_cams, _ = points_2d.shape
    num_levels = len(feature_maps)
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    group_dims = channels // groups
    B = bs * num_cams
    M = num_anchor * num_pts

    inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)  # [b,a,p,c]
    # -> [B, M]
    x = jnp.transpose(points_2d[..., 0], (0, 3, 1, 2)).reshape(B, M)
    y = jnp.transpose(points_2d[..., 1], (0, 3, 1, 2)).reshape(B, M)
    inside = jnp.transpose(inside, (0, 3, 1, 2)).reshape(B, M)
    # weights -> [B, M, levels, G]
    w = jnp.transpose(weights, (0, 3, 1, 2, 4, 5)).reshape(B, M, num_levels, groups)
    w = w * inside[..., None, None]

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    out = jnp.zeros((bs, num_anchor, channels), dtype=weights.dtype)
    two = jnp.arange(2, dtype=points_2d.dtype)
    for lvl in range(num_levels):
        feat = feature_maps[lvl]
        h_l, w_l = feat.shape[2], feat.shape[3]
        fm = feat.reshape(B, h_l, w_l, channels)

        px = x * w_l - 0.5
        py = y * h_l - 0.5
        sy = jnp.clip(jnp.floor(py), 0, h_l - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(px), 0, w_l - 2).astype(jnp.int32)

        def g(f, iy, ix):
            starts = jnp.stack([iy, ix], axis=-1)  # [M, 2]
            return jax.lax.gather(
                f, starts, dn, slice_sizes=(2, 2, channels),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # [M, 2, 2, C]

        patch = jax.vmap(g)(fm, sy, sx)  # [B, M, 2, 2, C]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - (sy[..., None] + two)))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - (sx[..., None] + two)))
        patch = patch.reshape(B, M, 2, 2, groups, group_dims)
        # level weight per group x bilinear row/col weights, reduced over
        # patch corners and summed into anchors (p rides inside M).
        contrib = jnp.einsum(
            "bmyxgd,bmy,bmx,bmg->bmgd",
            patch.astype(weights.dtype),
            wy.astype(weights.dtype),
            wx.astype(weights.dtype),
            w[:, :, lvl],
        )
        contrib = contrib.reshape(bs, num_cams, num_anchor, num_pts, channels)
        out = out + contrib.sum(axis=(1, 3))
    return out


def _use_xla_interp():
    import os

    return jax.default_backend() == "cpu" or os.environ.get("HIPAD_NO_PALLAS")


def interp_matmul(fm, px, py, w_lvl, groups):
    """Dense interp sampling -> [B, M, G, C//G]. Pallas VMEM kernel on TPU
    (ops/pallas_interp.py), XLA einsum elsewhere. Backward always uses the
    XLA formulation (its adjoint is a plain transposed matmul chain)."""
    if _use_xla_interp():
        return _interp_matmul_level(fm, px, py, w_lvl, groups)
    out = _interp_matmul_tpu(fm, px, py, w_lvl, groups)  # [B, Mp, C] padded
    B, M = px.shape
    C = fm.shape[-1]
    return out[:, :M].reshape(B, M, groups, C // groups)


def interp_matmul_camsum(fm, px, py, w_lvl, groups, bs, cams):
    """Dense interp sampling summed over the camera dim -> [bs, M, C].

    On TPU the Pallas kernel's PADDED [B, Mp, C] output is reduced over
    cameras FIRST and the 4x smaller sum sliced — slicing the raw kernel
    output forces a ~260 MB copy (seen in HLO)."""
    B, M = px.shape
    C = fm.shape[-1]
    if _use_xla_interp():
        c = _interp_matmul_level(fm, px, py, w_lvl, groups)
        return c.reshape(bs, cams, M, C).sum(axis=1)
    cp = _interp_matmul_tpu(fm, px, py, w_lvl, groups)  # [B, Mp, C]
    c = cp.reshape(bs, cams, cp.shape[1], C).sum(axis=1)
    return c[:, :M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _interp_matmul_tpu(fm, px, py, w_lvl, groups):
    from .pallas_interp import interp_matmul_pallas

    return interp_matmul_pallas(fm, px, py, w_lvl, groups)


def _interp_matmul_tpu_fwd(fm, px, py, w_lvl, groups):
    out = _interp_matmul_tpu(fm, px, py, w_lvl, groups)
    return out, (fm, px, py, w_lvl)


def _interp_matmul_tpu_bwd(groups, res, g):
    # g is PADDED [B, Mp, C]; the XLA adjoint runs on the unpadded M
    fm, px, py, w_lvl = res
    B, M = px.shape
    C = fm.shape[-1]
    gm = g[:, :M].reshape(B, M, groups, C // groups)
    _, vjp = jax.vjp(
        lambda *a: _interp_matmul_level(*a, groups), fm, px, py, w_lvl)
    return vjp(gm.astype(jnp.float32))


_interp_matmul_tpu.defvjp(_interp_matmul_tpu_fwd, _interp_matmul_tpu_bwd)


def _interp_matmul_level(
    fm: jnp.ndarray,  # [B, H, W, C]
    px: jnp.ndarray,  # [B, M] continuous pixel x
    py: jnp.ndarray,
    w_lvl: jnp.ndarray,  # [B, M, G] per-sample group weights (0 for OOB)
    groups: int,
) -> jnp.ndarray:
    """Bilinear sampling as a dense MXU matmul.

    Build the sparse interpolation operator [M, HW] *densely* via
    broadcast-compares against a row/col iota (4 corner weights per row; no
    scatter — scatters are as latency-bound as gathers), then contract with
    the feature map on the MXU. Only viable for coarse levels where
    M x HW stays in the tens-of-GFLOP range; the VPU compare cost is
    4 x M x (H + W) thanks to the separable row/col factorization.

    Returns [B, M, G, C/G] weighted samples (already multiplied by w_lvl).
    """
    B, H, W, C = fm.shape
    M = px.shape[1]
    gd = C // groups

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    iota_h = jnp.arange(H, dtype=py.dtype)
    iota_w = jnp.arange(W, dtype=px.dtype)
    # separable bilinear: wy [B, M, H], wx [B, M, W], each row has <=2 nonzeros
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - iota_h))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - iota_w))
    del y0, x0
    # sample[m, c] = sum_{h,w} wy[m,h] wx[m,w] fm[h,w,c]
    #             = wx[m,:] @ (wy[m,:] @ fm)  -- but wy@fm is per-sample.
    # Instead contract in one einsum; XLA maps it onto the MXU by flattening
    # (h w) after forming the rank-1 interp rows blockwise.
    dt = jnp.bfloat16 if fm.dtype == jnp.bfloat16 else fm.dtype
    interp = (wy[..., :, None] * wx[..., None, :]).reshape(B, M, H * W)
    out = jnp.einsum(
        "bmq,bqc->bmc", interp.astype(dt), fm.reshape(B, H * W, C),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(B, M, groups, gd)
    return out * w_lvl[..., None].astype(out.dtype)


def deformable_aggregation_mixed(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
    matmul_levels: Sequence[int] = (1, 2, 3),
) -> jnp.ndarray:
    """TPU-native hybrid of gather and matmul sampling — identical semantics
    to :func:`deformable_aggregation`.

    XLA:TPU gathers are latency-bound (~17 ns/row on v5e no matter the row
    width), which makes the reference's gather-per-(corner, level) formulation
    ~30x slower per fetch than a 4090's L2-cached reads. The fix is to stop
    gathering where dense compute is cheaper: coarse FPN levels (HW <= ~3.5k)
    are sampled by a dense bilinear-interpolation matmul on the MXU
    (`_interp_matmul_level`); only the stride-4 level keeps the gather path.

    Args: as :func:`deformable_aggregation`; `matmul_levels` selects which
    pyramid levels use the MXU path.
    """
    bs, num_anchor, num_pts, num_cams, _ = points_2d.shape
    num_levels = len(feature_maps)
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    B = bs * num_cams
    M = num_anchor * num_pts

    inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)
    x = jnp.transpose(points_2d[..., 0], (0, 3, 1, 2)).reshape(B, M)
    y = jnp.transpose(points_2d[..., 1], (0, 3, 1, 2)).reshape(B, M)
    inside = jnp.transpose(inside, (0, 3, 1, 2)).reshape(B, M)
    w = jnp.transpose(weights, (0, 3, 1, 2, 4, 5)).reshape(B, M, num_levels, groups)
    w = w * inside[..., None, None]

    out = jnp.zeros((bs, num_anchor, channels), dtype=weights.dtype)

    gather_levels = [l for l in range(num_levels) if l not in matmul_levels]
    if gather_levels:
        sub_maps = [feature_maps[l] for l in gather_levels]
        sub_w = weights[..., gather_levels, :]
        out = out + deformable_aggregation_patch(sub_maps, points_2d, sub_w)

    for lvl in matmul_levels:
        if lvl >= num_levels:
            continue
        feat = feature_maps[lvl]
        h_l, w_l = feat.shape[2], feat.shape[3]
        fm = feat.reshape(B, h_l, w_l, channels)
        px = x * w_l - 0.5
        py = y * h_l - 0.5
        contrib = interp_matmul(fm, px, py, w[:, :, lvl], groups)
        contrib = contrib.reshape(bs, num_cams, num_anchor, num_pts, channels)
        out = out + contrib.sum(axis=(1, 3)).astype(out.dtype)
    return out


_PATCH_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3),
    collapsed_slice_dims=(0,),
    start_index_map=(0, 1, 2),
)

# Per-batch-element chunk length for the dense feature-map gradient: the
# contraction dim of the per-chunk matmul. Longer chunks amortize the
# [R, W, C] accumulator's HBM round-trip (measured best at 2048 on v5e);
# the backward divides by the batch size to bound the [bs, P, W, C]
# intermediate (~170 MB bf16 at stage-2 level 0).
_FMGRAD_CHUNK = 2048


def _patch_gather(feat: jnp.ndarray, cam, sy, sx) -> jnp.ndarray:
    """One (2,2,C) slice per sample from ``feat [bs, cams, H, W, C]``."""
    channels = feat.shape[-1]

    def g(f, ic, iy, ix):
        starts = jnp.stack([ic, iy, ix], axis=-1)  # [M, 3]
        return jax.lax.gather(
            f, starts, _PATCH_DN, slice_sizes=(1, 2, 2, channels),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    return jax.vmap(g)(feat, cam, sy, sx)  # [bs, M, 2, 2, C]


@jax.custom_vjp
def patch_bilinear(feat, cam, sy, sx, wy, wx):
    """Bilinear sampling with a *dense* (matmul) feature-map adjoint.

    out[b,m,:] = sum_ij wy[b,m,i] * wx[b,m,j] * feat[b, cam, sy+i, sx+j, :]

    The VJP of a gather is a scatter, and XLA:TPU scatters are serialized
    (~2 us/row: the level-0+1 feature-map gradient of one plan-scale
    deformable op measured 538 ms on a v5e). Since every sample's adjoint
    row is 2-hot in y and x, d(feat) is instead computed as a chunked
    einsum over [P, cams*H] x [P, W*C] operands — pure MXU work, ~15x
    faster, and the backward re-gathers the patch instead of saving it
    (saves a [bs, M, 4, C] residual). Used by the production ``topk``
    sampler; the oracle paths keep XLA's native adjoint.
    """
    patch = _patch_gather(feat, cam, sy, sx).astype(wy.dtype)
    return jnp.einsum("bmijC,bmi,bmj->bmC", patch, wy, wx)


def _patch_bilinear_fwd(feat, cam, sy, sx, wy, wx):
    out = patch_bilinear.__wrapped__(feat, cam, sy, sx, wy, wx)
    return out, (feat, cam, sy, sx, wy, wx)


def _patch_bilinear_bwd(res, g_out):
    feat, cam, sy, sx, wy, wx = res
    patch = _patch_gather(feat, cam, sy, sx).astype(g_out.dtype)
    g_wy = jnp.einsum("bmC,bmijC,bmj->bmi", g_out, patch, wx)
    g_wx = jnp.einsum("bmC,bmijC,bmi->bmj", g_out, patch, wy)
    g_feat = _fmap_grad(feat, cam, sy, sx, wy, wx, g_out)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return g_feat, f0(cam), f0(sy), f0(sx), g_wy, g_wx


patch_bilinear.defvjp(_patch_bilinear_fwd, _patch_bilinear_bwd)


def build_packed_level(feat: jnp.ndarray) -> jnp.ndarray:
    """Pack each (2,2) bilinear footprint into ONE row: ``[bs, cams, H, W, C]
    -> [bs, cams*H*W, 4C]`` with row (c,y,x) = concat(F[y,x], F[y,x+1],
    F[y+1,x], F[y+1,x+1]).

    XLA:TPU gathers are per-row latency-bound, so fetching a sample's whole
    bilinear patch as one 4C row costs ~1 row instead of the (2,2,C) slice
    gather's ~3 row-units. Edge rows wrap via roll but are never addressed:
    patch starts are clamped to H-2/W-2.
    """
    f01 = jnp.roll(feat, -1, axis=3)
    f10 = jnp.roll(feat, -1, axis=2)
    f11 = jnp.roll(f10, -1, axis=3)
    q = jnp.concatenate([feat, f01, f10, f11], axis=-1)
    return q.reshape(feat.shape[0], -1, 4 * feat.shape[-1])


@jax.custom_vjp
def packed_row_bilinear(feat, packed, cam, sy, sx, wy, wx):
    """Bilinear sampling via ONE packed-row gather per sample.

    Forward reads ``packed`` (see :func:`build_packed_level`); the backward
    ignores packed's cotangent and computes d(feat) directly with the dense
    chunked-matmul adjoint of :func:`patch_bilinear` — mathematically the
    same total gradient, since the output depends on ``feat`` only through
    the (linear) packing.

    Args:
      feat: [bs, cams, H, W, C] (used only by the backward).
      packed: [bs, cams*H*W, 4C] from build_packed_level(feat).
      cam/sy/sx: [bs, M] int32 patch origins (sy<=H-2, sx<=W-2).
      wy/wx: [bs, M, 2] bilinear row/col weights.
    Returns [bs, M, C].
    """
    bs, cams, H, W, C = feat.shape
    fidx = (cam * H + sy) * W + sx
    rows = jnp.take_along_axis(packed, fidx[..., None], axis=1)
    patch = rows.reshape(rows.shape[0], rows.shape[1], 2, 2, C).astype(wy.dtype)
    return jnp.einsum("bmijC,bmi,bmj->bmC", patch, wy, wx)


def _packed_row_bilinear_fwd(feat, packed, cam, sy, sx, wy, wx):
    out = packed_row_bilinear.__wrapped__(feat, packed, cam, sy, sx, wy, wx)
    return out, (feat, packed, cam, sy, sx, wy, wx)


def _packed_row_bilinear_bwd(res, g_out):
    feat, packed, cam, sy, sx, wy, wx = res
    bs, cams, H, W, C = feat.shape
    # re-gather the patch (cheap single rows) for d(wy)/d(wx)
    fidx = (cam * H + sy) * W + sx
    rows = jnp.take_along_axis(packed, fidx[..., None], axis=1)
    patch = rows.reshape(bs, -1, 2, 2, C).astype(g_out.dtype)
    g_wy = jnp.einsum("bmC,bmijC,bmj->bmi", g_out, patch, wx)
    g_wx = jnp.einsum("bmC,bmijC,bmi->bmj", g_out, patch, wy)
    # d(feat): same dense-matmul adjoint as patch_bilinear (2-hot rows/cols)
    g_feat = _fmap_grad(feat, cam, sy, sx, wy, wx, g_out)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (g_feat, jnp.zeros_like(packed), f0(cam), f0(sy), f0(sx), g_wy, g_wx)


packed_row_bilinear.defvjp(_packed_row_bilinear_fwd, _packed_row_bilinear_bwd)


@jax.custom_vjp
def patch_bilinear_w(feat, cam, sy, sx, wy, wx, wg):
    """Bilinear sampling with the per-group level weight folded in:

    out[b,m,g,:] = wg[b,m,g] * sum_ij wy[b,m,i] wx[b,m,j]
                              * feat[b, cam, sy+i, sx+j, g-th block]

    One einsum consumes the patch gather directly (XLA fuses the gather as
    its producer), so neither the [bs, M, 2, 2, C] patch nor an unweighted
    [bs, M, C] sample is round-tripped through HBM — the old three-pass
    epilogue (interp einsum, group multiply, reshape) cost several ms per
    level at M=255k. Backward folds wg into the cotangent and reuses the
    dense chunked-matmul feature-map adjoint.

    Returns [bs, M, C] (groups flattened back into channels).
    """
    bs, cams, H, W, C = feat.shape
    M = cam.shape[1]
    G = wg.shape[-1]
    patch = _patch_gather(feat, cam, sy, sx).astype(wy.dtype)
    # Keep every tensor at C=256 lanes: splitting channels into (G, C//G)
    # changes the TPU lane tiling and XLA materialises a 350 MB relaid-out
    # copy of the patch (seen in HLO). Instead expand the group weight to
    # channel width (tiny [bs, M, C]) and do broadcast-multiply + reduce —
    # also NOT an einsum, whose (b, m) batch dims force another transpose.
    wg_c = jnp.repeat(wg, C // G, axis=-1).astype(wy.dtype)  # [bs, M, C]
    w4 = (wy[:, :, :, None] * wx[:, :, None, :]).astype(wy.dtype)
    out = (patch * w4[..., None]).sum(axis=(2, 3))  # [bs, M, C]
    return out * wg_c


def _patch_bilinear_w_fwd(feat, cam, sy, sx, wy, wx, wg):
    out = patch_bilinear_w.__wrapped__(feat, cam, sy, sx, wy, wx, wg)
    return out, (feat, cam, sy, sx, wy, wx, wg)


def _patch_bilinear_w_bwd(res, g_out):
    feat, cam, sy, sx, wy, wx, wg = res
    bs, cams, H, W, C = feat.shape
    M = cam.shape[1]
    G = wg.shape[-1]
    gd = C // G
    patch = _patch_gather(feat, cam, sy, sx).astype(g_out.dtype)
    patch = patch.reshape(bs, M, 2, 2, G, gd)
    go = g_out.reshape(bs, M, 1, 1, G, gd)
    pg = (patch * go).sum(axis=-1)  # [bs, M, 2, 2, G]
    g_wy = (pg * wx[:, :, None, :, None] * wg[:, :, None, None, :]).sum(axis=(3, 4))
    g_wx = (pg * wy[:, :, :, None, None] * wg[:, :, None, None, :]).sum(axis=(2, 4))
    g_wg = (pg * wy[:, :, :, None, None] * wx[:, :, None, :, None]).sum(axis=(2, 3))
    # fold the group weight into the cotangent; then d(feat) has the same
    # separable 2-hot structure as patch_bilinear's
    go4 = g_out.reshape(bs, M, G, gd)
    gg = (go4 * wg[..., None]).reshape(bs, M, C)
    g_feat = _fmap_grad(feat, cam, sy, sx, wy, wx, gg)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return g_feat, f0(cam), f0(sy), f0(sx), g_wy, g_wx, g_wg


patch_bilinear_w.defvjp(_patch_bilinear_w_fwd, _patch_bilinear_w_bwd)


def _segment_fmap_grad(feat, cam, sy, sx, wy, wx, g_out):
    """Feature-map gradient via sort + segmented cumsum (exact, static).

    The dense einsum adjoint (:func:`_dense_fmap_grad`) costs
    ``2*M*(cams*H)*(W*C)`` FLOPs — ~44 TFLOP per stage-2 train step across
    12 (layer, level) instances, the single largest cost of training. This
    formulation exploits that each sample's adjoint touches exactly 4 cells:

      1. sort samples by top-left target cell ``(cam*H + sy)*W + sx`` (one
         ``sort_key_val`` of int32 keys + ONE payload row gather);
      2. the four bilinear-corner streams have keys ``cell + {0, 1, W, W+1}``
         — still sorted — so one f32 cumsum over the stacked ``[M, 4, C]``
         corner values gives every segment sum by boundary differencing;
      3. boundary positions come from exact per-cell counts built with two
         one-hot matmuls (f32 accumulation; integers < 2^24 are exact) and
         a cumsum — no scatter anywhere;
      4. ONE ``[NC+1, 4C]`` boundary-row gather + static shifted-slice adds
         place the per-cell corner sums into the image.

    Cumsum cancellation is tamed by mean-centering the corner values and
    adding ``counts * mean`` back per cell. Gradient is exact for any sample
    distribution (no capacity/spill heuristics).

    MEASURED (v5e, tools/microbench_fmapgrad.py, M=170k): despite ~25x fewer
    FLOPs, this loses to the dense einsum — lax.sort of 170k int32 pairs
    costs ~33 ms and the [M, 4C] cumsum ~23 ms on this stack, while the
    einsum runs at ~83% of MXU peak (45 ms for 7.3 TFLOP at level 0).
    Kept as the asymptotically-better path (wins at 2x+ resolution where
    einsum FLOPs quadruple but sort cost is flat) behind ``HIPAD_FMGRAD=
    segment``; the default stays on the einsum.
    """
    bs, cams, H, W, C = feat.shape
    M = cam.shape[1]
    NC = cams * H * W
    LOW = 128
    nb = -(-NC // LOW)

    def one(cam1, sy1, sx1, wy1, wx1, g1):
        cell = (cam1 * H + sy1) * W + sx1  # [M]
        _, sidx = jax.lax.sort_key_val(cell, jnp.arange(M, dtype=jnp.int32))
        pdt = g1.dtype
        payload = jnp.concatenate(
            [g1, wy1.astype(pdt), wx1.astype(pdt)], axis=1)  # [M, C+4]
        ps = jnp.take(payload, sidx, axis=0)
        gs = ps[:, :C].astype(jnp.float32)
        wys = ps[:, C:C + 2].astype(jnp.float32)
        wxs = ps[:, C + 2:].astype(jnp.float32)

        wk = jnp.stack([wys[:, 0] * wxs[:, 0], wys[:, 0] * wxs[:, 1],
                        wys[:, 1] * wxs[:, 0], wys[:, 1] * wxs[:, 1]], axis=1)
        v = wk[:, :, None] * gs[:, None, :]  # [M, 4, C]
        mean = v.mean(axis=0)  # [4, C]
        cs = jnp.concatenate(
            [jnp.zeros((1, 4, C), jnp.float32),
             jnp.cumsum(v - mean[None], axis=0)], axis=0)  # [M+1, 4, C]

        oh_hi = jax.nn.one_hot(cell // LOW, nb, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(cell % LOW, LOW, dtype=jnp.bfloat16)
        counts = jnp.einsum("pb,pl->bl", oh_hi, oh_lo,
                            preferred_element_type=jnp.float32)
        counts = counts.reshape(nb * LOW)[:NC]
        end = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.cumsum(counts)]).astype(jnp.int32)

        G = jnp.take(cs.reshape(M + 1, 4 * C), end, axis=0)  # [NC+1, 4C]
        D = (G[1:] - G[:-1]).reshape(NC, 4, C)
        D = D + counts[:, None, None] * mean[None]

        out = D[:, 0]
        for k, off in ((1, 1), (2, W), (3, W + 1)):
            out = out.at[off:].add(D[:-off, k])
        return out.reshape(cams, H, W, C)

    return jax.vmap(one)(cam, sy, sx, wy, wx, g_out).astype(feat.dtype)


def _fmap_grad(feat, cam, sy, sx, wy, wx, g_out):
    """Feature-map adjoint dispatcher: chunked einsum (default; ~83% of MXU
    peak, measured) or sort+segment (``HIPAD_FMGRAD=segment`` — fewer FLOPs
    but sort/cumsum-bound at stage-2 scale; see _segment_fmap_grad).
    ``HIPAD_FMGRAD=hybrid`` picks per level: segment for the large-H*W
    level 0 (where the dense einsum's 2*M*R*W*C FLOPs are largest and the
    two formulations measured a tie at stage-2 scale, with segment winning
    at 2x res), dense for the smaller levels (where the flat ~33 ms sort
    cost dominates the shrunken einsum)."""
    import os

    mode = os.environ.get("HIPAD_FMGRAD", "")
    if mode == "segment" or (
            mode == "hybrid" and feat.shape[2] * feat.shape[3] >= 10000):
        return _segment_fmap_grad(feat, cam, sy, sx, wy, wx, g_out)
    return _dense_fmap_grad(feat, cam, sy, sx, wy, wx, g_out)


def _dense_fmap_grad(feat, cam, sy, sx, wy, wx, g_out):
    """Feature-map gradient as chunked MXU einsums (see patch_bilinear)."""
    bs, cams, H, W, C = feat.shape
    M = cam.shape[1]
    R = cams * H
    row = cam * H + sy
    P = max(256, _FMGRAD_CHUNK // bs)
    n = -(-M // P)
    pad = n * P - M

    def pad_chunks(a):
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
        a = jnp.pad(a, widths)
        a = a.reshape((bs, n, P) + a.shape[2:])
        return a.swapaxes(0, 1)

    rr = jnp.arange(R)
    cc = jnp.arange(W)
    bf = jnp.float32 if jax.default_backend() == "cpu" else g_out.dtype

    def step(acc, ch):
        row_c, sx_c, wy_c, wx_c, g_c = ch
        w_row = (wy_c[..., 0:1] * (rr == row_c[..., None])
                 + wy_c[..., 1:2] * (rr == row_c[..., None] + 1))
        w_col = (wx_c[..., 0:1] * (cc == sx_c[..., None])
                 + wx_c[..., 1:2] * (cc == sx_c[..., None] + 1))
        v = (w_col[..., None] * g_c[:, :, None, :]).astype(bf)
        return acc + jnp.einsum("bpr,bpwc->brwc", w_row.astype(bf), v,
                                preferred_element_type=jnp.float32), None

    chunks = tuple(pad_chunks(a) for a in (row, sx, wy, wx, g_out))
    acc0 = jnp.zeros((bs, R, W, C), jnp.float32)
    g_acc, _ = jax.lax.scan(step, acc0, chunks)
    return g_acc.reshape(bs, cams, H, W, C).astype(feat.dtype)


def build_fine_comb(feature_maps: Sequence[jnp.ndarray],
                    matmul_levels: Sequence[int]) -> jnp.ndarray:
    """Combined fine (gather-level) pyramid for the ``level_k`` sampler: each
    gather level zero-padded to the largest fine H x W and stacked along the
    camera axis -> ``[bs, n_gl*cams, Hm, Wm, C]``. Build ONCE per forward and
    pass to :func:`deformable_samples_topk_flat` as ``fine_comb``."""
    gl = [l for l in range(len(feature_maps)) if l not in matmul_levels]
    Hm = max(feature_maps[l].shape[2] for l in gl)
    Wm = max(feature_maps[l].shape[3] for l in gl)
    return jnp.concatenate(
        [jnp.pad(feature_maps[l],
                 ((0, 0), (0, 0), (0, Hm - feature_maps[l].shape[2]),
                  (0, Wm - feature_maps[l].shape[3]), (0, 0)))
         for l in gl], axis=1)


def deformable_samples_topk_flat(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,  # [bs, M, cams, 2]
    weights: jnp.ndarray,  # [bs, M, cams, levels, groups]
    cam_k: int = 3,
    matmul_levels: Sequence[int] = (2, 3),
    dense_fmap_grad: bool = True,
    row_packed: bool = False,
    cam_renorm: bool = False,
    level_k: int | None = None,
    level_renorm: bool = True,
    fine_comb: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flat per-sample core of the production sampler: -> [bs, M, C] weighted
    features summed over cameras/levels (the caller reduces over its own
    keypoints-per-anchor structure). Enables fusing several tasks' sampling
    into ONE call by concatenating their flattened samples.

    ``dense_fmap_grad`` routes the gather levels through
    :func:`patch_bilinear`, replacing the scatter feature-map adjoint with
    chunked matmuls (same forward values; see its docstring).

    ``level_k`` (serving-path approximation, config-gated): per compacted
    sample, keep only the ``level_k`` GATHER levels (levels not in
    ``matmul_levels``) with the largest group-weight mass — the softmax over
    (cam, level, pt, group) in the reference (`blocks.py:178-214`) is as
    prunable by level as by camera, and the fine levels carry all the
    gather rows. Implemented as ONE patch gather per kept (sample, level
    slot) from a combined fine pyramid (each gather level zero-padded to
    the largest fine H x W and stacked along the camera axis), so the row
    count drops by ``len(gather_levels) / level_k``. ``level_renorm``
    rescales each kept sample's per-group fine-level mass to the full fine
    mass, the same unbiasing as ``cam_renorm``. Exact whenever the dropped
    levels carry zero weight. Only the dense-fmap-grad patch path supports
    it (``row_packed`` and the oracle path ignore it). ``fine_comb`` lets
    the caller pass the combined pyramid built ONCE per forward
    (:func:`build_fine_comb`) instead of relying on XLA to CSE the
    pad+concat across the up-to-24 per-task-per-layer call sites."""
    bs, M0, num_cams, _ = points_2d.shape
    num_levels = len(feature_maps)
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    group_dims = channels // groups
    cam_k = min(cam_k, num_cams)

    inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)  # [b,M0,c]
    # rank cameras by in-bounds-ness (ties -> lowest camera index)
    cam_idx = topk_by_argmax(inside.astype(jnp.float32), cam_k)  # [b, M0, k]

    # Camera selection via one-hot einsums, NOT take_along_axis: the VJP of a
    # gather is a scatter, and XLA:TPU scatters cost ~10 us per row — one
    # backward pass through a take_along_axis compaction here measured ~1.5 s.
    # The one-hot contraction's backward is another dense einsum (~us).
    sel = jax.nn.one_hot(cam_idx, num_cams, dtype=weights.dtype)  # [b,M0,k,c]
    pts = jnp.einsum("bmkc,bmcd->bmkd", sel.astype(points_2d.dtype), points_2d)
    ins = jnp.einsum("bmkc,bmc->bmk", sel, inside.astype(weights.dtype))
    wts = jnp.einsum("bmkc,bmclg->bmklg", sel, weights)

    M = M0 * cam_k
    x = pts[..., 0].reshape(bs, M)
    y = pts[..., 1].reshape(bs, M)
    cam = cam_idx.reshape(bs, M).astype(jnp.int32)
    w = wts * ins[..., None, None]  # [b, M0, k, L, G]
    if cam_renorm and cam_k < num_cams:
        # Renormalise the kept cameras' weights so their (level, group) mass
        # equals the full in-bounds mass: exact no-op whenever <= cam_k
        # cameras see the point (the rig's everywhere-but-near-field case);
        # for triple-overlap near-field points this replaces the dropped
        # camera's softmax share instead of silently losing it (the
        # reference sums all in-bounds cameras, `blocks.py:178-214`).
        # Elementwise multiply + axis-reduce, NOT an einsum: the einsum's
        # batch-dim convention forced a full-weights relayout copy
        # (~0.5 ms per task-layer, seen in the device trace).
        full = (weights * inside[..., None, None].astype(weights.dtype)
                ).sum(axis=2)  # [b, M0, L, G]
        kept = w.sum(axis=2)  # [b, M0, L, G]
        ratio = full / jnp.maximum(kept, 1e-9)
        w = w * ratio[:, :, None]
    w = w.reshape(bs, M, num_levels, groups)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    two = jnp.arange(2, dtype=points_2d.dtype)
    out = jnp.zeros((bs, M0, channels), dtype=weights.dtype)

    gather_levels = [l for l in range(num_levels)
                     if l not in matmul_levels and l < num_levels]
    use_level_k = (level_k is not None and 0 < level_k < len(gather_levels)
                   and dense_fmap_grad and not row_packed)
    if use_level_k:
        n_gl = len(gather_levels)
        # per-sample in-bounds group-weight mass per gather level (w already
        # carries the inside mask and any cam renormalisation)
        w_gl = w[:, :, gather_levels, :]  # [bs, M, n_gl, G]
        mass = w_gl.sum(-1).astype(jnp.float32)
        lidx = topk_by_argmax(mass, level_k)  # [bs, M, k]
        sel = jax.nn.one_hot(lidx, n_gl, dtype=weights.dtype)  # [bs,M,k,n_gl]
        if level_renorm:
            full = w_gl.sum(axis=2)  # [bs, M, G]
            kept = jnp.einsum("bmkl,bmlg->bmg", sel, w_gl)
            ratio = full / jnp.maximum(kept, 1e-9)  # [bs, M, G]
        # Combined fine pyramid: pad every gather level to the largest fine
        # H x W, stack along cams -> [bs, n_gl*cams, Hm, Wm, C]. Patch starts
        # are clipped to each level's TRUE dims so the zero pad is never
        # addressed. Built once per forward by the decoder (build_fine_comb)
        # and passed in; the in-place build exists for standalone callers.
        comb = (fine_comb if fine_comb is not None
                else build_fine_comb(feature_maps, matmul_levels))
        # per-gather-level continuous pixel coords + clip caps, selected
        # per sample by the chosen level (one-hot over n_gl: cheap VPU)
        pxs = jnp.stack([x * feature_maps[l].shape[3] - 0.5
                         for l in gather_levels], axis=-1)  # [bs, M, n_gl]
        pys = jnp.stack([y * feature_maps[l].shape[2] - 0.5
                         for l in gather_levels], axis=-1)
        ycap = jnp.asarray([feature_maps[l].shape[2] - 2
                            for l in gather_levels], pys.dtype)
        xcap = jnp.asarray([feature_maps[l].shape[3] - 2
                            for l in gather_levels], pxs.dtype)
        for j in range(level_k):
            sj = sel[:, :, j]  # [bs, M, n_gl]
            sjc = sj.astype(pxs.dtype)
            px = (pxs * sjc).sum(-1)
            py = (pys * sjc).sum(-1)
            sy = jnp.clip(jnp.floor(py), 0, (ycap * sjc).sum(-1)
                          ).astype(jnp.int32)
            sx = jnp.clip(jnp.floor(px), 0, (xcap * sjc).sum(-1)
                          ).astype(jnp.int32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                py[..., None] - (sy[..., None] + two)))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                px[..., None] - (sx[..., None] + two)))
            wsel = jnp.einsum("bml,bmlg->bmg", sj, w_gl)  # [bs, M, G]
            if level_renorm:
                wsel = wsel * ratio
            camj = lidx[:, :, j].astype(jnp.int32) * num_cams + cam
            sampled = patch_bilinear_w(
                comb, camj, sy, sx,
                wy.astype(weights.dtype), wx.astype(weights.dtype), wsel)
            contrib = sampled.reshape(bs, M0, cam_k, channels)
            out = out + contrib.sum(axis=2).astype(out.dtype)

    # Coarse levels: dense per-camera MXU sampling on the UNcompacted samples
    # (compaction scrambles the camera blocks the interp operand needs; at
    # these HW the matmul is cheap enough to keep all cameras).
    Bfull = bs * num_cams
    if matmul_levels:
        xf = jnp.transpose(points_2d[..., 0], (0, 2, 1)).reshape(Bfull, M0)
        yf = jnp.transpose(points_2d[..., 1], (0, 2, 1)).reshape(Bfull, M0)
        insf = jnp.transpose(inside, (0, 2, 1)).reshape(Bfull, M0)
        wf = jnp.transpose(weights, (0, 2, 1, 3, 4)).reshape(
            Bfull, M0, num_levels, groups
        ) * insf[..., None, None]

    for lvl in range(num_levels):
        feat = feature_maps[lvl]  # [bs, cams, H, W, C]
        h_l, w_l = feat.shape[2], feat.shape[3]

        if use_level_k and lvl in gather_levels:
            continue  # handled by the combined-pyramid level-k path above

        if lvl in matmul_levels:
            fm = feat.reshape(Bfull, h_l, w_l, channels)
            contrib = interp_matmul_camsum(
                fm, xf * w_l - 0.5, yf * h_l - 0.5, wf[:, :, lvl], groups,
                bs, num_cams)  # [bs, M0, C]
            out = out + contrib.astype(out.dtype)
            continue

        px = x * w_l - 0.5
        py = y * h_l - 0.5
        sy = jnp.clip(jnp.floor(py), 0, h_l - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(px), 0, w_l - 2).astype(jnp.int32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - (sy[..., None] + two)))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - (sx[..., None] + two)))

        if row_packed:
            # one 4C-row gather per sample (see build_packed_level); same
            # dense matmul feature-map adjoint as patch_bilinear
            packed = build_packed_level(feat)
            sampled = packed_row_bilinear(
                feat, packed, cam, sy, sx,
                wy.astype(weights.dtype), wx.astype(weights.dtype),
            )  # [bs, M, C]
            contrib = (sampled.reshape(bs, M, groups, group_dims)
                       * w[:, :, lvl][..., None])
            contrib = contrib.reshape(bs, M0, cam_k, channels)
            out = out + contrib.sum(axis=2).astype(out.dtype)
            continue

        if dense_fmap_grad:
            sampled = patch_bilinear_w(
                feat, cam, sy, sx,
                wy.astype(weights.dtype), wx.astype(weights.dtype),
                w[:, :, lvl],
            )  # [bs, M, C], group weights folded into the gather consumer
            contrib = sampled.reshape(bs, M0, cam_k, channels)
            out = out + contrib.sum(axis=2).astype(out.dtype)
            continue

        def g(f, ic, iy, ix):
            starts = jnp.stack([ic, iy, ix], axis=-1)  # [M, 3]
            return jax.lax.gather(
                f, starts, dn, slice_sizes=(1, 2, 2, channels),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )

        patch = jax.vmap(g)(feat, cam, sy, sx)  # [bs, M, 2, 2, C]
        wg_c = jnp.repeat(w[:, :, lvl], group_dims, axis=-1)  # [bs, M, C]
        w4 = (wy[:, :, :, None] * wx[:, :, None, :]).astype(weights.dtype)
        contrib = (patch.astype(weights.dtype) * w4[..., None]).sum(axis=(2, 3))
        contrib = (contrib * wg_c).reshape(bs, M0, cam_k, channels)
        out = out + contrib.sum(axis=2).astype(out.dtype)
    return out


def deformable_aggregation_topk(
    feature_maps: Sequence[jnp.ndarray],
    points_2d: jnp.ndarray,
    weights: jnp.ndarray,
    cam_k: int = 3,
    matmul_levels: Sequence[int] = (2, 3),
    dense_fmap_grad: bool = True,
    row_packed: bool = False,
    cam_renorm: bool = False,
    point_k: int | None = None,
    point_renorm: bool = True,
    level_k: int | None = None,
    level_renorm: bool = True,
    fine_comb: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Camera-compacted hybrid sampler — the production TPU path.

    Three latency-law optimizations over the reference formulation, all
    preserving its semantics:

      1. **camera top-k compaction**: every 3D keypoint projects inside at
         most ~2 of the 6 cameras (70-110 deg FOVs); the reference gathers
         from all 6 and multiplies 4-5 of them by zero. Keeping the ``cam_k``
         cameras ranked by in-bounds-ness drops 2x of the gather rows. Exact
         whenever <= cam_k cameras see the point (k=3 covers the rig's
         worst-case double overlap + near-field parallax margin).
      2. **patch gathers**: one (2,2,C) slice per (sample, level) instead of
         4 row gathers (XLA:TPU gathers cost ~17 ns per *row* regardless of
         width; a patch costs ~3 rows, not 4).
      3. **MXU sampling for coarse levels** (`matmul_levels`): when H*W is
         small the bilinear interp operator fits a dense [M, HW] bf16 operand
         and one matmul replaces the gathers outright.

    Returns [bs, anchors, C], same as :func:`deformable_aggregation`.
    """
    bs, num_anchor, num_pts, num_cams, _ = points_2d.shape
    if point_k is not None and point_k < num_pts:
        # Keypoint top-k (serving-path approximation, config-gated): most of
        # a query's keypoints carry near-zero softmax weight once trained
        # (the softmax normalises over cams x levels x pts per group,
        # `blocks.py:196-208`), so rank each anchor's points by their total
        # in-bounds weight mass and keep the best `point_k` — the sample
        # count (and the gather/interp cost) drops by num_pts/point_k.
        # `point_renorm` rescales the kept points' per-group mass to the
        # full in-bounds mass, unbiasing the truncation the same way
        # `cam_renorm` does for cameras.
        inside = jnp.all((points_2d > 0.0) & (points_2d < 1.0), axis=-1)
        wm = weights * inside[..., None, None].astype(weights.dtype)
        imp = wm.sum(axis=(-3, -2, -1))  # [bs, A, P]
        pidx = topk_by_argmax(imp.astype(jnp.float32), point_k)  # [bs, A, kp]
        sel = jax.nn.one_hot(pidx, num_pts, dtype=weights.dtype)
        points_2d = jnp.einsum(
            "bakp,bapcd->bakcd", sel.astype(points_2d.dtype), points_2d)
        new_w = jnp.einsum("bakp,bapclg->bakclg", sel, weights)
        if point_renorm:
            full = wm.sum(axis=2)  # [bs, A, cams, L, G]: mass over all pts
            kept = jnp.einsum("bakp,bapclg->baclg", sel, wm)
            ratio = full / jnp.maximum(kept, 1e-9)
            new_w = new_w * ratio[:, :, None]
        weights = new_w
        num_pts = point_k
    flat = deformable_samples_topk_flat(
        feature_maps,
        points_2d.reshape(bs, num_anchor * num_pts, num_cams, 2),
        weights.reshape(bs, num_anchor * num_pts, num_cams,
                        weights.shape[-2], weights.shape[-1]),
        cam_k=cam_k, matmul_levels=matmul_levels,
        dense_fmap_grad=dense_fmap_grad, row_packed=row_packed,
        cam_renorm=cam_renorm, level_k=level_k, level_renorm=level_renorm,
        fine_comb=fine_comb,
    )
    return flat.reshape(bs, num_anchor, num_pts, -1).sum(axis=2)


def front_view_feature(feature_maps: List[jnp.ndarray], level: int = -1, cam: int = 0) -> jnp.ndarray:
    """Grab one camera's map at one pyramid level: ``[bs, H, W, C]``.

    Replaces the reference's ``feature_maps_format(inverse=True)`` round-trip
    used by the ego/plan instance banks (`ops/__init__.py:34-65`,
    `models/ego/instance_bank.py:122-134`).
    """
    return feature_maps[level][:, cam]
