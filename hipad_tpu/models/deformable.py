"""Deformable feature aggregation orchestrator (`models/blocks.py:45-264`).

keypoints -> camera projection -> camera-conditioned softmax weights ->
multi-view multi-scale bilinear sampling -> output projection with "cat"
residual (doubling the width, later squeezed by the AsymmetricFFN).

Split into ``prepare`` (keypoints + weights + projection) and ``finish``
(output projection + residual) so the decoder can FUSE the sampling of all
four tasks into one `deformable_samples_topk_flat` call per layer — each
sampler invocation carries several ms of fixed cost on TPU, so batching the
det/map/plan/ego samples together amortizes it 4x.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import project_points
from ..ops.sampling import (deformable_aggregation,
                            deformable_aggregation_topk, topk_by_argmax)
from .common import MLPLN
from .keypoints import BoxKeypoints, PointKeypoints


class DeformableAggregation(nn.Module):
    embed_dims: int
    num_groups: int
    num_levels: int
    num_cams: int
    kps: Union[BoxKeypoints, PointKeypoints]  # submodule (passed constructed)
    attn_drop: float = 0.15
    residual_mode: str = "cat"
    sampler: str = "topk"
    sampler_cam_k: int = 3
    sampler_cam_renorm: bool = False
    sampler_matmul_levels: tuple = (2, 3)
    sampler_row_packed: bool = False
    # keep ceil(frac * num_pts) keypoints per query by weight mass
    # (1.0 = exact reference semantics; see ops/sampling.py point_k)
    sampler_point_frac: float = 1.0
    # keep the top `level_k` fine (gather) levels per sample by weight mass
    # (None = exact; see ops/sampling.py level_k)
    sampler_level_k: Optional[int] = None
    sampler_level_renorm: bool = True
    # When > 0, `anchor_embed` is a per-sample-point embedding
    # [bs, n * use_points_embed, C] and the weights head consumes the
    # points-expanded feature (`blocks.py:178-189`, use_points_embed path).
    # The reference block-repeats the instance feature against anchor-major
    # point embeds (`blocks.py:181` `repeat(1, num_sample, 1)`), scrambling
    # the (anchor, point) pairing; here the tile is interleaved so feature i
    # pairs with its own anchor's points.
    use_points_embed: int = 0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.camera_encoder = MLPLN(self.embed_dims, 1, 2, dtype=self.dtype,
                                    name="camera_encoder")
        # weights_fc is zero-init so initial weights are uniform post-softmax
        # (`blocks.py:120-122`, constant_init(weights_fc, 0)).
        self.weights_fc = nn.Dense(
            self.num_groups * self.num_levels * self.kps.num_pts,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="weights_fc",
        )
        self.output_proj = nn.Dense(self.embed_dims, dtype=self.dtype,
                                    name="output_proj")

    def prepare(
        self,
        instance_feature: jnp.ndarray,  # [bs, n, C]
        anchor: jnp.ndarray,
        anchor_embed: jnp.ndarray,
        projection_mat: jnp.ndarray,  # [bs, cams, 4, 4]
        image_wh: jnp.ndarray,  # [bs, cams, 2]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (points_2d [bs, n, P, cams, 2], weights [bs, n, P, cams, L, G])."""
        bs, n = instance_feature.shape[:2]
        # The reference invokes the generator positionally as
        # ``kps_generator(anchor, anchor_embed, instance_feature)``
        # (`blocks.py:134`). The Box3D generator's signature is
        # ``(anchor, instance_feature=None, ...)`` (det/blocks.py:183-188),
        # so its learnable offsets are a function of the ANCHOR EMBED; the
        # Point3D generator binds both names and — with the shipped
        # ``with_anchor_embed=False`` — reads the true instance feature
        # (map/blocks.py:173-204). Match that per generator type so a
        # converted checkpoint drives the same offsets.
        kps_in = anchor_embed if isinstance(self.kps, BoxKeypoints) else instance_feature
        key_points = self.kps(anchor, kps_in)  # [bs, n, P, 3]
        num_pts = key_points.shape[2]

        # camera-conditioned sampling weights (`blocks.py:178-214`)
        cam_embed = self.camera_encoder(
            projection_mat[:, :, :3, :].reshape(bs, self.num_cams, 12)
        )
        if self.use_points_embed:
            # per-point embeds: [bs, n*S, C]; interleaved tile (see field doc)
            S = self.use_points_embed
            tiled = jnp.repeat(instance_feature, S, axis=1)
            pf = (tiled + anchor_embed)[:, :, None] + cam_embed[:, None]
            pf = pf.reshape(bs, n, S, self.num_cams, -1)
            feat = jnp.swapaxes(pf, 2, 3).reshape(bs, n, self.num_cams, -1)
        else:
            feat = (instance_feature + anchor_embed)[:, :, None] + cam_embed[:, None]
        w = self.weights_fc(feat)  # [bs, n, cams, G*L*P]
        w = w.reshape(bs, n, self.num_cams * self.num_levels * num_pts, self.num_groups)
        w = jax.nn.softmax(w, axis=-2)
        w = w.reshape(bs, n, self.num_cams, self.num_levels, num_pts, self.num_groups)

        if self.attn_drop > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = (
                jax.random.uniform(rng, (bs, n, self.num_cams, 1, num_pts, 1))
                > self.attn_drop
            )
            w = w * keep / (1.0 - self.attn_drop)

        pts_cam = project_points(key_points, projection_mat, image_wh)
        # [bs, cams, n, P, 2]

        if self.sampler_point_frac < 1.0:
            # Early keypoint top-k (see ops/sampling.py point_k docs): prune
            # HERE, before the [.., P, cams, L, G] transpose, so every
            # downstream tensor (transposes, compaction, gathers, interp
            # operands — including the fused path's concats) shrinks by
            # P/kp. Importance = total in-bounds weight mass per (anchor,
            # point); truncated mass renormalised onto the kept points.
            kp = max(1, int(-(-num_pts * self.sampler_point_frac // 1)))
            inside = jnp.all((pts_cam > 0.0) & (pts_cam < 1.0), axis=-1)
            insw = jnp.transpose(inside, (0, 2, 1, 3))  # [bs, n, cams, P]
            wm = w * insw[:, :, :, None, :, None].astype(w.dtype)
            imp = wm.sum(axis=(2, 3, 5)).astype(jnp.float32)  # [bs, n, P]
            # NOT lax.top_k (variadic sort: ~8 ms/call at stage-2 scale and
            # faulted the TPU worker at bs=2 — see topk_by_argmax docstring)
            pidx = topk_by_argmax(imp, kp)  # [bs, n, kp]
            sel = jax.nn.one_hot(pidx, num_pts, dtype=w.dtype)  # [bs,n,kp,P]
            full = wm.sum(axis=4)  # [bs, n, cams, L, G]
            kept = jnp.einsum("bnkp,bnclpg->bnclg", sel, wm)
            ratio = full / jnp.maximum(kept, 1e-9)
            w = jnp.einsum("bnkp,bnclpg->bnkclg", sel, w) * ratio[:, :, None]
            pts_sel = jnp.einsum(
                "bnkp,bcnpd->bnkcd", sel.astype(pts_cam.dtype), pts_cam)
            return pts_sel, w  # [bs,n,kp,cams,2], [bs,n,kp,cams,L,G]

        w = jnp.transpose(w, (0, 1, 4, 2, 3, 5))  # [bs, n, P, cams, L, G]
        pts2d = jnp.transpose(pts_cam, (0, 2, 3, 1, 4))  # [bs, n, P, cams, 2]
        return pts2d, w

    def finish(self, features: jnp.ndarray, instance_feature: jnp.ndarray):
        out = self.output_proj(features)
        if self.residual_mode == "add":
            return out + instance_feature
        return jnp.concatenate([out, instance_feature], axis=-1)

    def __call__(
        self,
        instance_feature: jnp.ndarray,
        anchor: jnp.ndarray,
        anchor_embed: jnp.ndarray,
        feature_maps: Sequence[jnp.ndarray],
        projection_mat: jnp.ndarray,
        image_wh: jnp.ndarray,
        deterministic: bool = True,
        fine_comb: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        pts2d, w = self.prepare(instance_feature, anchor, anchor_embed,
                                projection_mat, image_wh, deterministic)
        if self.sampler == "zero":
            # debug/ablation mode: full prepare cost, no sampling — isolates
            # the sampler's share of the frame in end-to-end benchmarks
            features = jnp.zeros(
                instance_feature.shape[:2] + (self.embed_dims,),
                w.dtype) + 0.0 * (w.sum() + pts2d.sum().astype(w.dtype))
        elif self.sampler == "topk":
            # keypoint pruning already happened inside prepare (early, so
            # the fused path and all intermediates shrink too)
            features = deformable_aggregation_topk(
                feature_maps, pts2d, w,
                cam_k=self.sampler_cam_k,
                matmul_levels=self.sampler_matmul_levels,
                row_packed=self.sampler_row_packed,
                cam_renorm=self.sampler_cam_renorm,
                level_k=self.sampler_level_k,
                level_renorm=self.sampler_level_renorm,
                fine_comb=fine_comb,
            )
        else:
            features = deformable_aggregation(feature_maps, pts2d, w)
        return self.finish(features, instance_feature)
