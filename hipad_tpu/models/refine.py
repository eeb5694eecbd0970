"""Per-task refinement / prediction heads."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs.model import HiPADConfig
from ..core.box3d import COS_YAW, H, L, SIN_YAW, VX, W, X, Y, Z
from .common import MLP, MLPLN, Scale, cls_bias_init


def _cls_head(embed_dims, num_cls, dtype, name):
    """MLPLN(1,2) + Dense with focal-style bias init."""
    bias = cls_bias_init()

    def bias_init(key, shape, dtype_=jnp.float32):
        return jnp.full(shape, bias, dtype_)

    class ClsHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = MLPLN(embed_dims, 1, 2, dtype=dtype, name="mlp")(x)
            return nn.Dense(num_cls, dtype=dtype, bias_init=bias_init, name="out")(x)

    return ClsHead(name=name)


class SparseBox3DRefinement(nn.Module):
    """Anchor delta + classification + quality (`models/det/blocks.py:77-156`)."""

    cfg: HiPADConfig
    num_cls: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        instance_feature: jnp.ndarray,
        anchor: jnp.ndarray,
        anchor_embed: jnp.ndarray,
        time_interval: jnp.ndarray,
        return_cls: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        d = self.cfg.embed_dims
        feature = instance_feature + anchor_embed
        out = MLPLN(d, 2, 2, dtype=self.dtype, name="reg_mlp")(feature)
        out = nn.Dense(11, dtype=self.dtype, name="reg_out")(out)
        out = Scale(11, name="reg_scale")(out)

        refine_idx = jnp.asarray([X, Y, Z, W, L, H, SIN_YAW, COS_YAW])
        delta_state = out[..., :8] + anchor[..., :8]
        # velocity: predicted translation / dt + previous velocity
        vel = out[..., VX:] / time_interval[:, None, None] + anchor[..., VX:]
        del refine_idx
        output = jnp.concatenate([delta_state, vel], axis=-1)

        cls = quality = None
        if return_cls:
            cls = _cls_head(d, self.num_cls, self.dtype, "cls")(instance_feature)
            q = MLPLN(d, 1, 2, dtype=self.dtype, name="quality_mlp")(feature)
            quality = nn.Dense(2, dtype=self.dtype, name="quality_out")(q)
        return output, cls, quality


class SparsePoint3DRefinement(nn.Module):
    """Polyline delta + classification (`models/map/blocks.py:80-135`)."""

    cfg: HiPADConfig
    num_cls: int
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, instance_feature, anchor, anchor_embed, return_cls: bool = True):
        d = self.cfg.embed_dims
        out = MLPLN(d, 2, 2, dtype=self.dtype, name="reg_mlp")(instance_feature + anchor_embed)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="reg_out")(out)
        out = Scale(self.out_dim, name="reg_scale")(out)
        output = out + anchor
        cls = _cls_head(d, self.num_cls, self.dtype, "cls")(instance_feature) if return_cls else None
        return output, cls, None


class EgoStatusRefinement(nn.Module):
    """Ego-status MLP head (`models/ego/blocks.py:60-75`)."""

    cfg: HiPADConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ego_feature, ego_anchor_embed):
        d = self.cfg.embed_dims
        return MLP((d, d, self.cfg.ego_status_dims), dtype=self.dtype, name="status")(
            ego_feature + ego_anchor_embed
        )


class SparseMotionRefinement(nn.Module):
    """Per-agent multi-mode trajectory head (`models/motion/blocks.py:16-50`)."""

    cfg: HiPADConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, motion_query):
        c = self.cfg
        bs, n = motion_query.shape[:2]
        cls = _cls_head(c.embed_dims, 1, self.dtype, "cls")(motion_query).squeeze(-1)
        reg = MLP((c.embed_dims, c.embed_dims, c.fut_ts * 2), dtype=self.dtype, name="reg")(
            motion_query
        )
        return cls, reg.reshape(bs, n, c.fut_mode, c.fut_ts, 2)


class SparsePlanAlignRefinement(nn.Module):
    """Multi-granularity planning head (`models/plan/blocks.py:53-158`).

    The query tensor holds ``anchor_group`` blocks of cmd*mode queries. All
    temp/spat blocks are summed into one ``align_query``; each speed bucket's
    query (summed across frequencies) is added on top of align_query. Each
    anchor type owns its reg branch; temp/spat share one cls branch, speed
    types share another.
    """

    cfg: HiPADConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, instance_feature, anchor, anchor_embed):
        c = self.cfg
        d = c.embed_dims
        types = c.plan_anchor_types
        bs = instance_feature.shape[0]

        # With with_topk_mode the per-group mode count shrinks below
        # cmd*ego_fut_mode after pruned layers — derive it from the query
        # tensor so the block slicing follows (`plan/blocks.py:110`).
        per = instance_feature.shape[1] // len(types)

        x = instance_feature + anchor_embed
        blocks = [x[:, i * per : (i + 1) * per] for i in range(len(types))]

        speed_areas = list(c.speed_areas)
        align_query = None
        speed_by_freq: dict = {}
        for t, blk in zip(types, blocks):
            if t[0] in ("temp", "spat"):
                align_query = blk if align_query is None else align_query + blk
            else:
                speed_by_freq.setdefault(t[1], [None] * len(speed_areas))
                speed_by_freq[t[1]][speed_areas.index(t[2])] = blk

        speed_query = {}
        if speed_by_freq:
            for si in range(len(speed_areas)):
                q = sum(v[si] for v in speed_by_freq.values())
                speed_query[si] = align_query + q

        cls_branch = _cls_head(d, 1, self.dtype, "cls")
        cls_speed = _cls_head(d, 1, self.dtype, "cls_speed") if speed_by_freq else None

        # One reg branch per (kind, unit) — speed buckets of the same
        # frequency share a branch, mirroring the reference's name-keyed
        # ``setattr`` ("plan_reg_branch_{kind}_{unit}", plan/blocks.py:91-97).
        reg_branches = {}
        for t in types:
            key = f"reg_{t[0]}_{t[1]}"
            if key not in reg_branches:
                reg_branches[key] = (
                    MLPLN(d, 2, 2, dtype=self.dtype, name=key + "_mlp"),
                    nn.Dense(c.ego_fut_ts * 2, dtype=self.dtype, name=key + "_out"),
                    Scale(c.ego_fut_ts * 2, name=key + "_scale"),
                )

        cls_outs, reg_outs = [], []
        for t in types:
            if t[0] in ("temp", "spat"):
                q = align_query
                cls_out = cls_branch(q)
            else:
                q = speed_query[speed_areas.index(t[2])]
                cls_out = cls_speed(q)
            mlp, dense, scale = reg_branches[f"reg_{t[0]}_{t[1]}"]
            r = scale(dense(mlp(q)))
            cls_outs.append(cls_out)
            reg_outs.append(r)

        cls_outputs = jnp.concatenate(cls_outs, axis=1)
        reg_outputs = jnp.concatenate(reg_outs, axis=1) + anchor
        return reg_outputs, cls_outputs
