"""Unified sparse decoder over the concatenated multi-task query set.

TPU-native rework of the reference ``SparseOneDecoder``
(`models/sparse_onedecoder.py:35-1092`):

  * the decoder *program* is data — ``cfg.operation_order`` is a flat tuple of
    op names (concat / temp_gnn / gnn / inter_gnn / norm / split / deformable /
    ffn / refine) executed by a Python loop that unrolls at trace time into a
    single XLA graph;
  * every query budget is static, so the per-modality slice boundaries are
    compile-time constants (no dynamic shapes anywhere);
  * temporal instance banks are explicit pytree state
    (``instance_bank.BankStates``) passed in and returned, not module
    attributes; the first frame is the *static* case ``bank_states=None``.

Returns (outputs, new_bank_states) where outputs carries per-layer
classification / regression stacks for every task head.

Serving-only structural pruning knobs (both OFF in ``stage2``/``stage2_serving``):

  * ``with_topk_mode`` — the reference's own per-layer plan-mode pruning
    (`sparse_onedecoder.py:982-1007`), see the refine op;
  * ``with_topk_det`` — det-query pruning with no reference counterpart:
    after refine layer i keep the first ``topk_det_list[i]`` det queries,
    split proportionally across the two confidence-sorted bank segments
    (temporal / fresh) as STATIC prefix slices — no top-k, no gathers, no
    permutations, and every bank slot-alignment invariant survives. Dropped
    queries freeze at their drop-layer state; the per-layer output stacks
    and the end-of-frame bank/tracker interfaces are re-spliced from the
    frozen tails so downstream consumers see a full-width query set whose
    dropped members simply stopped improving (cfg docstring has the full
    design rationale).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs.model import HiPADConfig
from ..core.geometry import agent_to_lidar_trajs, sine_embed_2d
from ..ops.sampling import front_view_feature
from . import instance_bank as banks
from .attention_blocks import GroupedCrossAttention, cross_attention_groups, self_attention_groups
from .common import MLP, MLPLN, AsymmetricFFN
from .deformable import DeformableAggregation
from .encoders import SparseBox3DEncoder, SparsePoint3DEncoder
from .keypoints import BoxKeypoints, PointKeypoints
from .refine import (
    EgoStatusRefinement,
    SparseBox3DRefinement,
    SparseMotionRefinement,
    SparsePlanAlignRefinement,
    SparsePoint3DRefinement,
)


class FrontViewEncoder(nn.Module):
    """Front-camera global feature (`models/ego/instance_bank.py:68-75`):
    conv3x3/1-BN-conv3x3/2-BN-ReLU-AvgPool over the stride-32 front view."""

    embed_dims: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fmap: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        x = nn.Conv(self.embed_dims, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(fmap)
        x = bn("bn1")(x)
        x = nn.Conv(self.embed_dims, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        # The reference pools with kernel = feature_map_scale // 2 computed
        # from the PRE-conv stride-32 dims (ego/instance_bank.py:45,74 with
        # config feature_map_scale=(H/32, W/32), i.e. (11, 20) for the
        # 640x352 input) and squeezes the resulting
        # 1x1 map — for odd dims the torch AvgPool's single window DROPS the
        # trailing row/col (e.g. stage-2: kernel (5,10) over the 6x10
        # post-conv map averages rows 0..4 only). Take the identical first
        # window.
        kh = max(1, min(x.shape[1], fmap.shape[1] // 2))
        kw = max(1, min(x.shape[2], fmap.shape[2] // 2))
        return jnp.mean(x[:, :kh, :kw, :], axis=(1, 2))  # [bs, C]


class SparseOneDecoder(nn.Module):
    cfg: HiPADConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        feature_maps: Sequence[jnp.ndarray],
        metas: Dict[str, jnp.ndarray],
        bank_states: Optional[banks.BankStates] = None,
        train: bool = False,
    ):
        cfg = self.cfg
        C = cfg.embed_dims
        det = not train  # deterministic flag for dropout
        bs = feature_maps[0].shape[0]
        has_temp = bank_states is not None
        qs = cfg.query_select

        # Combined fine pyramid for the level-k sampler, built ONCE per
        # forward and threaded to every deformable op (the pad+concat must
        # not be re-materialised per task-layer call site).
        fine_comb = None
        if cfg.sampler == "topk" and cfg.sampler_level_k is not None:
            from ..ops.sampling import build_fine_comb

            fine_comb = build_fine_comb(feature_maps,
                                        cfg.sampler_matmul_levels)

        # ============== bank parameters =================================
        det_anchor_p = self.param("det_anchor", lambda k: jnp.asarray(cfg.det_anchor, jnp.float32))
        det_feat_p = self.param("det_feature", nn.initializers.zeros, (cfg.num_det_anchor, C))
        map_anchor_p = self.param("map_anchor", lambda k: jnp.asarray(cfg.map_anchor, jnp.float32))
        map_feat_p = self.param("map_feature", nn.initializers.xavier_uniform(), (cfg.num_map_anchor, C))
        plan_anchor_p = self.param("plan_anchor", lambda k: jnp.asarray(cfg.plan_anchor, jnp.float32))
        ego_anchor_c = jnp.asarray(cfg.ego_anchor_init, jnp.float32)
        motion_anchor_c = jnp.asarray(cfg.motion_anchor, jnp.float32)

        # ============== shared submodules ===============================
        # Sub-embedding widths (pos/size/yaw/vel) scale with embed_dims;
        # (128, 32, 32, 64) at C=256 as in stage2 config:202-210.
        det_enc = SparseBox3DEncoder(
            embed_dims=(C // 2, C // 8, C // 8, C // 4),
            dtype=self.dtype, name="det_anchor_encoder",
        )
        # Point-expansion options (`sparse_onedecoder.py:145-148`): when any
        # map/plan per-point option is on, that task's anchor encoder is the
        # per-point KeyPoint3DEncoder (`map/blocks.py:45-77`) producing both
        # the instance embed and a per-sample-point embed. ``enc_map`` /
        # ``enc_plan`` always return ``(instance_embed, points_embed_or_None)``.
        map_points = cfg.with_concat_map_points or cfg.with_deform_map_points
        plan_points = cfg.with_concat_plan_points or cfg.with_deform_plan_points
        from .encoders import KeyPoint3DEncoder

        if map_points:
            _map_enc = KeyPoint3DEncoder(C, num_sample=cfg.map_num_pts,
                                         dtype=self.dtype,
                                         name="map_anchor_encoder")
            enc_map = _map_enc
        else:
            _map_enc = SparsePoint3DEncoder(C, dtype=self.dtype,
                                            name="map_anchor_encoder")
            enc_map = lambda a: (_map_enc(a), None)
        if plan_points:
            _plan_enc = KeyPoint3DEncoder(C, num_sample=cfg.ego_fut_ts,
                                          dtype=self.dtype,
                                          name="plan_anchor_encoder")
            enc_plan = _plan_enc
        else:
            _plan_enc = SparsePoint3DEncoder(C, dtype=self.dtype,
                                             name="plan_anchor_encoder")
            enc_plan = lambda a: (_plan_enc(a), None)
        map_enc = lambda a: enc_map(a)[0]
        plan_enc = lambda a: enc_plan(a)[0]
        ego_fv = FrontViewEncoder(C, dtype=self.dtype, name="ego_feature_encoder")
        plan_fv = FrontViewEncoder(C, dtype=self.dtype, name="plan_feature_encoder")
        fc_before = nn.Dense(C * 2, use_bias=False, dtype=self.dtype, name="fc_before")
        fc_after = nn.Dense(C, use_bias=False, dtype=self.dtype, name="fc_after")

        timestamp = metas["timestamp"]
        projection_mat = metas["projection_mat"]
        image_wh = metas["image_wh"]

        # ============== query init (banks .get) =========================
        feat: Dict[str, jnp.ndarray] = {}
        anchor: Dict[str, jnp.ndarray] = {}
        embed: Dict[str, jnp.ndarray] = {}
        tfeat: Dict[str, Optional[jnp.ndarray]] = {}
        tembed: Dict[str, Optional[jnp.ndarray]] = {}

        # det
        feat["det"] = jnp.tile(det_feat_p[None], (bs, 1, 1))
        if not cfg.det_feat_grad:
            feat["det"] = jax.lax.stop_gradient(feat["det"])
        anchor["det"] = jnp.tile(det_anchor_p[None], (bs, 1, 1))
        temp_det_feat, temp_det_anchor, time_interval, det_mask = banks.det_bank_get(
            cfg, bank_states.det if has_temp else None, bs, timestamp,
            metas["T_global"], metas["T_global_inv"],
        )
        embed["det"] = det_enc(anchor["det"])
        tfeat["det"] = temp_det_feat
        tembed["det"] = det_enc(temp_det_anchor) if has_temp else None

        # per-sample-point embeds (only with the point-expansion options)
        pts_embed: Dict[str, Optional[jnp.ndarray]] = {"map": None, "plan": None}
        temp_pts_embed: Dict[str, Optional[jnp.ndarray]] = {"map": None, "plan": None}

        # map (no temporal instances in the shipped config)
        feat["map"] = jnp.tile(map_feat_p[None], (bs, 1, 1))
        anchor["map"] = jnp.tile(map_anchor_p[None], (bs, 1, 1))
        embed["map"], pts_embed["map"] = enc_map(anchor["map"])
        tfeat["map"] = None
        tembed["map"] = None

        # plan
        plan_base = plan_fv(front_view_feature(feature_maps), train)  # [bs, C]
        feat["plan"] = jnp.tile(plan_base[:, None], (1, cfg.num_plan_anchor, 1))
        anchor["plan"] = jnp.tile(plan_anchor_p[None], (bs, 1, 1))
        embed["plan"], pts_embed["plan"] = enc_plan(anchor["plan"])
        temp_plan_feat, temp_plan_anchor = banks.plan_bank_get(
            cfg, bank_states.plan if has_temp else None
        )
        tfeat["plan"] = temp_plan_feat
        if has_temp:
            tembed["plan"], temp_pts_embed["plan"] = enc_plan(temp_plan_anchor)
        else:
            tembed["plan"] = None

        # ego
        ego_base = ego_fv(front_view_feature(feature_maps), train)
        feat["ego"] = ego_base[:, None]  # [bs, 1, C]
        anchor["ego"] = jnp.tile(ego_anchor_c[None], (bs, 1, 1))
        embed["ego"] = det_enc(anchor["ego"])
        temp_ego_feat, temp_ego_anchor = banks.ego_bank_get(
            bank_states.ego if has_temp else None
        )
        tfeat["ego"] = temp_ego_feat
        tembed["ego"] = det_enc(temp_ego_anchor) if has_temp else None

        cur_sections = cfg.sections(cfg.query_counts)
        temp_sections = cfg.sections(cfg.temp_query_counts)

        # Per-point expansion factors for the concat/gnn/split ops
        # (`sparse_onedecoder.py:676-724`): S > 0 tiles each anchor's feature
        # across its S sample points (interleaved — the reference's
        # block-`repeat` pairs features with other anchors' point embeds,
        # an upstream quirk not reproduced) and swaps the positional embed
        # for the per-point one.
        expand_S = {
            "map": cfg.map_num_pts if cfg.with_concat_map_points else 0,
            "plan": cfg.ego_fut_ts if cfg.with_concat_plan_points else 0,
        }

        def joint_pair(f_d, e_d, p_d):
            """Concat features+embeds over query_select with optional
            per-point expansion. Returns (feat, embed, sections)."""
            fparts, eparts, sections, start = [], [], {}, 0
            for q in qs:
                f, e = f_d[q], e_d[q]
                if f is None:
                    f = jnp.zeros((bs, 0, C), jnp.float32)
                    e = jnp.zeros((bs, 0, C), jnp.float32)
                S = expand_S.get(q, 0)
                if S and f.shape[1]:
                    f = jnp.repeat(f, S, axis=1)
                    e = p_d[q]
                fparts.append(f)
                eparts.append(e)
                sections[q] = (start, start + f.shape[1])
                start += f.shape[1]
            return (jnp.concatenate(fparts, axis=1),
                    jnp.concatenate(eparts, axis=1), sections)

        # shared point-squeeze MLPs (`sparse_onedecoder.py:240-247,306-313`)
        if cfg.with_concat_map_points:
            squeeze_map = MLP(
                features=(cfg.map_num_pts * C // 4, C, C), dtype=self.dtype,
                name="squeeze_map_instance",
            )
        if cfg.with_concat_plan_points:
            squeeze_plan = MLP(
                features=(cfg.ego_fut_ts * C // 2, C, C), dtype=self.dtype,
                name="squeeze_plan_instance",
            )

        # ============== attention op modules ============================
        gnn_groups = self_attention_groups([("det",), ("map",)], [True, False])
        temp_groups = cross_attention_groups(
            [("det",), ("map",), ("plan", "ego")],
            [("det",), ("map",), ("det", "map")],
            [True, False, False],
        )
        inter_groups = cross_attention_groups([("plan", "ego")], [("det", "map")], [False])

        # plan auxiliary encoders
        if cfg.with_target_point_embed:
            tp_enc_mlp = MLPLN(C, 2, 1, dtype=self.dtype, name="target_point_encoder_mlp")
            tp_enc_out = nn.Dense(C, dtype=self.dtype, name="target_point_encoder_out")
        if cfg.with_command_embed:
            cmd_enc_mlp = MLPLN(C, 2, 1, dtype=self.dtype, name="command_encoder_mlp")
            cmd_enc_out = nn.Dense(C, dtype=self.dtype, name="command_encoder_out")
        if "motion" in cfg.task_select:
            motion_enc_mlp = MLPLN(C, 1, 1, dtype=self.dtype, name="motion_anchor_encoder_mlp")
            motion_enc_out = nn.Dense(C, dtype=self.dtype, name="motion_anchor_encoder_out")

        # ============== output collectors ===============================
        out: Dict[str, Dict[str, List]] = {
            "det": {"classification": [], "prediction": [], "quality": []},
            "map": {"classification": [], "prediction": []},
            "ego": {"status": []},
            "plan": {"classification": [], "prediction": []},
            "motion": {"classification": [], "prediction": []},
        }

        det_bank_state = bank_states.det if has_temp else None
        det_cls = map_cls = plan_cls = None

        # ---- det-query pruning state (cfg.with_topk_det) -----------------
        # ``det_live`` = (temporal, fresh) live prefix lengths; ``det_tails``
        # maps output keys to the (temporal_tail, fresh_tail) rows frozen at
        # their drop layer, in ascending original-slot order — so a static
        # concat re-creates the exact full-width slot layout the banks,
        # instance-id tracker and per-layer output stacks expect.
        det_prune = cfg.with_topk_det and cfg.topk_det_list is not None
        det_live = (cfg.num_temp_det_anchor,
                    cfg.num_det_anchor - cfg.num_temp_det_anchor)
        det_tails: Optional[Dict[str, tuple]] = None

        def _det_splice(live, key):
            """Restore a live det tensor to the full num_det_anchor layout
            by splicing the frozen drop-layer tails back into their original
            slot positions (static concat — no gathers)."""
            if det_tails is None or key not in det_tails:
                return live
            tail_t, tail_f = det_tails[key]
            tk = det_live[0]
            return jnp.concatenate(
                [live[:, :tk], tail_t, live[:, tk:], tail_f], axis=1)

        joint_feat = joint_embed = None
        temp_joint_feat = temp_joint_embed = None
        deform_i = 0
        refine_i = 0
        num_refine = cfg.operation_order.count("refine")
        norm_i = 0

        for op_idx, op in enumerate(cfg.operation_order):
            if op == "concat":
                joint_feat, joint_embed, cur_sections = joint_pair(
                    feat, embed, pts_embed)
                if has_temp:
                    temp_joint_feat, temp_joint_embed, temp_sections = (
                        joint_pair(tfeat, tembed, temp_pts_embed))

            elif op == "split":
                for q in qs:
                    s, e = cur_sections[q]
                    S = expand_S.get(q, 0)
                    if S and e > s:
                        # squeeze the S per-point features back to one
                        # instance feature (`sparse_onedecoder.py:758-772`)
                        n = (e - s) // S
                        x = joint_feat[:, s:e].reshape(bs, n, S * C)
                        feat[q] = (squeeze_map if q == "map" else squeeze_plan)(x)
                        pts_embed[q] = joint_embed[:, s:e]
                    else:
                        feat[q] = joint_feat[:, s:e]
                        embed[q] = joint_embed[:, s:e]

            elif op == "gnn":
                joint_feat = GroupedCrossAttention(
                    C, cfg.num_groups, gnn_groups,
                    attn_drop=cfg.drop_out, proj_drop=cfg.drop_out,
                    dtype=self.dtype, name=f"gnn_{op_idx}",
                )(joint_feat, joint_embed, cur_sections, fc_before, fc_after,
                  deterministic=det)

            elif op == "temp_gnn":
                joint_feat = GroupedCrossAttention(
                    C, cfg.num_groups, temp_groups,
                    attn_drop=cfg.drop_out, proj_drop=cfg.drop_out,
                    dtype=self.dtype, name=f"temp_gnn_{op_idx}",
                )(joint_feat, joint_embed, cur_sections, fc_before, fc_after,
                  key_x=temp_joint_feat if has_temp else None,
                  key_pos=temp_joint_embed if has_temp else None,
                  key_sections=temp_sections, deterministic=det,
                  has_value=has_temp)

            elif op == "inter_gnn":
                inter_bias = None
                if cfg.with_distance_attn_mask or cfg.with_velocity_attn_mask:
                    from . import attn_masks

                    q_names, k_names = inter_groups[0][0], inter_groups[0][1]
                    q_feat = jnp.concatenate(
                        [feat[m] for m in q_names], axis=1
                    )
                    bias = 0.0
                    if cfg.with_distance_attn_mask:
                        dist = attn_masks.min_distance_matrix(q_names, k_names, anchor)
                        tau = attn_masks.TauHead(
                            cfg.num_groups, name=f"distance_tau_{op_idx}")(q_feat)
                        bias = bias + attn_masks.distance_bias(dist, tau)
                    if cfg.with_velocity_attn_mask:
                        dv = attn_masks.speed_diff_matrix(q_names, k_names, anchor)
                        tau = attn_masks.TauHead(
                            cfg.num_groups, name=f"velocity_tau_{op_idx}")(q_feat)
                        bias = bias + attn_masks.velocity_bias(dv, tau)
                    inter_bias = {0: bias}
                joint_feat = GroupedCrossAttention(
                    C, cfg.num_groups, inter_groups,
                    attn_drop=cfg.drop_out, proj_drop=cfg.drop_out,
                    dtype=self.dtype, name=f"inter_gnn_{op_idx}",
                )(joint_feat, joint_embed, cur_sections, fc_before, fc_after,
                  key_x=joint_feat, key_pos=joint_embed,
                  key_sections=cur_sections, attn_bias=inter_bias,
                  deterministic=det)

            elif op == "norm":
                joint_feat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{op_idx}")(joint_feat)
                norm_i += 1

            elif op == "ffn":
                joint_feat = AsymmetricFFN(
                    in_channels=C * 2, embed_dims=C, feedforward_channels=C * 4,
                    ffn_drop=cfg.drop_out, dtype=self.dtype, name=f"ffn_{op_idx}",
                )(joint_feat, deterministic=det)

            elif op == "deformable":
                common = dict(
                    embed_dims=C, num_groups=cfg.num_groups,
                    num_levels=cfg.num_levels, num_cams=cfg.num_cams,
                    sampler=cfg.sampler, sampler_cam_k=cfg.sampler_cam_k,
                    sampler_cam_renorm=cfg.sampler_cam_renorm,
                    sampler_matmul_levels=cfg.sampler_matmul_levels,
                    sampler_level_k=cfg.sampler_level_k,
                    sampler_level_renorm=cfg.sampler_level_renorm,
                    sampler_row_packed=cfg.sampler_row_packed,
                    sampler_point_frac=cfg.sampler_point_frac,
                    dtype=self.dtype,
                )
                kps_by_task = {
                    "det": BoxKeypoints(cfg.det_kps, dtype=self.dtype,
                                        name=f"det_kps_{deform_i}"),
                    "map": PointKeypoints(cfg.map_kps, dtype=self.dtype,
                                          name=f"map_kps_{deform_i}"),
                    "plan": PointKeypoints(cfg.plan_kps, dtype=self.dtype,
                                           name=f"plan_kps_{deform_i}"),
                    "ego": BoxKeypoints(cfg.ego_kps, dtype=self.dtype,
                                        name=f"ego_kps_{deform_i}"),
                }
                deform_cls = (
                    nn.remat(DeformableAggregation, static_argnums=(7,))
                    if cfg.decoder_remat else DeformableAggregation
                )
                # per-task per-point embeds for the weights head
                # (`sparse_onedecoder.py:876-882`, `blocks.py:178-189`)
                deform_S = {
                    "map": cfg.map_num_pts if cfg.with_deform_map_points else 0,
                    "plan": cfg.ego_fut_ts if cfg.with_deform_plan_points else 0,
                }
                modules = {
                    q: deform_cls(
                        kps=kps_by_task[q], name=f"{q}_deformable_{deform_i}",
                        use_points_embed=deform_S.get(q, 0),
                        **common,
                    )
                    for q in qs
                }
                deform_embed = {
                    q: (pts_embed[q] if deform_S.get(q, 0) else embed[q])
                    for q in qs
                }
                if cfg.sampler == "topk" and cfg.fused_deformable:
                    # Fused sampling: concatenate all tasks' flattened samples
                    # and gather once per layer (optional; see config note).
                    from ..ops.sampling import deformable_samples_topk_flat

                    parts_p, parts_w, spans = [], [], {}
                    ofs = 0
                    for q in qs:
                        pts2d, wq = modules[q].prepare(
                            feat[q], anchor[q], deform_embed[q], projection_mat,
                            image_wh, deterministic=det,
                        )
                        nq, pq = pts2d.shape[1:3]
                        parts_p.append(pts2d.reshape(bs, nq * pq, cfg.num_cams, 2))
                        parts_w.append(wq.reshape(
                            bs, nq * pq, cfg.num_cams, cfg.num_levels, cfg.num_groups
                        ))
                        spans[q] = (ofs, ofs + nq * pq, nq, pq)
                        ofs += nq * pq
                    flat = deformable_samples_topk_flat(
                        feature_maps,
                        jnp.concatenate(parts_p, axis=1),
                        jnp.concatenate(parts_w, axis=1),
                        cam_k=cfg.sampler_cam_k,
                        matmul_levels=cfg.sampler_matmul_levels,
                        row_packed=cfg.sampler_row_packed,
                        cam_renorm=cfg.sampler_cam_renorm,
                        level_k=cfg.sampler_level_k,
                        level_renorm=cfg.sampler_level_renorm,
                        fine_comb=fine_comb,
                    )  # [bs, SUM(n*p), C]
                    for q in qs:
                        s, e, nq, pq = spans[q]
                        sampled = flat[:, s:e].reshape(bs, nq, pq, C).sum(axis=2)
                        feat[q] = modules[q].finish(sampled, feat[q])
                else:
                    for q in qs:
                        feat[q] = modules[q](
                            feat[q], anchor[q], deform_embed[q], feature_maps,
                            projection_mat, image_wh, det, fine_comb,
                        )
                deform_i += 1

            elif op == "refine":
                # ---- det -------------------------------------------------
                new_det_anchor, det_cls, det_qt = SparseBox3DRefinement(
                    cfg, cfg.num_det_classes, dtype=self.dtype,
                    name=f"det_refine_{refine_i}",
                )(feat["det"], anchor["det"], embed["det"], time_interval)
                anchor["det"] = new_det_anchor
                out["det"]["prediction"].append(_det_splice(anchor["det"], "prediction"))
                out["det"]["classification"].append(_det_splice(det_cls, "classification"))
                out["det"]["quality"].append(_det_splice(det_qt, "quality"))

                if refine_i + 1 == cfg.num_single_frame_decoder:
                    if has_temp:
                        feat["det"], anchor["det"], det_bank_state = banks.det_bank_update(
                            cfg, det_bank_state, temp_det_feat, temp_det_anchor,
                            feat["det"], anchor["det"], det_cls, det_mask,
                            sort_fresh_full=det_prune,
                        )
                    elif det_prune:
                        # static first-frame path: no segments exist, so sort
                        # by single-frame confidence and re-lay into the
                        # segment geometry (banks.det_cold_layout) — the
                        # prefix slices then keep exactly the top-k
                        _, (sf, sa) = banks.topk_gather(
                            det_cls.max(axis=-1), cfg.num_det_anchor,
                            feat["det"], anchor["det"])
                        inv = jnp.asarray(banks.det_cold_layout(cfg))
                        feat["det"], anchor["det"] = sf[:, inv], sa[:, inv]
                embed["det"] = det_enc(anchor["det"])
                if refine_i + 1 > cfg.num_single_frame_decoder and has_temp:
                    tembed["det"] = embed["det"][:, : det_live[0]]

                # ---- map -------------------------------------------------
                new_map_anchor, map_cls, _ = SparsePoint3DRefinement(
                    cfg, cfg.num_map_classes, cfg.map_num_pts * 2,
                    dtype=self.dtype, name=f"map_refine_{refine_i}",
                )(feat["map"], anchor["map"], embed["map"])
                anchor["map"] = new_map_anchor
                out["map"]["prediction"].append(anchor["map"])
                out["map"]["classification"].append(map_cls)
                embed["map"], pts_embed["map"] = enc_map(anchor["map"])

                # ---- motion ----------------------------------------------
                if "motion" in cfg.task_select:
                    cls_ids = det_cls.argmax(axis=-1)  # [bs, n]
                    m_anchor = motion_anchor_c[cls_ids]  # [bs, n, mode, ts, 2]
                    m_anchor = agent_to_lidar_trajs(
                        m_anchor, jax.lax.stop_gradient(anchor["det"])
                    )
                    mode_embed = sine_embed_2d(m_anchor[..., -1, :], C)
                    mode_q = motion_enc_out(motion_enc_mlp(mode_embed))
                    motion_q = mode_q + (feat["det"] + embed["det"])[:, :, None]
                    m_cls, m_reg = SparseMotionRefinement(
                        cfg, dtype=self.dtype, name=f"motion_refine_{refine_i}"
                    )(motion_q)
                    out["motion"]["classification"].append(_det_splice(m_cls, "m_cls"))
                    out["motion"]["prediction"].append(_det_splice(m_reg, "m_reg"))

                # ---- ego -------------------------------------------------
                ego_status = EgoStatusRefinement(
                    cfg, dtype=self.dtype, name=f"ego_refine_{refine_i}"
                )(feat["ego"], embed["ego"])
                out["ego"]["status"].append(ego_status)

                # ---- plan ------------------------------------------------
                plan_embed = embed["plan"]
                if cfg.with_target_point_embed:
                    tp = sine_embed_2d(metas["target_point"], C)  # [bs, C]
                    plan_embed = plan_embed + tp_enc_out(tp_enc_mlp(tp))[:, None]
                if cfg.with_command_embed:
                    cmd = metas["gt_ego_fut_cmd"].astype(jnp.float32)
                    plan_embed = plan_embed + cmd_enc_out(cmd_enc_mlp(cmd))[:, None]
                if cfg.with_ego_instance_feature:
                    feat["plan"] = feat["plan"] + feat["ego"]
                    plan_embed = plan_embed + embed["ego"]

                plan_reg, plan_cls = SparsePlanAlignRefinement(
                    cfg, dtype=self.dtype, name=f"plan_refine_{refine_i}"
                )(feat["plan"], anchor["plan"], plan_embed)

                # optional per-layer plan-mode pruning
                # (`sparse_onedecoder.py:982-1007`)
                per_full = cfg.ego_fut_cmd * cfg.ego_fut_mode
                ng = cfg.plan_anchor_group
                if cfg.with_topk_mode and cfg.topk_mode_list is not None:
                    per_prev = plan_reg.shape[1] // ng
                    k_l = min(int(cfg.topk_mode_list[refine_i]), per_prev)
                    # The reference applies topk EVERY refine layer, so even
                    # k == per_prev reorders the modes by descending score
                    # (`plan_cls.topk` sorts; keep_topk_relative_pos=False
                    # keeps that order) — semantically inert for every
                    # downstream consumer, but positionally load-bearing for
                    # oracle parity, so mirror it unconditionally.
                    cls_g = plan_cls.reshape(bs, ng, per_prev)
                    scores, idx = jax.lax.top_k(cls_g, k_l)
                    if cfg.keep_topk_relative_pos:
                        idx = jnp.sort(idx, axis=-1)
                        scores = jnp.take_along_axis(cls_g, idx, axis=-1)

                    def take(a):
                        ag = a.reshape((bs, ng, per_prev, -1))
                        return jnp.take_along_axis(ag, idx[..., None], axis=2)

                    plan_reg = take(plan_reg).reshape(bs, ng * k_l, -1)
                    feat["plan"] = take(feat["plan"]).reshape(bs, ng * k_l, -1)
                    plan_cls = scores.reshape(bs, ng * k_l, 1).astype(plan_cls.dtype)

                anchor["plan"] = plan_reg
                wp = plan_reg.reshape(bs, -1, cfg.ego_fut_ts, 2)
                offsets = jnp.concatenate(
                    [wp[..., :1, :], wp[..., 1:, :] - wp[..., :-1, :]], axis=-2
                )

                def _pad_groups(x, fill):
                    """Pad pruned per-group modes back to the full count so
                    the per-layer output stacks stay static; filled slots
                    carry cls=-1e9 / reg=+1e6 so no argmin/topk downstream
                    ever selects them."""
                    n = x.shape[1]
                    if n == ng * per_full:
                        return x
                    k = n // ng
                    xg = x.reshape((bs, ng, k) + x.shape[2:])
                    pad = jnp.full((bs, ng, per_full - k) + x.shape[2:], fill,
                                   x.dtype)
                    return jnp.concatenate([xg, pad], axis=2).reshape(
                        (bs, ng * per_full) + x.shape[2:])

                out["plan"]["prediction"].append(
                    _pad_groups(offsets, 1e6)[:, None])  # [bs,1,N,ts,2]
                out["plan"]["classification"].append(
                    _pad_groups(plan_cls.reshape(bs, -1, 1), -1e9).reshape(bs, 1, -1))
                embed["plan"], pts_embed["plan"] = enc_plan(anchor["plan"])

                # ---- det-query pruning (see HiPADConfig.with_topk_det) ----
                # At the END of the refine block, so this layer's det/motion
                # outputs and the merge/embed refresh above all saw the
                # pre-prune set; layers refine_i+1.. run on the kept prefix
                # of each confidence-sorted segment (static slices only).
                if det_prune and refine_i + 1 >= cfg.num_single_frame_decoder:
                    cur_t, cur_f = det_live
                    k = min(int(cfg.topk_det_list[refine_i]), cur_t + cur_f)
                    tk = k * cfg.num_temp_det_anchor // cfg.num_det_anchor
                    nk = k - tk
                    if tk < cur_t or nk < cur_f:
                        new_vals = {
                            "prediction": anchor["det"],
                            "classification": det_cls,
                            "quality": det_qt,
                            "feat": feat["det"],
                        }
                        if "motion" in cfg.task_select:
                            new_vals["m_cls"] = m_cls
                            new_vals["m_reg"] = m_reg
                        prev_tails = det_tails or {}
                        det_tails = {}
                        for key, full in new_vals.items():
                            tail_t = full[:, tk:cur_t]
                            tail_f = full[:, cur_t + nk:]
                            if key in prev_tails:
                                # newly dropped rows precede earlier drops:
                                # ascending original-slot order is preserved
                                tail_t = jnp.concatenate(
                                    [tail_t, prev_tails[key][0]], axis=1)
                                tail_f = jnp.concatenate(
                                    [tail_f, prev_tails[key][1]], axis=1)
                            det_tails[key] = (tail_t, tail_f)

                        def _keep(x):
                            return jnp.concatenate(
                                [x[:, :tk], x[:, cur_t:cur_t + nk]], axis=1)

                        feat["det"] = _keep(feat["det"])
                        anchor["det"] = _keep(anchor["det"])
                        embed["det"] = _keep(embed["det"])
                        if has_temp:
                            tfeat["det"] = tfeat["det"][:, :tk]
                            tembed["det"] = tembed["det"][:, :tk]
                        det_live = (tk, nk)

                refine_i += 1
            else:
                raise NotImplementedError(f"unknown op {op!r}")

        # With topk pruning, pad the final plan tensors back to the full
        # mode count before caching/export (zero features & anchors, -1e9
        # confidence — never re-selected by the bank's top-k or decoders).
        n_plan_full = cfg.plan_anchor_group * cfg.ego_fut_cmd * cfg.ego_fut_mode
        if anchor["plan"].shape[1] < n_plan_full:
            ng = cfg.plan_anchor_group
            k = anchor["plan"].shape[1] // ng
            pf = cfg.ego_fut_cmd * cfg.ego_fut_mode

            def _pad_full(x, fill):
                xg = x.reshape((bs, ng, k) + x.shape[2:])
                pad = jnp.full((bs, ng, pf - k) + x.shape[2:], fill, x.dtype)
                return jnp.concatenate([xg, pad], axis=2).reshape(
                    (bs, ng * pf) + x.shape[2:])

            feat["plan"] = _pad_full(feat["plan"], 0.0)
            # +1e6 sentinel (same as the per-layer output stacks): a padded
            # slot must read as an absurd far-away trajectory, not a
            # plausible stationary one, in case a consumer selects by
            # anything other than the -1e9 classification.
            anchor["plan"] = _pad_full(anchor["plan"], 1e6)
            plan_cls = _pad_full(plan_cls.reshape(bs, -1, 1), -1e9)

        # ============== cache banks for the next frame ===================
        # Under det pruning, restore the full slot layout first (live rows +
        # frozen drop-layer tails) so confidence decay, the temporal top-k
        # and instance-id tracking see every instance at its last refined
        # state, slot-aligned with the previous frame.
        det_feat_full = _det_splice(feat["det"], "feat")
        det_anchor_full = _det_splice(anchor["det"], "prediction")
        det_cls_full = _det_splice(det_cls, "classification")
        new_det_state, temp_conf = banks.det_bank_cache(
            cfg,
            det_bank_state.confidence if has_temp else None,
            det_feat_full, det_anchor_full, det_cls_full, timestamp,
            metas["T_global"],
        )
        instance_id, new_det_state = banks.det_assign_instance_ids(
            cfg, det_bank_state, new_det_state, temp_conf, det_cls_full,
            score_threshold=None,
        )
        new_ego_state = banks.ego_bank_cache(feat["ego"], anchor["ego"], timestamp)
        new_plan_state = banks.plan_bank_cache(
            cfg,
            bank_states.plan.confidence if has_temp else None,
            feat["plan"], anchor["plan"], plan_cls, timestamp,
        )
        new_bank_states = banks.BankStates(det=new_det_state, ego=new_ego_state,
                                           plan=new_plan_state)

        outputs: Dict[str, Any] = {
            "det": {
                "classification": jnp.stack(out["det"]["classification"]),
                "prediction": jnp.stack(out["det"]["prediction"]),
                "quality": jnp.stack(out["det"]["quality"]),
                "instance_id": instance_id,
            },
            "map": {
                "classification": jnp.stack(out["map"]["classification"]),
                "prediction": jnp.stack(out["map"]["prediction"]),
            },
            "ego": {"status": jnp.stack(out["ego"]["status"])},
            "plan": {
                "classification": jnp.stack(out["plan"]["classification"]),
                "prediction": jnp.stack(out["plan"]["prediction"]),
                "final_waypoints": anchor["plan"],
            },
        }
        if "motion" in cfg.task_select:
            outputs["motion"] = {
                "classification": jnp.stack(out["motion"]["classification"]),
                "prediction": jnp.stack(out["motion"]["prediction"]),
            }
        return outputs, new_bank_states
