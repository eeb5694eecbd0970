"""Temporal instance banks as explicit pytree state.

The reference keeps temporal state as mutable module attributes
(`models/instance_bank.py`, `models/ego/instance_bank.py`,
`models/plan/instance_bank.py`). TPU-native, the banks are immutable
dataclasses threaded through the jitted step:

    outputs, new_state = model.apply(params, frame, state)

All shapes are static; per-sample sequence resets are handled by the time
mask (gap > max_time_interval or <= 0 resets that sample), exactly like the
reference's ``self.mask`` mechanism. "No cache yet" (cold start) is a
*static* condition handled by the caller passing ``state=None``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp

from ..configs.model import HiPADConfig
from ..core.box3d import VX
from ..core.geometry import box_anchor_projection


class DetBankState(flax.struct.PyTreeNode):
    feature: jnp.ndarray  # [bs, K, C]
    anchor: jnp.ndarray  # [bs, K, 11]
    confidence: jnp.ndarray  # [bs, K]
    instance_id: jnp.ndarray  # [bs, num_anchor] int32 (-1 = unassigned)
    prev_id: jnp.ndarray  # [bs] int32 id counter
    timestamp: jnp.ndarray  # [bs]
    t_global: jnp.ndarray  # [bs, 4, 4]


class EgoBankState(flax.struct.PyTreeNode):
    feature: jnp.ndarray  # [bs, 1, C]
    anchor: jnp.ndarray  # [bs, 1, 11]
    timestamp: jnp.ndarray  # [bs]


class PlanBankState(flax.struct.PyTreeNode):
    feature: jnp.ndarray  # [bs, G*cmd, M, C]
    anchor: jnp.ndarray  # [bs, G*cmd, M, ts*2]
    confidence: jnp.ndarray  # [bs, G*cmd, M]
    timestamp: jnp.ndarray  # [bs]


class BankStates(flax.struct.PyTreeNode):
    det: DetBankState
    ego: EgoBankState
    plan: PlanBankState


def init_bank_states(cfg: HiPADConfig, batch_size: int,
                     embed_dims: int | None = None,
                     feature_dtype=jnp.float32) -> "BankStates":
    """Zeroed cold-start bank state.

    Functionally equivalent to the first frame's ``state=None`` path (zero
    confidence + a timestamp far in the past makes every sample fail the
    ``max_time_interval`` check, so cached content is ignored), but lets
    callers jit a *single* temporal-step variant instead of two.

    ``feature_dtype`` must match the model's cached-feature dtype (bf16 under
    ``HiPAD(dtype=bfloat16)``) or scan carries will type-mismatch.
    """
    C = embed_dims or cfg.embed_dims
    bs = batch_size
    t_old = jnp.full((bs,), -1e9, jnp.float32)
    det = DetBankState(
        feature=jnp.zeros((bs, cfg.num_temp_det_anchor, C), feature_dtype),
        anchor=jnp.zeros((bs, cfg.num_temp_det_anchor, 11)),
        confidence=jnp.zeros((bs, cfg.num_temp_det_anchor)),
        instance_id=jnp.full((bs, cfg.num_det_anchor), -1, jnp.int32),
        prev_id=jnp.zeros((bs,), jnp.int32),
        timestamp=t_old,
        t_global=jnp.tile(jnp.eye(4)[None], (bs, 1, 1)),
    )
    ego = EgoBankState(
        feature=jnp.zeros((bs, 1, C), feature_dtype),
        anchor=jnp.asarray(
            jnp.tile(jnp.asarray(cfg.ego_anchor_init)[None], (bs, 1, 1))
        ),
        timestamp=t_old,
    )
    g = cfg.plan_anchor_group * cfg.ego_fut_cmd
    plan = PlanBankState(
        feature=jnp.zeros((bs, g, cfg.num_temp_plan_mode, C), feature_dtype),
        anchor=jnp.zeros((bs, g, cfg.num_temp_plan_mode, cfg.ego_fut_ts * 2)),
        confidence=jnp.zeros((bs, g, cfg.num_temp_plan_mode)),
        timestamp=t_old,
    )
    return BankStates(det=det, ego=ego, plan=plan)


def topk_gather(confidence: jnp.ndarray, k: int, *inputs):
    """Batched top-k row selection (reference ``topk``, instance_bank.py:14-21)."""
    conf, idx = jax.lax.top_k(confidence, k)
    outs = [jnp.take_along_axis(x, idx[..., None], axis=1) for x in inputs]
    return conf, outs


def det_cold_layout(cfg: HiPADConfig):
    """Compile-time permutation for with_topk_det cold-start samples.

    A cold sample (no valid temporal gap / no bank) has no
    [temporal | fresh] segment structure, but the static prefix pruning
    keeps rows [0:tk] and [num_temp:num_temp+nk]. Placing the
    confidence-sorted ranks into the segment geometry by Bresenham
    round-robin (rank r goes to the temporal segment iff
    floor((r+1)*nt/nd) > floor(r*nt/nd)) makes every proportional prefix
    keep (tk = k*nt//nd, nk = k-tk) capture EXACTLY the global top-k, for
    every k of the schedule at once. Returns the constant index array
    ``inv`` with ``layout[s] = sorted_by_confidence[inv[s]]``.
    """
    import numpy as np

    nt, nd = cfg.num_temp_det_anchor, cfg.num_det_anchor
    r = np.arange(nd)
    ct = (r * nt) // nd  # temporal slots used by ranks 0..r-1
    in_t = ((r + 1) * nt) // nd > ct
    slot = np.where(in_t, ct, nt + (r - ct))
    inv = np.empty(nd, np.int64)
    inv[slot] = r
    return inv


import jax  # noqa: E402  (after flax.struct for readability)


# --------------------------------------------------------------------------
# Det bank (`models/instance_bank.py:24-229`)
# --------------------------------------------------------------------------

def det_bank_get(
    cfg: HiPADConfig,
    state: Optional[DetBankState],
    batch_size: int,
    timestamp: jnp.ndarray,
    t_global: jnp.ndarray,
    t_global_inv: jnp.ndarray,
):
    """-> (temp_feature, temp_anchor(projected to cur frame), time_interval, mask)."""
    if state is None:
        ti = jnp.full((batch_size,), cfg.default_time_interval, jnp.float32)
        return None, None, ti, None
    dt = (timestamp - state.timestamp).astype(jnp.float32)
    mask = jnp.abs(dt) <= cfg.max_time_interval
    t_temp2cur = jnp.einsum("bij,bjk->bik", t_global_inv, state.t_global)
    temp_anchor = box_anchor_projection(state.anchor, t_temp2cur, time_interval=-dt)
    ti = jnp.where(mask & (dt != 0), dt, cfg.default_time_interval)
    return state.feature, temp_anchor, ti, mask


def det_bank_update(
    cfg: HiPADConfig,
    state: DetBankState,
    temp_feature: jnp.ndarray,
    temp_anchor: jnp.ndarray,
    instance_feature: jnp.ndarray,
    anchor: jnp.ndarray,
    cls_logits: jnp.ndarray,
    mask: jnp.ndarray,
    sort_fresh_full: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, DetBankState]:
    """Merge temporal instances after the single-frame layer
    (`instance_bank.py:125-162`): keep top-(N-K) fresh detections, prepend the
    K cached instances; samples with an invalid time gap keep the fresh set
    and zero their cached confidence.

    ``sort_fresh_full`` (with_topk_det only — the extra permutation would
    break bit-parity with the reference otherwise): cold samples keep the
    full fresh set confidence-sorted and re-laid into the segment geometry
    (``det_cold_layout``) instead of anchor-ordered, so the static
    segment-prefix pruning downstream keeps exactly the top-k single-frame
    detections rather than an arbitrary anchor prefix."""
    n_fresh = cfg.num_det_anchor - cfg.num_temp_det_anchor
    conf = cls_logits.max(axis=-1)
    _, (sel_feat, sel_anchor) = topk_gather(conf, n_fresh, instance_feature, anchor)
    merged_feat = jnp.concatenate([temp_feature, sel_feat], axis=1)
    merged_anchor = jnp.concatenate([temp_anchor, sel_anchor], axis=1)
    fresh_feat, fresh_anchor = instance_feature, anchor
    if sort_fresh_full:
        _, (fresh_feat, fresh_anchor) = topk_gather(
            conf, cfg.num_det_anchor, instance_feature, anchor)
        inv = jnp.asarray(det_cold_layout(cfg))
        fresh_feat = fresh_feat[:, inv]
        fresh_anchor = fresh_anchor[:, inv]
    out_feat = jnp.where(mask[:, None, None], merged_feat, fresh_feat)
    out_anchor = jnp.where(mask[:, None, None], merged_anchor, fresh_anchor)
    new_state = state.replace(
        confidence=jnp.where(mask[:, None], state.confidence, 0.0),
        instance_id=jnp.where(mask[:, None], state.instance_id, -1),
    )
    return out_feat, out_anchor, new_state


def det_bank_cache(
    cfg: HiPADConfig,
    prev_confidence: Optional[jnp.ndarray],
    instance_feature: jnp.ndarray,
    anchor: jnp.ndarray,
    cls_logits: jnp.ndarray,
    timestamp: jnp.ndarray,
    t_global: jnp.ndarray,
) -> Tuple[DetBankState, jnp.ndarray]:
    """Cache top-K instances with confidence decay (`instance_bank.py:164-196`).

    Returns (state-without-ids, temp_confidence) — instance ids are filled in
    by ``det_assign_instance_ids`` afterwards.
    """
    k = cfg.num_temp_det_anchor
    conf = jax.nn.sigmoid(cls_logits.max(axis=-1))
    cls_ids = cls_logits.argmax(axis=-1)
    if prev_confidence is not None:
        decayed = jnp.maximum(prev_confidence * cfg.confidence_decay, conf[:, :k])
        conf = jnp.concatenate([decayed, conf[:, k:]], axis=1)
    temp_confidence = conf
    new_conf, (feat, anc, ids) = topk_gather(
        conf, k,
        jax.lax.stop_gradient(instance_feature),
        jax.lax.stop_gradient(anchor),
        cls_ids[..., None],
    )
    # Zero velocity for static classes (`instance_bank.py:191-196`).
    is_static = jnp.isin(ids[..., 0], jnp.asarray(cfg.zero_velocity_class_ids))
    anc = anc.at[..., VX:].set(jnp.where(is_static[..., None], 0.0, anc[..., VX:]))
    bs = anchor.shape[0]
    state = DetBankState(
        feature=feat,
        anchor=anc,
        confidence=new_conf,
        instance_id=jnp.full((bs, cfg.num_det_anchor), -1, jnp.int32),
        prev_id=jnp.zeros((bs,), jnp.int32),
        timestamp=timestamp,
        t_global=t_global,
    )
    return state, temp_confidence


def det_assign_instance_ids(
    cfg: HiPADConfig,
    old_state: Optional[DetBankState],
    new_state: DetBankState,
    temp_confidence: jnp.ndarray,
    cls_logits: jnp.ndarray,
    score_threshold: Optional[float] = None,
) -> Tuple[jnp.ndarray, DetBankState]:
    """Persistent tracking ids (`instance_bank.py:199-228`).

    Anchors carrying a cached id keep it; unassigned anchors (optionally above
    a score threshold) receive fresh sequential ids. The ids of the top-K
    (by temp confidence) are cached for the next frame.
    """
    bs = cls_logits.shape[0]
    n = cfg.num_det_anchor
    k = cfg.num_temp_det_anchor
    conf = jax.nn.sigmoid(cls_logits.max(axis=-1))
    if old_state is not None:
        instance_id = old_state.instance_id
        prev_id = old_state.prev_id
    else:
        instance_id = jnp.full((bs, n), -1, jnp.int32)
        prev_id = jnp.zeros((bs,), jnp.int32)
    need = instance_id < 0
    if score_threshold is not None:
        need = need & (conf >= score_threshold)
    new_ids = prev_id[:, None] + jnp.cumsum(need, axis=1) - 1
    instance_id = jnp.where(need, new_ids, instance_id)
    prev_id = prev_id + need.sum(axis=1)
    # keep ids of the cached top-K, pad to num_anchor with -1
    _, (kept,) = topk_gather(temp_confidence, k, instance_id[..., None])
    cached_ids = jnp.concatenate(
        [kept[..., 0], jnp.full((bs, n - k), -1, jnp.int32)], axis=1
    )
    return instance_id, new_state.replace(instance_id=cached_ids, prev_id=prev_id)


# --------------------------------------------------------------------------
# Ego bank (`models/ego/instance_bank.py:24-190`): single anchor, cached
# feature/anchor used as temporal keys, no projection (no anchor handler in
# the shipped config).
# --------------------------------------------------------------------------

def ego_bank_get(state: Optional[EgoBankState]):
    if state is None:
        return None, None
    return state.feature, state.anchor


def ego_bank_cache(instance_feature, anchor, timestamp) -> EgoBankState:
    return EgoBankState(
        feature=jax.lax.stop_gradient(instance_feature),
        anchor=jax.lax.stop_gradient(anchor),
        timestamp=timestamp,
    )


# --------------------------------------------------------------------------
# Plan bank (`models/plan/instance_bank.py:24-262`): per (anchor-group x cmd)
# block of modes, cached with confidence decay; cached anchors are ego-relative
# trajectories and are *not* ego-motion compensated (reference behaviour).
# --------------------------------------------------------------------------

def plan_bank_get(cfg: HiPADConfig, state: Optional[PlanBankState]):
    if state is None:
        return None, None
    bs = state.feature.shape[0]
    temp_feat = state.feature.reshape(bs, -1, state.feature.shape[-1])
    temp_anchor = state.anchor.reshape(bs, -1, cfg.ego_fut_ts * 2)
    return temp_feat, temp_anchor


def plan_bank_cache(
    cfg: HiPADConfig,
    prev_confidence: Optional[jnp.ndarray],
    instance_feature: jnp.ndarray,
    anchor: jnp.ndarray,
    cls_logits: jnp.ndarray,
    timestamp: jnp.ndarray,
) -> PlanBankState:
    bs = anchor.shape[0]
    g = cfg.plan_anchor_group * cfg.ego_fut_cmd
    m = cfg.ego_fut_mode
    k = cfg.num_temp_plan_mode
    d = instance_feature.shape[-1]
    feat = jax.lax.stop_gradient(instance_feature).reshape(bs * g, m, d)
    anc = jax.lax.stop_gradient(anchor).reshape(bs * g, m, cfg.ego_fut_ts * 2)
    conf = jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits).reshape(bs * g, m))
    if prev_confidence is not None:
        prev = prev_confidence.reshape(bs * g, k)
        decayed = jnp.maximum(prev * cfg.confidence_decay, conf[:, :k])
        conf = jnp.concatenate([decayed, conf[:, k:]], axis=1)
    new_conf, (cf, ca) = topk_gather(conf, k, feat, anc)
    return PlanBankState(
        feature=cf.reshape(bs, g, k, d),
        anchor=ca.reshape(bs, g, k, cfg.ego_fut_ts * 2),
        confidence=new_conf.reshape(bs, g, k),
        timestamp=timestamp,
    )
