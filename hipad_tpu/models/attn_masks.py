"""Optional attention-bias machinery for the interactive attention.

TPU port of the reference's learnable distance / velocity masks
(`models/separate_attn.py:501-655`) — OFF in both shipped configs (flash-attn
cannot take masks, `attention.py:251`; here they are plain additive logit
biases, so enabling them costs one broadcast add):

  * distance mask: per (query, key) the min point distance between the two
    instances' anchor geometry, scaled by a per-head learned tau predicted
    from the query features: ``bias = -dist * tau``;
  * velocity mask: signed speed difference (query speed - key speed, shifted
    to <= 0), scaled by a learned tau: ``bias = (dv - max dv) * tau``.

Geometry levels: det/ego anchors contribute their center (point level);
map/plan contribute polyline vertices (instance level, min over vertices).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.box3d import VX

POINT_LEVEL = {"ego": "point", "det": "point", "map": "instance", "plan": "instance"}


def _geometry(name: str, anchors: Dict[str, jnp.ndarray], bs: int):
    a = anchors[name]
    if name in ("det", "ego"):
        return a[..., :2]  # [bs, n, 2]
    return a.reshape(bs, a.shape[1], -1, 2)  # [bs, n, P, 2]


def min_distance_matrix(
    q_names: Sequence[str], k_names: Sequence[str],
    anchors: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """[bs, Nq, Nk] min point distance (`separate_attn.py:526-570`)."""
    bs = next(iter(anchors.values())).shape[0]
    rows = []
    for qn in q_names:
        qp = _geometry(qn, anchors, bs)
        cols = []
        for kn in k_names:
            kp = _geometry(kn, anchors, bs)
            ql, kl = POINT_LEVEL[qn], POINT_LEVEL[kn]
            if ql == "point" and kl == "point":
                d = jnp.linalg.norm(qp[:, :, None] - kp[:, None], axis=-1)
            elif ql == "point" and kl == "instance":
                d = jnp.linalg.norm(qp[:, :, None, None] - kp[:, None], axis=-1).min(-1)
            elif ql == "instance" and kl == "point":
                d = jnp.linalg.norm(qp[:, :, None] - kp[:, None, :, None], axis=-1).min(-1)
            else:
                d = jnp.linalg.norm(
                    qp[:, :, None, :, None] - kp[:, None, :, None], axis=-1
                ).reshape(bs, qp.shape[1], kp.shape[1], -1).min(-1)
            cols.append(d)
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def speed_diff_matrix(
    q_names: Sequence[str], k_names: Sequence[str],
    anchors: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """[bs, Nq, Nk] query speed - key speed, max-shifted to <= 0
    (`separate_attn.py:592-655`); only det carries velocity."""
    bs = next(iter(anchors.values())).shape[0]

    def speed(name):
        a = anchors[name]
        if name == "det":
            return jnp.linalg.norm(a[..., VX : VX + 2], axis=-1)
        return jnp.zeros((bs, a.shape[1]), a.dtype)

    rows = []
    for qn in q_names:
        sq = speed(qn)
        rows.append(jnp.concatenate(
            [sq[:, :, None] - speed(kn)[:, None] for kn in k_names], axis=-1))
    v = jnp.concatenate(rows, axis=-2)
    return v - v.max()


class TauHead(nn.Module):
    """Per-head positive scale from query features (`sparse_onedecoder.py:361-365`)."""

    num_heads: int
    dtype=None

    @nn.compact
    def __call__(self, q_feat: jnp.ndarray) -> jnp.ndarray:
        tau = nn.Dense(self.num_heads, dtype=self.dtype, name="tau")(q_feat)
        return nn.softplus(tau)  # [bs, Nq, heads]


def distance_bias(dist: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """-> [bs, heads, Nq, Nk] additive logit bias."""
    return -dist[:, None] * jnp.transpose(tau, (0, 2, 1))[..., None]


def velocity_bias(dv: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    return dv[:, None] * jnp.transpose(tau, (0, 2, 1))[..., None]


def pair_ban_bias(
    q_names: Sequence[str], k_names: Sequence[str],
    sections_q: Dict[str, Tuple[int, int]], sections_k: Dict[str, Tuple[int, int]],
    banned: Sequence[Tuple[str, str]],
) -> jnp.ndarray:
    """Static modality-pair ban mask (``attn_mask_dict``,
    `sparse_onedecoder.py:581-610`): -inf bias on banned (query, key) pairs.
    Returns [Nq, Nk] (broadcasts over batch/heads)."""
    nq = sum(sections_q[m][1] - sections_q[m][0] for m in q_names)
    nk = sum(sections_k[m][1] - sections_k[m][0] for m in k_names)
    bias = jnp.zeros((nq, nk))
    q_ofs = 0
    for qn in q_names:
        qs = sections_q[qn][1] - sections_q[qn][0]
        k_ofs = 0
        for kn in k_names:
            ks = sections_k[kn][1] - sections_k[kn][0]
            if (qn, kn) in banned:
                bias = bias.at[q_ofs : q_ofs + qs, k_ofs : k_ofs + ks].set(-1e9)
            k_ofs += ks
        q_ofs += qs
    return bias
