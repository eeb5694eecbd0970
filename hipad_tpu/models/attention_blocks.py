"""Group-separated attention over the concatenated multi-task query set.

TPU-native rework of `models/separate_attn.py`: the per-modality query layout
is static (fixed anchor budgets), so every group's slice boundaries are
compile-time constants — each group is one dense attention call, no dynamic
shapes, no masking needed for the grouping itself.

The "decoupled attention" trick (Sparse4D): for selected groups the query and
key are feature‖pos-embed concatenations at 2x width, values are lifted by a
shared ``fc_before`` (C -> 2C) and outputs squeezed by ``fc_after`` (2C -> C)
(`models/sparse_onedecoder.py:354-359,448-470`).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import MultiheadAttention

Sections = Dict[str, Tuple[int, int]]


def _gather(x: jnp.ndarray, names: Sequence[str], sections: Sections) -> jnp.ndarray:
    parts = [x[:, sections[m][0] : sections[m][1]] for m in names]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _scatter(out: jnp.ndarray, update: jnp.ndarray, names: Sequence[str], sections: Sections):
    ofs = 0
    for m in names:
        s, e = sections[m]
        out = out.at[:, s:e].set(update[:, ofs : ofs + (e - s)])
        ofs += e - s
    return out


class GroupedCrossAttention(nn.Module):
    """Shared engine for the three attention flavours.

    Each entry of ``groups`` is (query_modalities, key_modalities, decoupled).
    Keys come from ``key_x``/``key_pos`` sliced by ``key_sections``; when the
    selected key slice is empty (e.g. map with zero temporal instances) or
    ``key_x`` is None (first frame), the group self-attends over its queries
    — matching `separate_attn.py:128-131,228-231`.
    """

    embed_dims: int
    num_heads: int
    groups: Tuple[Tuple[Tuple[str, ...], Tuple[str, ...], bool], ...]
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        query_pos: jnp.ndarray,
        sections: Sections,
        fc_before: nn.Module,
        fc_after: nn.Module,
        key_x: Optional[jnp.ndarray] = None,
        key_pos: Optional[jnp.ndarray] = None,
        key_sections: Optional[Sections] = None,
        attn_bias: Optional[Dict[int, jnp.ndarray]] = None,
        deterministic: bool = True,
        has_value: bool = True,
    ) -> jnp.ndarray:
        """``has_value`` mirrors whether the reference call site passes a
        ``value`` tensor. The temporal flavour passes ``value=None`` on the
        first frame (and a group's sliced value is empty whenever its key
        slice is), in which case `MultiheadFlashAttention` substitutes
        value = key — for a DECOUPLED group that is the feature‖pos-embed
        CONCAT, bypassing ``fc_before``
        (`separate_attn.py:272-291` + `attention.py:251-254`)."""
        out = query
        self_attend_all = key_x is None
        if self_attend_all:
            key_x, key_pos, key_sections = query, query_pos, sections

        for gi, (q_names, k_names, decoupled) in enumerate(self.groups):
            q = _gather(query, q_names, sections)
            qp = _gather(query_pos, q_names, sections)
            num_keys = sum(key_sections[m][1] - key_sections[m][0] for m in k_names)
            group_has_value = has_value and num_keys > 0
            if num_keys == 0:
                k, kp, v = q, qp, q  # degenerate self-attention
            else:
                k = _gather(key_x, k_names, key_sections)
                kp = _gather(key_pos, k_names, key_sections)
                v = k
            dims = self.embed_dims * (2 if decoupled else 1)
            attn = MultiheadAttention(
                embed_dims=dims,
                num_heads=self.num_heads,
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                dtype=self.dtype,
                name=f"attn_{gi}",
            )
            bias = attn_bias.get(gi) if attn_bias and num_keys else None
            if decoupled:
                k_cat = jnp.concatenate([k, kp], axis=-1)
                v_in = fc_before(v) if group_has_value else k_cat
                res = attn(
                    jnp.concatenate([q, qp], axis=-1),
                    key=k_cat,
                    value=v_in,
                    attn_bias=bias,
                    deterministic=deterministic,
                )
                res = fc_after(res)
            else:
                res = attn(q, key=k, value=v, query_pos=qp, key_pos=kp,
                           attn_bias=bias, deterministic=deterministic)
            out = _scatter(out, res, q_names, sections)
        return out


def self_attention_groups(separate_list, decouple_list):
    """`SeparateAttention` config -> grouped spec (queries attend themselves)."""
    return tuple((tuple(g), tuple(g), d) for g, d in zip(separate_list, decouple_list))


def cross_attention_groups(query_list, key_list, decouple_list):
    return tuple(
        (tuple(q), tuple(k), d) for q, k, d in zip(query_list, key_list, decouple_list)
    )
