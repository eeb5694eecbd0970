"""Shared building-block modules (flax.linen).

These mirror the reference's small MLP stacks (``linear_relu_ln``,
`models/blocks.py:32-42`) and attention wrapper
(`models/attention.py:146-289`) but are written as idiomatic flax modules.
Weight naming is kept systematic so a PyTorch->JAX converter can map the
released checkpoint onto these modules.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPLN(nn.Module):
    """[Linear, ReLU] * in_loops followed by LayerNorm, repeated out_loops.

    Equivalent to the reference ``linear_relu_ln(embed_dims, in_loops,
    out_loops, input_dims)``. LayerNorms here (and everywhere in the model)
    use epsilon=1e-5 to match torch's default — flax's 1e-6 costs ~1e-4
    output error per LN stack against a converted checkpoint
    (tests/test_convert_numeric.py).
    """

    embed_dims: int
    in_loops: int = 1
    out_loops: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for o in range(self.out_loops):
            for i in range(self.in_loops):
                x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc_{o}_{i}")(x)
                x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln_{o}")(x)
        return x


class MLP(nn.Module):
    """Plain MLP: Dense(+ReLU) per hidden dim, final Dense without act."""

    features: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features[:-1]):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.features[-1], dtype=self.dtype, name=f"fc_{len(self.features) - 1}")(x)
        return x


class Scale(nn.Module):
    """Per-channel learnable scale (reference ``mmcv.cnn.Scale``)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", lambda _key: jnp.ones((self.dim,), jnp.float32))
        return x * scale


def cls_bias_init(prior_prob: float = 0.01) -> float:
    """Focal-loss style classification bias init (mmcv bias_init_with_prob)."""
    import math

    return float(-math.log((1 - prior_prob) / prior_prob))


class MultiheadAttention(nn.Module):
    """Multi-head attention with additive positional embeddings and a residual.

    TPU-native replacement for the reference ``MultiheadFlashAttention``
    (`models/attention.py:146-289`): the packed qkv projection + softmax
    attention is expressed with plain XLA ops — at HiP-AD's sequence lengths
    (~1.5-2.6k queries) XLA's fused attention is already at speed of light, no
    hand-written kernel needed.

    Call semantics (matching the reference):
      * key defaults to query, value defaults to key,
      * query_pos / key_pos are added before projection,
      * output = residual(identity=query before pos-add) + proj_drop(out).
    """

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        key_pos: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        identity = query
        if key is None:
            key = query
            if key_pos is None and query_pos is not None and query_pos.shape == key.shape:
                key_pos = query_pos
        if value is None:
            value = key
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos

        d = self.embed_dims
        h = self.num_heads
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(value)

        bs, nq = q.shape[:2]
        nk = k.shape[1]
        q = q.reshape(bs, nq, h, hd)
        k = k.reshape(bs, nk, h, hd)
        v = v.reshape(bs, nk, h, hd)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        # upcast-only: bf16 logits softmax in f32; f64 (parity oracle) stays f64
        probs = jax.nn.softmax(
            logits.astype(jnp.promote_types(logits.dtype, jnp.float32)),
            axis=-1).astype(q.dtype)
        if self.attn_drop > 0.0 and not deterministic:
            probs = nn.Dropout(self.attn_drop)(probs, deterministic=False)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bs, nq, d)
        out = nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop)(out, deterministic=False)
        return identity + out


class AsymmetricFFN(nn.Module):
    """FFN with a wider input than output (`models/blocks.py:328-397`).

    in_channels (512 post-concat) -> pre-LN -> Dense(ffn) -> ReLU -> Dense(out)
    with identity projected by a Dense when widths differ.
    """

    in_channels: int
    embed_dims: int
    feedforward_channels: int
    ffn_drop: float = 0.0
    pre_norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(x)
        identity = x
        out = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        out = nn.relu(out)
        if self.ffn_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.ffn_drop)(out, deterministic=False)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(out)
        if self.ffn_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.ffn_drop)(out, deterministic=False)
        if self.in_channels != self.embed_dims:
            identity = nn.Dense(self.embed_dims, dtype=self.dtype, name="identity_fc")(identity)
        return identity + out
