"""Online-map post-processing (`models/map/decoder.py:6-38`): rank the
(query, class) product, return polylines + scores + labels, batched."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def decode_map(
    cls_scores: jnp.ndarray,
    pts_preds: jnp.ndarray,
    coords_dim: int = 2,
    score_threshold: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Args: cls_scores [bs, P, num_cls] logits; pts_preds [bs, P, pts*2]."""
    prob = jax.nn.sigmoid(cls_scores)
    bs, P, num_cls = prob.shape
    pts = pts_preds.reshape(bs, P, -1, coords_dim)
    flat = prob.reshape(bs, P * num_cls)
    topv, topi = jax.lax.top_k(flat, P)
    labels = (topi % num_cls).astype(jnp.int32)
    query_idx = topi // num_cls
    vectors = jnp.take_along_axis(pts, query_idx[..., None, None], axis=1)
    valid = (
        topv >= score_threshold if score_threshold is not None
        else jnp.ones_like(topv, bool)
    )
    return {"vectors": vectors, "scores": topv, "labels": labels, "valid": valid}
