"""GridMask image augmentation, device-side and jit-friendly.

Reimplements the behaviour of the reference `models/grid_mask.py:73-138` with
the shipped settings (use_h=use_w=True, rotate=1 => no rotation, offset=False,
ratio=0.5, mode=1, prob=0.7): one random stripe pattern per batch, inverted so
pixels on a horizontal OR vertical stripe are kept.

Written as pure jnp (periodic modulo arithmetic instead of building the 1.5x
canvas + centre crop — the crop only shifts the phase of a periodic pattern,
which the random offsets already cover).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    images: jnp.ndarray,
    ratio: float = 0.5,
    prob: float = 0.7,
) -> jnp.ndarray:
    """Apply GridMask to ``[..., H, W, C]`` images (one mask for the batch)."""
    h, w = images.shape[-3], images.shape[-2]
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)

    d = jax.random.randint(k_d, (), 2, h)
    length = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    # Reference builds the pattern on a 1.5x canvas then centre-crops; the
    # phase shift of that crop is (hh - h) // 2 per axis.
    ph = (jnp.floor(1.5 * h).astype(jnp.int32) - h) // 2
    pw = (jnp.floor(1.5 * w).astype(jnp.int32) - w) // 2
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    in_h_stripe = jnp.mod(rows + ph - st_h, d) < length
    in_w_stripe = jnp.mod(cols + pw - st_w, d) < length
    keep = (in_h_stripe | in_w_stripe).astype(images.dtype)  # mode=1 inversion

    apply = jax.random.uniform(k_apply, ()) < prob
    mask = jnp.where(apply, keep, jnp.ones_like(keep))
    return images * mask[..., None]
