"""Batched linear-sum assignment, fully on device.

The reference solves its Hungarian matching with scipy on the CPU per sample
per decoder layer (`models/det/target.py:94-104`, `map/target.py:152-157`) —
a GPU->CPU sync point 6 layers x 2 tasks x batch times per step. TPU-native we
run the exact Jonker-Volgenant shortest-augmenting-path algorithm inside the
jitted graph with `lax` loops, `vmap`-ed over the batch: no host round-trip,
no dynamic shapes, works under `pjit`/`shard_map`.

Cost layout: rows = ground-truth slots (small, padded to a fixed capacity),
columns = predictions (large). Feasibility for any (row, column) count is
guaranteed by appending R *virtual* columns at a large constant cost
``PAD_COST`` and giving padding rows that same constant everywhere: the
optimizer always prefers putting valid rows on real columns (cost clipped to
+-1e6 < PAD_COST), padding rows drain to virtual columns, and the valid rows'
optimum is untouched. Rows assigned to a virtual column come back as -1.

Complexity O(R^2 * (C+R)) with R=max_gt (<=32) and C=num_anchors (900): about
a megaflop per sample — noise next to the decoder itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e12)
# fp32 dual updates mix PAD_COST-scale deltas with real cost differences, so
# keep PAD_COST as small as correctness allows: real costs are clipped to
# +-1e3 (well above any focal+L1 matching cost at B2D coordinate ranges) and
# PAD_COST sits 30x above it, leaving ~1e-4 fp32 resolution on the duals.
PAD_COST = jnp.float32(3e4)
_CLIP = 1e3


def _lsa_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular assignment for one cost matrix.

    Shortest-augmenting-path with dual potentials; column 0 is a sentinel,
    real columns live at 1..C. ``p[j]`` is the row matched to column j
    (-1 = free).

    Args:
      cost: [R, C] with R <= C, finite entries.

    Returns:
      col4row [R] int32 — the column assigned to each row.
    """
    R, C = cost.shape
    cost_p = jnp.pad(cost.astype(jnp.float32), ((0, 0), (1, 0)))  # [R, C+1]

    def add_row(carry, i):
        u, v, p = carry  # u:[R], v:[C+1], p:[C+1]
        p = p.at[0].set(i)  # row i enters through the sentinel column
        minv = jnp.full((C + 1,), _INF)
        used = jnp.zeros((C + 1,), bool)
        way = jnp.zeros((C + 1,), jnp.int32)

        def cond(s):
            _, _, _, j0, _, _, p_ = s
            return p_[j0] != -1

        def body(s):
            minv, used, way, j0, u, v, p = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost_p[i0] - u[i0] - v  # reduced costs for row i0, [C+1]
            cur = jnp.where(used, _INF, cur)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Dual update: used columns' rows gain delta, used columns lose it,
            # unreached columns' tentative distances shrink by it.
            row_of_used = jnp.where(used & (p >= 0), p, R)
            u = u.at[row_of_used].add(delta, mode="drop")
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return minv, used, way, j1, u, v, p

        minv, used, way, j0, u, v, p = jax.lax.while_loop(
            cond, body, (minv, used, way, jnp.int32(0), u, v, p)
        )

        # Augment: walk the alternating path back to the sentinel.
        def aug_cond(s):
            j0, _ = s
            return j0 != 0

        def aug_body(s):
            j0, p = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        p = p.at[0].set(-1)
        return (u, v, p), None

    u0 = jnp.zeros((R,), jnp.float32)
    v0 = jnp.zeros((C + 1,), jnp.float32)
    p0 = jnp.full((C + 1,), -1, jnp.int32)
    (_, _, p), _ = jax.lax.scan(add_row, (u0, v0, p0), jnp.arange(R))

    # Invert p: column j (1-based) holding row r => col4row[r] = j - 1.
    col4row = jnp.full((R,), -1, jnp.int32)
    cols = jnp.arange(C + 1, dtype=jnp.int32)
    col4row = col4row.at[jnp.where(p >= 0, p, R)].set(
        jnp.where(p >= 0, cols - 1, -1), mode="drop"
    )
    return col4row


def assign(cost: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Batched assignment with row padding.

    Args:
      cost: [bs, R, C] cost matrices (R <= C). Non-finite entries are replaced
        by a large constant (reference does the same, `det/target.py:96-97`).
      row_mask: [bs, R] bool — True for valid ground-truth rows.

    Returns:
      col4row: [bs, R] int32, column for each row; -1 for invalid rows and for
      valid rows that could not fit on a real column (only when #valid > C).
    """
    bs, R, C = cost.shape
    cost = jnp.nan_to_num(cost, nan=_CLIP, posinf=_CLIP, neginf=-_CLIP)
    cost = jnp.clip(cost, -_CLIP, _CLIP)
    cost = jnp.where(row_mask[..., None], cost, PAD_COST)
    # Virtual columns keep the problem feasible for any row count.
    virt = jnp.full((bs, R, R), PAD_COST)
    cost = jnp.concatenate([cost, virt], axis=-1)
    col4row = jax.vmap(_lsa_single)(cost)
    return jnp.where(row_mask & (col4row < C), col4row, -1)
