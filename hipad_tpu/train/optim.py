"""Optimizer + LR schedule (reference recipe, `hipad_b2d_stage2.py:633-650`):

AdamW lr 2e-4, weight decay 1e-3, backbone lr x0.5, global-norm grad clip 25,
cosine annealing to lr*1e-3 with 500-iter linear warmup from lr/3.
"""

from __future__ import annotations

from typing import Optional

import optax


def lr_schedule(
    base_lr: float = 2e-4,
    total_steps: int = 88038,  # 234769 // 48 * 18 (stage2 config:9,653)
    warmup_iters: int = 500,
    warmup_ratio: float = 1.0 / 3,
    min_lr_ratio: float = 1e-3,
) -> optax.Schedule:
    warmup = optax.linear_schedule(
        init_value=base_lr * warmup_ratio, end_value=base_lr,
        transition_steps=warmup_iters,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(total_steps - warmup_iters, 1),
        alpha=min_lr_ratio,
    )
    return optax.join_schedules([warmup, cosine], [warmup_iters])


def make_optimizer(
    base_lr: float = 2e-4,
    total_steps: int = 88038,
    weight_decay: float = 1e-3,
    grad_clip_norm: float = 25.0,
    backbone_lr_mult: float = 0.5,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    sched = schedule or lr_schedule(base_lr, total_steps)

    def adamw(mult: float):
        return optax.adamw(
            learning_rate=lambda step: sched(step) * mult,
            b1=0.9, b2=0.999, weight_decay=weight_decay,
        )

    def label_fn(params):
        def label(path, _):
            # flax param dict: top-level module names; the backbone lives
            # under "backbone" (detector.py `setup`).
            return "backbone" if path[0].key == "backbone" else "rest"

        import jax

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.multi_transform(
            {"backbone": adamw(backbone_lr_mult), "rest": adamw(1.0)}, label_fn
        ),
    )
