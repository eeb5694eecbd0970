"""Jitted training step with explicit temporal-bank carry.

TPU counterpart of the reference's mmcv ``IterBasedRunner`` inner loop +
``Fp16OptimizerHook`` (`apis/mmdet_train.py:126-219`): one function
``(state, banks, batch, rng) -> (state, banks, metrics)`` that is jitted once
and runs the full forward, multi-task loss, backward, clip and AdamW update.

Differences by design:
  * no loss scaling — gradients are fp32 under bf16 compute on TPU (the
    reference needs static loss-scale 32 only because of fp16);
  * the temporal instance banks are part of the function signature, matching
    the GroupInBatchSampler training scheme where consecutive iterations see
    consecutive frames of the same sequences (SURVEY §2.7);
  * data parallelism is expressed with shardings on the jit, not a DDP
    wrapper: batch sharded over the ``data`` mesh axis, state replicated, XLA
    inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..configs.model import HiPADConfig
from ..losses import hipad_loss
from ..models.detector import HiPAD
from ..models.instance_bank import BankStates
from ..parallel import mesh as mesh_lib

META_KEYS = (
    "timestamp", "projection_mat", "image_wh", "T_global", "T_global_inv",
    "target_point", "gt_ego_fut_cmd", "focal",
)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(
    cfg: HiPADConfig,
    rng: jax.Array,
    tx: optax.GradientTransformation,
    batch_size: int = 1,
    dtype=jnp.bfloat16,
) -> Tuple[HiPAD, TrainState]:
    """``dtype`` is the *compute* dtype (activations/matmuls); params, grads
    and optimizer state stay fp32 (flax ``param_dtype`` default). bf16
    compute is the TPU counterpart of the reference's fp16 + static loss
    scale 32 recipe (`configs/*.py fp16 dict`) — bf16's exponent range makes
    the loss scale unnecessary. Pass ``dtype=None`` for full fp32."""
    from ..data import synthetic

    model = HiPAD(cfg, dtype=dtype)
    batch = synthetic.make_batch(cfg, batch_size)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False, return_depth=True))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
    return model, state


def _split_batch(batch: Dict[str, jnp.ndarray]):
    images = batch["images"]
    metas = {k: batch[k] for k in META_KEYS if k in batch}
    data = {k: v for k, v in batch.items() if k != "images"}
    return images, metas, data


def make_train_step(cfg: HiPADConfig, model: HiPAD, with_depth: bool = True):
    """Returns ``train_step(state, banks, batch, rng)``.

    ``banks=None`` (cold start / non-temporal stage) and ``banks=BankStates``
    compile as two static variants, mirroring the reference's single-frame vs
    temporal paths.
    """

    def loss_fn(params, batch_stats, banks: Optional[BankStates], batch, rng):
        images, metas, data = _split_batch(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": rng, "grid_mask": jax.random.fold_in(rng, 1)}
        (outputs, new_banks), mutated = model.apply(
            variables, images, metas, banks, train=True,
            return_depth=with_depth,
            rngs=rngs, mutable=["batch_stats"],
        )
        depth_preds = outputs.pop("depth", None)
        # Losses, target assignment and the Hungarian run in fp32 whatever
        # the model's compute dtype (bf16 cost matrices would quantize the
        # matching); the cast's transpose returns bf16 cotangents to the
        # model backward — standard mixed precision.
        to_f32 = lambda a: (a.astype(jnp.float32)
                            if jnp.issubdtype(a.dtype, jnp.floating) else a)
        outputs = jax.tree.map(to_f32, outputs)
        if depth_preds is not None:
            depth_preds = jax.tree.map(to_f32, depth_preds)
        losses = hipad_loss.compute_losses(cfg, outputs, data, depth_preds=depth_preds)
        total = hipad_loss.total_loss(losses)
        return total, (losses, new_banks, mutated.get("batch_stats", batch_stats))

    def train_step(state: TrainState, banks, batch, rng):
        (total, (losses, new_banks, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, banks, batch, rng)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, new_banks, metrics

    return train_step


def jit_train_step(cfg, model, mesh, with_depth: bool = True, donate: bool = True):
    """Shard-annotated jit of the train step over a 1-D data mesh."""
    step = make_train_step(cfg, model, with_depth)
    repl = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharded(mesh)
    # Bank state is per-sample (leading batch axis) -> sharded like the batch.
    return jax.jit(
        step,
        in_shardings=(repl, shard, shard, repl),
        out_shardings=(repl, shard, repl),
        donate_argnums=(0, 1) if donate else (),
    )
