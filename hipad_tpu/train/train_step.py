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

    loss_fn = _make_loss_fn(cfg, model, with_depth)

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


def make_accum_train_step(cfg: HiPADConfig, model: HiPAD, accum_steps: int,
                          with_depth: bool = True):
    """Gradient accumulation: ``accum_steps`` micro-batches per optimizer
    update, for the 16 GB-HBM bs=1-per-chip regime (the reference trains
    bs=6/GPU on 24 GB 4090s, `hipad_b2d_stage2.py:7-11`; accumulation is the
    TPU counterpart for matching its global batch without more chips).

    ``batch``/``banks`` leaves carry an extra leading micro-step axis
    [A, bs, ...]. Each micro-batch is a DIFFERENT set of GroupStreamSampler
    slots (so its own bank slice carries its own sequences — accumulation
    widens the global batch, it does not advance time), grads are averaged
    over the A micro-steps (identical to DDP averaging over A× more ranks,
    up to each micro-batch computing its own loss normalizer), and AdamW
    applies once. ``lax.scan`` keeps one micro-step's activations live at a
    time — peak memory ~1/A of the fused batch.
    """
    base = _make_loss_fn(cfg, model, with_depth)

    def train_step(state: TrainState, banks, batch, rng):
        rngs = jax.random.split(rng, accum_steps)

        def one(bstats, mbanks, mbatch, mrng):
            return jax.value_and_grad(base, has_aux=True)(
                state.params, bstats, mbanks, mbatch, mrng)

        def micro(carry, inp):
            grads_acc, metrics_acc, bstats = carry
            mbatch, mbanks, mrng = inp
            (total, (losses, new_banks, new_bs)), grads = one(
                bstats, mbanks, mbatch, mrng)
            metrics = dict(losses)
            metrics["total_loss"] = total
            return (
                jax.tree.map(jnp.add, grads_acc, grads),
                jax.tree.map(jnp.add, metrics_acc, metrics),
                new_bs,
            ), new_banks

        # zero accumulators with the exact pytree structure one micro step
        # produces (abstract eval — no FLOPs)
        first_b = jax.tree.map(lambda x: x[0], batch)
        first_k = jax.tree.map(lambda x: x[0], banks)
        (t_s, (l_s, _, _)), g_s = jax.eval_shape(
            one, state.batch_stats, first_k, first_b, rngs[0])
        zeros = lambda tree: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)
        m0 = zeros(l_s)
        m0["total_loss"] = jnp.zeros(t_s.shape, t_s.dtype)

        (grads, metrics, new_bs), new_banks = jax.lax.scan(
            micro, (zeros(g_s), m0, state.batch_stats), (batch, banks, rngs))
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        metrics = {k: v * inv for k, v in metrics.items()}
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, new_banks, metrics

    return train_step


def _make_loss_fn(cfg: HiPADConfig, model: HiPAD, with_depth: bool):
    """The (params, batch_stats, banks, batch, rng) -> (total, aux) loss
    closure shared by the plain and accumulating train steps."""

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
        losses = hipad_loss.compute_losses(cfg, outputs, data,
                                           depth_preds=depth_preds)
        total = hipad_loss.total_loss(losses)
        return total, (losses, new_banks, mutated.get("batch_stats", batch_stats))

    return loss_fn


def jit_train_step(cfg, model, mesh, with_depth: bool = True,
                   donate: bool = True, accum_steps: int = 1):
    """Shard-annotated jit of the train step over a 1-D data mesh.

    ``accum_steps > 1``: batch/banks leaves gain a leading micro-step axis
    [A, bs, ...]; the per-sample batch axis (now axis 1) stays sharded over
    the mesh."""
    repl = mesh_lib.replicated(mesh)
    if accum_steps > 1:
        step = make_accum_train_step(cfg, model, accum_steps, with_depth)
        shard = mesh_lib.microbatch_sharded(mesh)
    else:
        step = make_train_step(cfg, model, with_depth)
        shard = mesh_lib.batch_sharded(mesh)
    # Bank state is per-sample (leading batch axis) -> sharded like the batch.
    return jax.jit(
        step,
        in_shardings=(repl, shard, shard, repl),
        out_shardings=(repl, shard, repl),
        donate_argnums=(0, 1) if donate else (),
    )
