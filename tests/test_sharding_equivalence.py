"""Sharded == unsharded: the DP invariant the reference gets from DDP.

The reference's mmcv DDP training is numerically identical to single-process
training on the same global batch (`apis/mmdet_train.py:97-102` — DDP only
all-reduces gradients). Our counterpart: one jitted train step whose batch is
sharded over the ``data`` mesh axis must produce the same losses / gradients
as the identical program on a 1-device mesh — in particular every loss
normalizer must be computed over the GLOBAL batch, not per-shard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipad_tpu.configs.model import stage2, tiny
from hipad_tpu.data import synthetic
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.parallel import mesh as mesh_lib
from hipad_tpu.train import optim
from hipad_tpu.train.train_step import create_train_state, jit_train_step


def test_sharded_step_equals_single_device():
    cfg = tiny()
    tx = optim.make_optimizer(total_steps=10)
    # fp32 compute: reduction-order noise stays within tight tolerances
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)
    global_bs = 8
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(cfg, global_bs).items()}
    banks = init_bank_states(cfg, global_bs, feature_dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)

    results = {}
    for name, n_dev in (("sharded", 8), ("single", 1)):
        mesh = mesh_lib.make_mesh(jax.devices()[:n_dev])
        st = mesh_lib.replicate(mesh, state)
        bt = mesh_lib.shard_batch(mesh, batch)
        bk = mesh_lib.shard_batch(mesh, banks)
        step = jit_train_step(cfg, model, mesh, donate=False)
        new_state, _, metrics = step(st, bk, bt, rng)
        results[name] = (
            {k: float(v) for k, v in metrics.items()},
            new_state.params,
        )

    m8, p8 = results["sharded"]
    m1, p1 = results["single"]
    for k in m1:
        # Discrete sensitivity: sharding changes XLA's reduction tiling,
        # which can perturb a cost matrix / argmin by ~1 ulp and flip a
        # near-tie target assignment (measured: grad_norm 0.3%,
        # motion_loss_cls 0.25%, everything else <2e-4). A real per-shard
        # normalizer bug would be off by ~n_devices (800%), far outside
        # the 1% band.
        rtol = 1e-2
        np.testing.assert_allclose(
            m8[k], m1[k], rtol=rtol, atol=1e-5,
            err_msg=f"metric {k!r} diverges between 1- and 8-device meshes "
                    "(per-shard loss normalizer?)")
    # updated parameters stay close (AdamW bounds a flipped assignment's
    # effect by ~lr per entry)
    flat8 = jax.tree_util.tree_leaves(p8)
    flat1 = jax.tree_util.tree_leaves(p1)
    # pull to host: the two trees live on different meshes
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(flat8, flat1))
    assert worst < 1e-3, f"param update divergence {worst}"


def test_stage2_shaped_sharded_train_step():
    """The DP invariant at STAGE-2 query structure: the full train step
    (forward + all losses + Hungarian targets + backward + AdamW) over the
    8-device CPU mesh equals the 1-device step — with the real 900/100/480/1
    query sections, 10 plan anchor types and the motion task, which the
    tiny() variant above does not exercise. Backbone/input are shrunk and
    the op program cut to 1 single-frame + 1 temporal layer (sections and
    both op programs are what change between tiny and stage-2; depth just
    repeats the temporal layer)."""
    cfg = stage2(
        input_size=(64, 96),
        backbone_stage_blocks=(1, 1, 1, 1),
        backbone_base_planes=16,
        backbone_remat=False,
        decoder_remat=False,
        num_temporal_layers=1,
    )
    tx = optim.make_optimizer(total_steps=10)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)
    global_bs = 8
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(cfg, global_bs).items()}
    banks = init_bank_states(cfg, global_bs, feature_dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)

    results = {}
    for name, n_dev in (("sharded", 8), ("single", 1)):
        mesh = mesh_lib.make_mesh(jax.devices()[:n_dev])
        st = mesh_lib.replicate(mesh, state)
        bt = mesh_lib.shard_batch(mesh, batch)
        bk = mesh_lib.shard_batch(mesh, banks)
        step = jit_train_step(cfg, model, mesh, donate=False)
        new_state, _, metrics = step(st, bk, bt, rng)
        results[name] = (
            {k: float(v) for k, v in metrics.items()},
            new_state.params,
        )

    m8, p8 = results["sharded"]
    m1, p1 = results["single"]
    for k in m1:
        # same discrete-sensitivity band as the tiny variant above: a real
        # per-shard normalizer bug is off by ~n_devices, not 1%
        np.testing.assert_allclose(
            m8[k], m1[k], rtol=1e-2, atol=1e-5,
            err_msg=f"metric {k!r} diverges between 1- and 8-device meshes "
                    "(per-shard loss normalizer?)")
    flat8 = jax.tree_util.tree_leaves(p8)
    flat1 = jax.tree_util.tree_leaves(p1)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(flat8, flat1))
    assert worst < 1e-3, f"param update divergence {worst}"


def test_stage2_shaped_sections_forward():
    """Stage-2 query/section structure (900/100/480/1 queries, 6 decoder
    layers, 10 plan anchor types, motion task) compiles and runs on the CPU
    mesh — catches section/shape bugs the tiny config hides. Backbone and
    input are shrunk (they don't affect decoder sections)."""
    from hipad_tpu.losses import hipad_loss
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    cfg = stage2(
        input_size=(64, 96),
        backbone_stage_blocks=(1, 1, 1, 1),
        backbone_base_planes=16,
        backbone_remat=False,
    )
    model = HiPAD(cfg, dtype=jnp.bfloat16)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def fwd_loss(variables, images, metas):
        outputs, banks = model.apply(variables, images, metas, train=False)
        data = {k: jnp.asarray(v) for k, v in batch.items()
                if k != "images"}
        to_f32 = lambda a: (a.astype(jnp.float32)
                            if jnp.issubdtype(a.dtype, jnp.floating) else a)
        losses = hipad_loss.compute_losses(
            cfg, jax.tree.map(to_f32, outputs), data)
        return hipad_loss.total_loss(losses), outputs

    total, outputs = fwd_loss(variables, images, metas)
    assert np.isfinite(float(total))
    n_plan = cfg.num_plan_anchor
    assert outputs["plan"]["final_waypoints"].shape == (
        1, n_plan, cfg.ego_fut_ts * 2)
    assert outputs["det"]["prediction"].shape[2] == cfg.num_det_anchor
