"""Gradient accumulation: A micro-batches per optimizer update.

Spec: ``jit_train_step(accum_steps=A)`` over stacked [A, bs, ...] inputs must
equal averaging the A independent micro-batch gradients (each with its own
bank slice and loss normalizer — accumulation widens the global batch like
DDP ranks do, `apis/mmdet_train.py:97-102`) and applying AdamW once.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.configs.model import tiny
from hipad_tpu.data import synthetic
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.parallel import mesh as mesh_lib
from hipad_tpu.train import optim
from hipad_tpu.train.train_step import (_make_loss_fn, create_train_state,
                                        jit_train_step)


def test_accum_equals_mean_of_micro_grads():
    cfg = tiny()
    tx = optim.make_optimizer(total_steps=10)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)
    A, bs = 2, 2
    batches = [synthetic.make_batch(cfg, bs, seed=s) for s in range(A)]
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    banks1 = init_bank_states(cfg, bs, feature_dtype=jnp.float32)
    banks = jax.tree.map(lambda x: jnp.stack([x] * A), banks1)
    rng = jax.random.PRNGKey(3)

    mesh = mesh_lib.make_mesh(jax.devices()[:1])
    st = mesh_lib.replicate(mesh, state)
    step = jit_train_step(cfg, model, mesh, donate=False, accum_steps=A)
    new_state, new_banks, metrics = step(st, banks, stacked, rng)
    assert np.isfinite(float(metrics["total_loss"]))
    # micro-step axis preserved on the bank carries
    assert jax.tree.leaves(new_banks)[0].shape[0] == A

    # ---- reference: mean of independent micro-grads, one AdamW apply
    loss_fn = _make_loss_fn(cfg, model, with_depth=True)
    rngs = jax.random.split(rng, A)
    grads, totals = [], []
    bstats = state.batch_stats
    for a in range(A):
        mbatch = {k: v[a] for k, v in stacked.items()}
        (tot, (_, _, bstats)), g = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(state.params, bstats, banks1, mbatch, rngs[a])
        grads.append(g)
        totals.append(float(tot))
    mean_g = jax.tree.map(lambda *gs: sum(gs) / A, *grads)
    ref_state = state.apply_gradients(mean_g)

    np.testing.assert_allclose(float(metrics["total_loss"]), np.mean(totals),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
