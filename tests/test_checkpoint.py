"""Orbax checkpoint save/restore round trip (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from hipad_tpu.configs.model import tiny
from hipad_tpu.train import checkpoint, optim
from hipad_tpu.train.train_step import create_train_state


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny()
    tx = optim.make_optimizer(total_steps=10)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    checkpoint.save_checkpoint(str(tmp_path), 7, state)

    _, fresh = create_train_state(cfg, jax.random.PRNGKey(1), tx)
    restored = checkpoint.restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # params-only warm start keeps a fresh optimizer/step
    warm = checkpoint.load_params_only(str(tmp_path), fresh)
    assert int(warm.step) == int(fresh.step)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(warm.params)[0]),
        np.asarray(a[0]),
    )

    # inference-only variables (serving sweep / eval tools): same params
    # tree without constructing a train state
    variables = checkpoint.load_variables(str(tmp_path))
    assert set(variables) == {"params", "batch_stats"}
    for x, y in zip(a, jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
