"""Pallas dense-interp kernel vs the XLA formulation.

Runs only on a real TPU backend — the CPU test mesh (conftest) exercises the
XLA path that `interp_matmul` dispatches to there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas TPU kernel; CPU runs use the XLA path",
)


def test_pallas_interp_matches_xla():
    from hipad_tpu.ops.pallas_interp import interp_matmul_pallas
    from hipad_tpu.ops.sampling import _interp_matmul_level

    k = jax.random.PRNGKey(0)
    B, H, W, C, M, G = 6, 22, 40, 256, 1000, 8
    fm = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    px = jax.random.uniform(jax.random.fold_in(k, 1), (B, M)) * (W + 2) - 1.5
    py = jax.random.uniform(jax.random.fold_in(k, 2), (B, M)) * (H + 2) - 1.5
    wg = jax.random.uniform(jax.random.fold_in(k, 3), (B, M, G), jnp.bfloat16)

    ref = np.asarray(jax.jit(lambda *a: _interp_matmul_level(*a, G))(
        fm, px, py, wg), np.float32)
    got = np.asarray(jax.jit(lambda *a: interp_matmul_pallas(*a, G))(
        fm, px, py, wg), np.float32)
    rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 2e-2, rel
