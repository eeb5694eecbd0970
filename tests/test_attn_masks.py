"""Distance/velocity attention-bias machinery (optional feature)."""

import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.configs.model import tiny
from hipad_tpu.data import synthetic
from hipad_tpu.models import attn_masks
from hipad_tpu.models.detector import HiPAD


def test_min_distance_matrix_levels():
    bs = 1
    anchors = {
        "det": jnp.asarray([[[0.0, 0.0] + [0.0] * 9, [10.0, 0.0] + [0.0] * 9]]),
        "ego": jnp.asarray([[[0.0, 3.0] + [0.0] * 9]]),
        "map": jnp.asarray([[[0.0, 0.0, 0.0, 4.0]]]),  # 2-pt polyline
        "plan": jnp.asarray([[[1.0, 0.0, 2.0, 0.0]]]),
    }
    d = attn_masks.min_distance_matrix(("plan", "ego"), ("det", "map"), anchors)
    assert d.shape == (1, 2, 3)
    np.testing.assert_allclose(float(d[0, 0, 0]), 1.0, atol=1e-6)  # plan->det0
    np.testing.assert_allclose(float(d[0, 1, 0]), 3.0, atol=1e-6)  # ego->det0
    np.testing.assert_allclose(float(d[0, 1, 2]), 1.0, atol=1e-6)  # ego->map (min vertex)


def test_speed_diff_matrix_nonpositive():
    anchors = {
        "det": jnp.asarray(np.random.RandomState(0).randn(2, 5, 11).astype(np.float32)),
        "ego": jnp.zeros((2, 1, 11)),
    }
    dv = attn_masks.speed_diff_matrix(("ego",), ("det",), anchors)
    assert dv.shape == (2, 1, 5)
    assert float(dv.max()) <= 1e-6


def test_model_forward_with_masks_enabled():
    cfg = tiny(with_distance_attn_mask=True, with_velocity_attn_mask=True)
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, metas,
                           train=False)
    outputs, banks = model.apply(variables, images, metas, train=False)
    assert np.isfinite(np.asarray(outputs["plan"]["final_waypoints"])).all()
    # tau heads actually exist in the tree
    names = jax.tree_util.tree_leaves_with_path(variables["params"])
    keys = {"/".join(str(p) for p in path) for path, _ in names}
    assert any("distance_tau" in k for k in keys)
    assert any("velocity_tau" in k for k in keys)
