import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.models.backbone import ResNetFPN
from hipad_tpu.models.depth_net import DenseDepthNet
from hipad_tpu.models.grid_mask import grid_mask


def test_resnet_fpn_shapes_tiny():
    # Tiny variant: 1 block/stage, width 8 — same topology, fast on CPU.
    model = ResNetFPN(stage_blocks=(1, 1, 1, 1), base_planes=8, out_channels=16)
    imgs = jnp.zeros((1, 2, 64, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    feats = model.apply(variables, imgs, train=False)
    assert len(feats) == 4
    for i, f in enumerate(feats):
        stride = 4 * 2**i
        assert f.shape == (1, 2, 64 // stride, 32 // stride, 16), f.shape


def test_resnet_fpn_train_updates_batch_stats():
    model = ResNetFPN(stage_blocks=(1, 1, 1, 1), base_planes=8, out_channels=16)
    imgs = jnp.ones((1, 1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    _, mutated = model.apply(variables, imgs, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_grid_mask_keeps_fraction_and_is_deterministic():
    imgs = jnp.ones((2, 3, 48, 48, 3))
    out1 = grid_mask(jax.random.PRNGKey(3), imgs, prob=1.0)
    out2 = grid_mask(jax.random.PRNGKey(3), imgs, prob=1.0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    frac = float(out1.mean())
    assert 0.4 < frac < 1.0  # ratio 0.5 keeps roughly >=50% (stripe union)
    # prob=0 -> identity
    out3 = grid_mask(jax.random.PRNGKey(3), imgs, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(imgs))


def test_dense_depth_net_and_loss():
    net = DenseDepthNet(num_depth_layers=2)
    feats = [jnp.ones((1, 2, 8, 8, 16)), jnp.ones((1, 2, 4, 4, 16))]
    focal = jnp.full((1, 2), 100.0)
    variables = net.init(jax.random.PRNGKey(0), feats, focal)
    depths = net.apply(variables, feats, focal)
    assert depths[0].shape == (1, 2, 8, 8, 1)
    assert float(depths[0].min()) > 0  # exp-depth is positive
    gt = [jnp.ones_like(d.squeeze(-1)) for d in depths]
    loss = net.loss(depths, gt)
    assert np.isfinite(float(loss))
