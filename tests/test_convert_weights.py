"""Weight-converter tests: mmdet/torch-style state_dict -> flax tree."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import convert_weights as cw  # noqa: E402

from hipad_tpu.models.backbone import ResNetFPN  # noqa: E402


def _fake_mmdet_backbone_sd(stage_blocks=(1, 1, 1, 1), base=8, out_ch=32):
    """Random state_dict with torchvision-ResNet / mmdet-FPN names+shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".bias"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 1

    sd["img_backbone.conv1.weight"] = rng.randn(base, 3, 7, 7).astype(np.float32)
    bn("img_backbone.bn1", base)
    in_c = base
    for s, nb in enumerate(stage_blocks):
        planes = base * 2**s
        for b in range(nb):
            p = f"img_backbone.layer{s+1}.{b}"
            sd[p + ".conv1.weight"] = rng.randn(planes, in_c, 1, 1).astype(np.float32)
            bn(p + ".bn1", planes)
            sd[p + ".conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32)
            bn(p + ".bn2", planes)
            sd[p + ".conv3.weight"] = rng.randn(planes * 4, planes, 1, 1).astype(np.float32)
            bn(p + ".bn3", planes * 4)
            if b == 0:
                sd[p + ".downsample.0.weight"] = rng.randn(planes * 4, in_c, 1, 1).astype(np.float32)
                bn(p + ".downsample.1", planes * 4)
            in_c = planes * 4
    for i in range(4):
        cin = base * 4 * 2**i
        sd[f"img_neck.lateral_convs.{i}.conv.weight"] = rng.randn(out_ch, cin, 1, 1).astype(np.float32)
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = rng.randn(out_ch).astype(np.float32)
        sd[f"img_neck.fpn_convs.{i}.conv.weight"] = rng.randn(out_ch, out_ch, 3, 3).astype(np.float32)
        bn(f"img_neck.fpn_convs.{i}.bn", out_ch)
    return sd


def test_backbone_conversion_full_coverage():
    import jax
    import jax.numpy as jnp

    stage_blocks = (1, 1, 1, 1)
    sd = _fake_mmdet_backbone_sd(stage_blocks)
    n_src = len(sd)
    params, stats, leftovers = cw.convert(sd, stage_blocks)
    assert leftovers == [], leftovers  # everything consumed

    model = ResNetFPN(stage_blocks=stage_blocks, base_planes=8, out_channels=32)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 64, 96, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    tgt_params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    # converter emits the full model prefix; backbone params live under "backbone"
    merged, applied, unused = cw.merge_into(
        {"backbone": tgt_params}, params
    )
    assert not unused, unused[:5]
    tgt_stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    merged_s, applied_s, unused_s = cw.merge_into({"backbone": tgt_stats}, stats)
    assert not unused_s

    # forward with converted weights differs from init (weights really landed)
    out0 = model.apply(variables, x)
    out1 = model.apply(
        {"params": merged["backbone"], "batch_stats": merged_s["backbone"]}, x
    )
    assert not np.allclose(np.asarray(out0[0]), np.asarray(out1[0]))
    assert np.isfinite(np.asarray(out1[0])).all()


def test_conv_weight_layout():
    t = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)  # OIHW
    f = cw.conv_w(t)  # HWIO
    assert f.shape == (5, 7, 3, 2)
    assert f[1, 2, 0, 1] == t[1, 0, 1, 2]
