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


def _fake_stage2_decoder_sd():
    """Synthetic state_dict with the reference decoder's names and shapes
    (stage2: C=256, G=8, L=4; det P=13, map P=300, plan P=90, ego P=13)."""
    rng = np.random.RandomState(0)
    sd = {}
    H = "head.onedecoder_head."

    def lin(name, o, i):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.02

    def lin_nb(name, o, i):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.02

    def ln(name, d):
        sd[name + ".weight"] = np.ones(d, np.float32)
        sd[name + ".bias"] = np.zeros(d, np.float32)

    def mlpln(name, d, in_loops, out_loops, input_dims=None):
        i = 0
        cur = input_dims or d
        for _o in range(out_loops):
            for _k in range(in_loops):
                lin(f"{name}.{i}", d, cur)
                cur = d
                i += 2
            ln(f"{name}.{i}", d)
            i += 1
        return i

    def mha(name, d):
        sd[name + ".in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32) * 0.02
        sd[name + ".in_proj_bias"] = np.zeros(3 * d, np.float32)
        lin(name + ".out_proj", d, d)

    def conv_bn(name, c):
        sd[name + ".0.weight"] = rng.randn(c, c, 3, 3).astype(np.float32) * 0.02
        for suffix, v in ((".1.weight", np.ones(c)), (".1.bias", np.zeros(c)),
                          (".1.running_mean", np.zeros(c)),
                          (".1.running_var", np.ones(c))):
            sd[name + suffix] = v.astype(np.float32)
        sd[name + ".2.weight"] = rng.randn(c, c, 3, 3).astype(np.float32) * 0.02
        for suffix, v in ((".3.weight", np.ones(c)), (".3.bias", np.zeros(c)),
                          (".3.running_mean", np.zeros(c)),
                          (".3.running_var", np.ones(c))):
            sd[name + suffix] = v.astype(np.float32)

    C = 256
    sd[H + "det_instance_bank.anchor"] = rng.randn(900, 11).astype(np.float32)
    sd[H + "det_instance_bank.instance_feature"] = np.zeros((900, C), np.float32)
    sd[H + "map_instance_bank.anchor"] = rng.randn(100, 40).astype(np.float32)
    sd[H + "map_instance_bank.instance_feature"] = rng.randn(100, C).astype(np.float32)
    sd[H + "plan_instance_bank.plan_anchor"] = rng.randn(480, 12).astype(np.float32)
    lin_nb(H + "fc_before", 2 * C, C)
    lin_nb(H + "fc_after", C, 2 * C)
    for fc, d, ind in (("pos_fc", 128, 3), ("size_fc", 32, 3), ("yaw_fc", 32, 2),
                       ("vel_fc", 64, 3)):
        mlpln(H + f"det_anchor_encoder.{fc}", d, 1, 4, ind)
    mlpln(H + "map_anchor_encoder.pos_fc", C, 1, 2, 40)
    mlpln(H + "plan_anchor_encoder.pos_fc", C, 1, 2, 12)
    n = mlpln(H + "target_point_encoder", C, 2, 1)
    lin(H + f"target_point_encoder.{n}", C, C)
    n = mlpln(H + "command_embed_encoder", C, 2, 1, 6)
    lin(H + f"command_embed_encoder.{n}", C, C)
    n = mlpln(H + "motion_anchor_encoder", C, 1, 1)
    lin(H + f"motion_anchor_encoder.{n}", C, C)
    conv_bn(H + "ego_instance_bank.ego_feature_encoder", C)
    conv_bn(H + "plan_instance_bank.plan_feature_encoder", C)

    import convert_weights as cw
    decouple = {"gnn": (True, False), "temp_gnn": (True, False, False),
                "inter_gnn": (False,)}
    for i, op in enumerate(cw.STAGE2_OPS):
        name = H + f"layers.{i}"
        if op == "norm":
            ln(name, C)
        elif op == "ffn":
            ln(name + ".pre_norm", 2 * C)
            lin(name + ".layers.0.0", 4 * C, 2 * C)
            lin(name + ".layers.1", C, 4 * C)
            lin(name + ".identity_fc", C, 2 * C)
        elif op in decouple:
            for g, dec in enumerate(decouple[op]):
                mha(name + f".attns.{g}.attn", 2 * C if dec else C)

    kps_out = {"det": 6 * 3, "map": 20 * 5 * 3 * 2, "plan": 6 * 5 * 3 * 2,
               "ego": 12 * 3}
    pts = {"det": 13, "map": 300, "plan": 90, "ego": 13}
    for task in ("det", "map", "plan", "ego"):
        for j in range(6):
            name = H + f"{task}_deformable.{j}"
            mlpln(name + ".camera_encoder", C, 1, 2, 12)
            lin(name + ".weights_fc", 8 * 4 * pts[task], C)
            lin(name + ".output_proj", C, C)
            lin(name + ".kps_generator.learnable_fc", kps_out[task], C)

    def refine_stack(name, out_dim, num_cls, quality=False):
        n = mlpln(name + ".layers", C, 2, 2)
        lin(f"{name}.layers.{n}", out_dim, C)
        sd[f"{name}.layers.{n+1}.scale"] = np.ones(out_dim, np.float32)
        mlpln(name + ".cls_layers", C, 1, 2)
        lin(name + ".cls_layers.6", num_cls, C)
        if quality:
            mlpln(name + ".quality_layers", C, 1, 2)
            lin(name + ".quality_layers.6", 2, C)

    for j in range(6):
        refine_stack(H + f"det_refine.{j}", 11, 9, quality=True)
        refine_stack(H + f"map_refine.{j}", 40, 4)
        name = H + f"motion_refine.{j}"
        mlpln(name + ".motion_cls_branch", C, 1, 2)
        lin(name + ".motion_cls_branch.6", 1, C)
        lin(name + ".motion_reg_branch.0", C, C)
        lin(name + ".motion_reg_branch.2", C, C)
        lin(name + ".motion_reg_branch.4", 12, C)
        name = H + f"ego_refine.{j}"
        lin(name + ".plan_status_branch.0", C, C)
        lin(name + ".plan_status_branch.2", C, C)
        lin(name + ".plan_status_branch.4", 6, C)
        name = H + f"plan_refine.{j}"
        mlpln(name + ".plan_cls_branch", C, 1, 2)
        lin(name + ".plan_cls_branch.6", 1, C)
        mlpln(name + ".plan_cls_branch_speed", C, 1, 2)
        lin(name + ".plan_cls_branch_speed.6", 1, C)
        for key in ("temp_5hz", "spat_2m", "temp_2hz", "spat_5m",
                    "speed_5hz", "speed_2hz"):
            n = mlpln(name + f".plan_reg_branch_{key}", C, 2, 2)
            lin(name + f".plan_reg_branch_{key}.{n}", 12, C)
            sd[name + f".plan_reg_branch_{key}.{n+1}.scale"] = np.ones(12, np.float32)
    return sd


def test_full_stage2_decoder_mapping():
    """Every synthetic reference key must be consumed AND land on a real leaf
    of the stage-2 flax parameter tree (shape-checked by merge_into)."""
    import jax
    import jax.numpy as jnp

    from hipad_tpu.configs.model import stage2
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train.train_step import META_KEYS

    sd = _fake_stage2_decoder_sd()
    n_src = len(sd)
    params, stats, leftovers = cw.convert(sd)
    assert leftovers == [], f"unconsumed reference keys: {leftovers[:10]}"

    cfg = stage2()
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = jax.jit(lambda r: model.init(
        {"params": r}, images, metas, train=False))(jax.random.PRNGKey(0))

    tgt_params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    merged, applied, unused = cw.merge_into(tgt_params, params)
    assert not unused, f"converted keys with no flax leaf: {unused[:10]}"
    tgt_stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    _, applied_s, unused_s = cw.merge_into(tgt_stats, stats)
    assert not unused_s, unused_s[:10]
    assert len(applied) > 600  # the decoder is large
