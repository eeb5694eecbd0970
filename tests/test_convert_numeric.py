"""Numeric weight-converter parity: reference torch modules -> converter -> us.

The real ``hipad_stage2.pth`` cannot ship here (no egress), so the strongest
available evidence for the converter is end-to-end numeric: instantiate the
REFERENCE'S OWN torch modules (loaded in place from /root/reference via
tests/_reference_loader.py), randomize their weights, export their real
``state_dict()`` names, run them through the production converter
(`tools/convert_weights.convert_decoder`), load the result into our flax
modules, and assert identical outputs on random inputs. One test per
converted component family; each validates the name mapping, the layout
transforms (transpose/packing), and that our module math equals the
reference's — in a single assertion.

Reference modules covered (file:line under /root/reference):
  * SparseBox3DEncoder            det/blocks.py:23-74
  * SparsePoint3DEncoder          map/blocks.py:19-42
  * AsymmetricFFN                 blocks.py:328-396
  * packed-qkv MultiheadAttention attention.py:27-33,116-123 (torch MHA math)
  * SparseBox3DRefinementModule   det/blocks.py:77-156
  * SparsePoint3DRefinementModule map/blocks.py:80-135
  * SparseMotionRefinementModule  motion/blocks.py:16-50
  * EgoStatusRefinementModule     ego/blocks.py:60-75
  * SparsePlanAlignRefinementModule plan/blocks.py:53-158
  * DeformableFeatureAggregation keypoints + camera-softmax weights
                                  blocks.py:124-214, det/blocks.py:159-224
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import convert_weights as cw  # noqa: E402
from _reference_loader import load  # noqa: E402

from hipad_tpu.configs.model import KeypointSpec, tiny  # noqa: E402
from hipad_tpu.models import common, encoders, refine  # noqa: E402

HEAD = cw.HEAD


@pytest.fixture(scope="module")
def ref():
    return load()


@pytest.fixture(scope="module")
def cfg():
    return tiny()


def _randomize(mod, seed, skip=("fix_scale",), scale=0.6):
    """In-place uniform randomization of every state-dict entry (incl. LN
    scales/biases, which torch inits trivially) except `skip` buffers."""
    g = torch.Generator().manual_seed(seed)
    sd = mod.state_dict()
    for k, v in sd.items():
        if any(s in k for s in skip):
            continue
        if v.dtype.is_floating_point:
            sd[k] = torch.empty_like(v).uniform_(-scale, scale, generator=g)
    mod.load_state_dict(sd)
    mod.eval()
    return mod


def _convert(mod, prefix, plan_anchor_types=None,
             drop=("fix_scale", "num_batches_tracked"), with_stats=False):
    """state_dict -> convert_decoder -> our decoder-subtree params."""
    sd = {}
    for k, v in mod.state_dict().items():
        if any(s in k for s in drop):
            continue
        sd[prefix + k] = v.detach().cpu().numpy().copy()
    n_in = len(sd)
    params, stats = {}, {}
    cw.convert_decoder(sd, params, stats,
                       plan_anchor_types=plan_anchor_types)
    assert not sd, (
        f"converter left {len(sd)}/{n_in} reference keys unmapped: "
        f"{sorted(sd)[:8]}"
    )
    if with_stats:
        return params["decoder"], stats["decoder"]
    return params["decoder"]


def _t(rng, *shape):
    return torch.tensor(rng.standard_normal(shape, dtype=np.float64)
                        .astype(np.float32))


def _close(j, t, tol=2e-5):
    np.testing.assert_allclose(np.asarray(j), t.detach().numpy(),
                               rtol=tol, atol=tol)


# ---------------------------------------------------------------------------
# anchor encoders
# ---------------------------------------------------------------------------

def test_det_anchor_encoder_numeric(ref):
    mod = _randomize(ref.det_blocks.SparseBox3DEncoder(
        embed_dims=[128, 32, 32, 64], vel_dims=3, mode="cat",
        output_fc=False, in_loops=1, out_loops=4), 0)
    tree = _convert(mod, HEAD + "det_anchor_encoder.")
    rng = np.random.default_rng(0)
    x = _t(rng, 2, 7, 11)
    out_t = mod(x)
    out_j = encoders.SparseBox3DEncoder().apply(
        {"params": tree["det_anchor_encoder"]}, jnp.asarray(x.numpy()))
    _close(out_j, out_t)


def test_map_anchor_encoder_numeric(ref):
    mod = _randomize(ref.map_blocks.SparsePoint3DEncoder(
        embed_dims=256, num_sample=20, return_points_embed=True), 1)
    tree = _convert(mod, HEAD + "map_anchor_encoder.")
    rng = np.random.default_rng(1)
    x = _t(rng, 2, 4, 40)
    out_t = mod(x)[0]
    out_j = encoders.SparsePoint3DEncoder(embed_dims=256).apply(
        {"params": tree["map_anchor_encoder"]}, jnp.asarray(x.numpy()))
    _close(out_j, out_t)


# ---------------------------------------------------------------------------
# FFN / attention (operation-program layers, names indexed by position)
# ---------------------------------------------------------------------------

def test_asymmetric_ffn_numeric(ref):
    i = cw.STAGE2_OPS.index("ffn")
    mod = _randomize(ref.blocks.AsymmetricFFN(
        in_channels=512, pre_norm=dict(type="LN"), embed_dims=256,
        feedforward_channels=1024, num_fcs=2, ffn_drop=0.0), 2)
    tree = _convert(mod, HEAD + f"layers.{i}.")
    rng = np.random.default_rng(2)
    x = _t(rng, 2, 5, 512)
    out_t = mod(x)
    out_j = common.AsymmetricFFN(
        in_channels=512, embed_dims=256, feedforward_channels=1024).apply(
        {"params": tree[f"ffn_{i}"]}, jnp.asarray(x.numpy()))
    # 512->1024->256 reductions accumulate ~5e-5 fp32 ordering noise
    _close(out_j, out_t, tol=1e-4)


def test_mha_packed_qkv_numeric(ref):
    """Packed in_proj split (`attention.py:27-33`) + attention math.

    The reference's FlashMHA stores one packed ``in_proj_weight`` exactly
    like ``torch.nn.MultiheadAttention``; flash-attn itself is CUDA-only, so
    torch's reference MHA forward is the math oracle here.
    """
    i = cw.STAGE2_OPS.index("gnn")
    d, h = 256, 8
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    # +-0.6 on a 256-d projection saturates the softmax (logits O(50)),
    # turning the comparison into a near-one-hot argmax check; +-0.08 keeps
    # the attention distribution soft so the math is actually exercised.
    _randomize(mha, 3, scale=0.08)
    tree = _convert(mha, HEAD + f"layers.{i}.attns.0.attn.")

    rng = np.random.default_rng(3)
    q, qpos = _t(rng, 2, 6, d), _t(rng, 2, 6, d)
    k, kpos = _t(rng, 2, 9, d), _t(rng, 2, 9, d)
    with torch.no_grad():
        # value binds BEFORE key_pos is added (`attention.py:253-269`)
        out_t = q + mha(q + qpos, k + kpos, k, need_weights=False)[0]
    out_j = common.MultiheadAttention(embed_dims=d, num_heads=h).apply(
        {"params": tree[f"gnn_{i}"]["attn_0"]},
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
        query_pos=jnp.asarray(qpos.numpy()), key_pos=jnp.asarray(kpos.numpy()))
    _close(out_j, out_t, tol=1e-4)


# ---------------------------------------------------------------------------
# refinement heads
# ---------------------------------------------------------------------------

def test_det_refinement_numeric(ref, cfg):
    d = cfg.embed_dims
    mod = _randomize(ref.det_blocks.SparseBox3DRefinementModule(
        embed_dims=d, output_dim=11, num_cls=5, refine_yaw=True,
        with_quality_estimation=True), 4)
    tree = _convert(mod, HEAD + "det_refine.0.")
    rng = np.random.default_rng(4)
    feat, embed = _t(rng, 2, 6, d), _t(rng, 2, 6, d)
    anchor = _t(rng, 2, 6, 11)
    dt = torch.tensor([0.5, 0.25])
    with torch.no_grad():
        out_t, cls_t, q_t = mod(feat, anchor, embed, time_interval=dt)
    out_j, cls_j, q_j = refine.SparseBox3DRefinement(cfg=cfg, num_cls=5).apply(
        {"params": tree["det_refine_0"]},
        jnp.asarray(feat.numpy()), jnp.asarray(anchor.numpy()),
        jnp.asarray(embed.numpy()), jnp.asarray(dt.numpy()))
    _close(out_j, out_t)
    _close(cls_j, cls_t)
    _close(q_j, q_t)


def test_map_refinement_numeric(ref, cfg):
    d, ns = cfg.embed_dims, cfg.map_num_pts
    mod = _randomize(ref.map_blocks.SparsePoint3DRefinementModule(
        embed_dims=d, num_sample=ns, num_cls=3), 5)
    tree = _convert(mod, HEAD + "map_refine.0.")
    rng = np.random.default_rng(5)
    feat, embed = _t(rng, 2, 4, d), _t(rng, 2, 4, d)
    anchor = _t(rng, 2, 4, ns * 2)
    with torch.no_grad():
        out_t, cls_t, _ = mod(feat, anchor, embed)
    out_j, cls_j, _ = refine.SparsePoint3DRefinement(
        cfg=cfg, num_cls=3, out_dim=ns * 2).apply(
        {"params": tree["map_refine_0"]},
        jnp.asarray(feat.numpy()), jnp.asarray(anchor.numpy()),
        jnp.asarray(embed.numpy()))
    _close(out_j, out_t)
    _close(cls_j, cls_t)


def test_motion_refinement_numeric(ref, cfg):
    d = cfg.embed_dims
    mod = _randomize(ref.motion_blocks.SparseMotionRefinementModule(
        embed_dims=d, fut_ts=cfg.fut_ts, fut_mode=cfg.fut_mode), 6)
    tree = _convert(mod, HEAD + "motion_refine.0.")
    rng = np.random.default_rng(6)
    # motion_query is [bs, num_det, fut_mode, C] (4-D) in the decoder
    mq = _t(rng, 2, 5, cfg.fut_mode, d)
    with torch.no_grad():
        cls_t, reg_t = mod(mq)
    cls_j, reg_j = refine.SparseMotionRefinement(cfg=cfg).apply(
        {"params": tree["motion_refine_0"]}, jnp.asarray(mq.numpy()))
    _close(cls_j, cls_t)
    _close(reg_j, reg_t)


def test_ego_status_refinement_numeric(ref, cfg):
    d = cfg.embed_dims
    mod = _randomize(ref.ego_blocks.EgoStatusRefinementModule(
        embed_dims=d, status_dims=cfg.ego_status_dims), 7)
    tree = _convert(mod, HEAD + "ego_refine.0.")
    rng = np.random.default_rng(7)
    feat, embed = _t(rng, 2, 1, d), _t(rng, 2, 1, d)
    with torch.no_grad():
        out_t = mod(feat, embed)
    out_j = refine.EgoStatusRefinement(cfg=cfg).apply(
        {"params": tree["ego_refine_0"]},
        jnp.asarray(feat.numpy()), jnp.asarray(embed.numpy()))
    _close(out_j, out_t)


def test_plan_align_refinement_numeric(ref, cfg):
    d = cfg.embed_dims
    types = cfg.plan_anchor_types
    mod = _randomize(ref.plan_blocks.SparsePlanAlignRefinementModule(
        embed_dims=d, ego_fut_ts=cfg.ego_fut_ts, ego_fut_cmd=cfg.ego_fut_cmd,
        ego_fut_mode=cfg.ego_fut_mode, anchor_types=list(types)), 8)
    tree = _convert(mod, HEAD + "plan_refine.0.", plan_anchor_types=types)
    rng = np.random.default_rng(8)
    per = cfg.ego_fut_cmd * cfg.ego_fut_mode
    n = len(types) * per
    feat, embed = _t(rng, 2, n, d), _t(rng, 2, n, d)
    anchor = _t(rng, 2, n, cfg.ego_fut_ts * 2)
    with torch.no_grad():
        reg_t, cls_t = mod(feat, anchor, embed)
    reg_j, cls_j = refine.SparsePlanAlignRefinement(cfg=cfg).apply(
        {"params": tree["plan_refine_0"]},
        jnp.asarray(feat.numpy()), jnp.asarray(anchor.numpy()),
        jnp.asarray(embed.numpy()))
    _close(reg_j, reg_t)
    _close(cls_j, cls_t)


# ---------------------------------------------------------------------------
# front-view conv-BN feature encoder (ego/plan instance banks)
# ---------------------------------------------------------------------------

def test_front_view_encoder_numeric(ref):
    """conv-BN-conv/2-BN-ReLU-AvgPool (`ego/instance_bank.py:68-75`), incl.
    converted BatchNorm running statistics and the reference's
    kernel = pre-conv-dims // 2 pooling that DROPS the trailing row of the
    post-conv map when the stride-32 height is odd (stage-2: 11)."""
    from hipad_tpu.models.decoder import FrontViewEncoder

    d, H, W = 16, 11, 20  # stage-2-shaped stride-32 front view
    enc = torch.nn.Sequential(
        torch.nn.Conv2d(d, d, 3, stride=1, padding=1, bias=False),
        torch.nn.BatchNorm2d(d),
        torch.nn.Conv2d(d, d, 3, stride=2, padding=1, bias=False),
        torch.nn.BatchNorm2d(d),
        torch.nn.ReLU(),
        torch.nn.AvgPool2d((H // 2, W // 2)),
    )
    _randomize(enc, 10)
    with torch.no_grad():  # running_var must stay positive
        for m in enc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_var.abs_().add_(0.5)
    enc.eval()
    tree, stats = _convert(enc, HEAD + "ego_instance_bank.ego_feature_encoder.",
                           with_stats=True)

    rng = np.random.default_rng(10)
    x = _t(rng, 2, d, H, W)
    with torch.no_grad():
        out_t = enc(x).squeeze(-1).squeeze(-1)
    out_j = FrontViewEncoder(embed_dims=d).apply(
        {"params": tree["ego_feature_encoder"],
         "batch_stats": stats["ego_feature_encoder"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    _close(out_j, out_t, tol=1e-4)


def test_backbone_conv_layout_numeric():
    """`conv_w` OIHW->HWIO numeric check: torch Conv2d vs flax Conv with the
    converted kernel (stride-2, pad-3 stem geometry, `backbone.py`)."""
    import flax.linen as nn

    conv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    rng = np.random.default_rng(11)
    x = _t(rng, 2, 3, 16, 20)
    with torch.no_grad():
        out_t = conv(x)
    kernel = cw.conv_w(conv.weight.detach().numpy())
    out_j = nn.Conv(8, (7, 7), strides=(2, 2), padding=3, use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    _close(jnp.transpose(out_j, (0, 3, 1, 2)), out_t, tol=1e-4)


# ---------------------------------------------------------------------------
# deformable: keypoint generation + camera-conditioned softmax weights
# ---------------------------------------------------------------------------

def test_deformable_keypoints_and_weights_numeric(ref):
    """Validates the full ``prepare`` path against the reference DFA,
    including the positional-argument reality of `blocks.py:134`: the Box3D
    keypoint generator's learnable offsets consume the ANCHOR EMBED (the
    second positional argument lands in its ``instance_feature`` slot,
    det/blocks.py:183-188)."""
    import flax.linen as nn

    from hipad_tpu.models.deformable import DeformableAggregation
    from hipad_tpu.models.keypoints import BoxKeypoints

    d, G, L, cams = 32, 4, 2, 2
    fix = ((0.0, 0.0, 0.0), (0.45, 0.0, 0.0), (0.0, -0.45, 0.0))
    n_learn = 2
    mod = ref.blocks.DeformableFeatureAggregation(
        embed_dims=d, num_groups=G, num_levels=L, num_cams=cams,
        kps_generator=dict(type="SparseBox3DKeyPointsGenerator",
                           num_learnable_pts=n_learn, fix_scale=fix),
        use_camera_embed=True, use_deformable_func=False)
    _randomize(mod, 9)
    tree = _convert(mod, HEAD + "det_deformable.0.")

    rng = np.random.default_rng(9)
    bs, n = 2, 5
    feat = _t(rng, bs, n, d)
    embed = _t(rng, bs, n, d)
    anchor = _t(rng, bs, n, 11) * 0.5
    # simple pinhole projections, depth fixed positive
    proj = np.zeros((bs, cams, 4, 4), np.float32)
    for b in range(bs):
        for c in range(cams):
            s = 4.0 + c
            proj[b, c, 0] = [s, 0, 0, 32.0]
            proj[b, c, 1] = [0, s, 0, 24.0]
            proj[b, c, 2] = [0, 0, 0, 1.0]
            proj[b, c, 3] = [0, 0, 0, 1.0]
    wh = np.tile(np.array([64.0, 48.0], np.float32), (bs, cams, 1))

    with torch.no_grad():
        # exactly the reference call: kps_generator(anchor, anchor_embed, feat)
        kp_t = mod.kps_generator(anchor, embed, feat)
        w_t = mod._get_weights(feat, embed,
                               {"projection_mat": torch.tensor(proj)})
        pts_t = mod.project_points(kp_t, torch.tensor(proj), torch.tensor(wh))
        pts_t = pts_t.permute(0, 2, 3, 1, 4)  # [bs, n, P, cams, 2]
        w_t = w_t.permute(0, 1, 4, 2, 3, 5)   # [bs, n, P, cams, L, G]

    class Prep(nn.Module):
        @nn.compact
        def __call__(self, feat, anchor, embed, proj, wh):
            kps = BoxKeypoints(KeypointSpec(fix, n_learn), name="det_kps_0")
            dfa = DeformableAggregation(
                embed_dims=d, num_groups=G, num_levels=L, num_cams=cams,
                kps=kps, attn_drop=0.0, name="det_deformable_0")
            return dfa.prepare(feat, anchor, embed, proj, wh,
                               deterministic=True)

    pts_j, w_j = Prep().apply(
        {"params": tree},
        jnp.asarray(feat.numpy()), jnp.asarray(anchor.numpy()),
        jnp.asarray(embed.numpy()), jnp.asarray(proj), jnp.asarray(wh))
    _close(pts_j, pts_t, tol=1e-4)
    _close(w_j, w_t, tol=1e-4)
