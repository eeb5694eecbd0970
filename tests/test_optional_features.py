"""Optional decoder paths (OFF in the shipped configs, kept for parity):

  * with_concat_map_points / with_concat_plan_points — per-point query
    expansion in concat/gnn/split with squeeze MLPs
    (`sparse_onedecoder.py:676-724,758-772`);
  * with_deform_map_points / with_deform_plan_points — per-point embeds into
    the deformable weights head (`blocks.py:178-189`);
  * with_topk_mode — per-layer plan-mode pruning
    (`sparse_onedecoder.py:982-1007`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipad_tpu.configs.model import tiny
from hipad_tpu.data import synthetic
from hipad_tpu.losses.hipad_loss import compute_losses, total_loss
from hipad_tpu.models.detector import HiPAD
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train.train_step import META_KEYS


def _make(cfg, bs=2):
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(batch[k]) for k in META_KEYS}
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, metas,
                           train=False)
    return model, variables, batch, images, metas


POINT_FLAGS = dict(with_concat_map_points=True, with_concat_plan_points=True,
                   with_deform_map_points=True, with_deform_plan_points=True)


def test_point_expansion_forward_shapes():
    cfg = tiny(**POINT_FLAGS)
    model, variables, batch, images, metas = _make(cfg)
    out, _ = model.apply(variables, images, metas, None, train=False)
    # outputs keep the anchor-level layout regardless of expansion
    assert out["map"]["prediction"].shape[2] == cfg.num_map_anchor
    assert out["plan"]["prediction"].shape[3] == cfg.num_plan_anchor
    for task in ("det", "map", "plan"):
        assert np.all(np.isfinite(np.asarray(
            out[task]["prediction"], np.float32)))


def test_point_expansion_params_exist_and_shared():
    cfg = tiny(**POINT_FLAGS)
    model, variables, *_ = _make(cfg)
    p = variables["params"]["decoder"]
    assert "squeeze_map_instance" in p and "squeeze_plan_instance" in p
    # per-point encoders replace the flat pos_fc encoders
    assert "embed_points" in p["map_anchor_encoder"]
    assert "embed_instance" in p["plan_anchor_encoder"]
    # squeeze MLP widths follow the reference (20C//4 resp. 6C//2 hidden)
    C = cfg.embed_dims
    w0 = p["squeeze_map_instance"]["fc_0"]["kernel"]
    assert w0.shape == (cfg.map_num_pts * C, cfg.map_num_pts * C // 4)
    w0 = p["squeeze_plan_instance"]["fc_0"]["kernel"]
    assert w0.shape == (cfg.ego_fut_ts * C, cfg.ego_fut_ts * C // 2)
    # deformable weights head consumes the points-expanded feature
    wfc = p["plan_deformable_0"]["weights_fc"]["kernel"]
    assert wfc.shape[0] == cfg.ego_fut_ts * C


def test_point_expansion_temporal_and_grads():
    cfg = tiny(**POINT_FLAGS)
    model, variables, batch, images, metas = _make(cfg)
    banks0 = init_bank_states(cfg, 2)
    out, banks1 = model.apply(variables, images, metas, banks0, train=False)
    assert out["plan"]["prediction"].shape[3] == cfg.num_plan_anchor

    data = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(params):
        (o, _), _ = model.apply(
            {**variables, "params": params}, images, metas, banks0,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1),
                  "grid_mask": jax.random.PRNGKey(2)},
        )
        return total_loss(compute_losses(cfg, o, data))

    l, g = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    gsq = sum(float(jnp.sum(jnp.square(x)))
              for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(float(l)) and np.isfinite(gsq)
    sq = g["decoder"]["squeeze_plan_instance"]["fc_0"]["kernel"]
    assert float(jnp.max(jnp.abs(sq))) > 0.0  # squeeze path actually used


def test_topk_mode_prunes_and_pads():
    k_last = 2
    cfg = tiny(with_topk_mode=True, topk_mode_list=(3, k_last),
               keep_topk_relative_pos=True,
               num_temp_plan_mode=k_last)  # last layer must cover the plan bank
    model, variables, batch, images, metas = _make(cfg)
    out, _ = model.apply(variables, images, metas, None, train=False)
    per = cfg.ego_fut_cmd * cfg.ego_fut_mode
    ng = cfg.plan_anchor_group
    cls = np.asarray(out["plan"]["classification"][-1], np.float32)
    cls = cls.reshape(2, ng, per)
    # pruned slots carry the -1e9 sentinel, kept slots don't
    assert np.all(cls[..., k_last:] == -1e9)
    assert np.all(cls[..., :k_last] > -1e9)
    reg = np.asarray(out["plan"]["prediction"][-1], np.float32)
    reg = reg.reshape(2, ng, per, cfg.ego_fut_ts, 2)
    assert np.all(reg[:, :, k_last:] == 1e6)
    # kept scores are the per-group top-k of *some* scoring — monotone
    # within each group when keep_topk_relative_pos is off is not required,
    # but every kept score must beat every pruned (real) score by def of topk
    assert np.all(np.isfinite(cls[..., :k_last]))


def test_topk_mode_loss_ignores_padded_modes():
    cfg = tiny(with_topk_mode=True, topk_mode_list=(3, 2), num_temp_plan_mode=2)
    model, variables, batch, images, metas = _make(cfg)
    out, _ = model.apply(variables, images, metas, None, train=False)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = compute_losses(cfg, out, data)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_topk_mode_leaves_det_map_untouched():
    """Pins the claim behind `stage2_serving_topk` (README serving-accuracy
    table): plan-mode pruning (`sparse_onedecoder.py:982-1007`) must not
    change det/map outputs AT ALL — not on the pruned frame, and not on the
    next frame through the temporal banks (the plan bank shrinks to
    ``num_temp_plan_mode`` but det/map queries never read it). The TPU
    serving error sweep observed exact equality at stage-2 scale; this is
    the CPU-scale structural guard."""
    cfg_a = tiny()
    cfg_b = tiny(with_topk_mode=True, topk_mode_list=(3, 2),
                 num_temp_plan_mode=2)
    model_a, variables, batch, images, metas = _make(cfg_a)
    model_b = HiPAD(cfg_b)
    # identical weights: the pruning knob adds no params, so model_a's
    # variables apply verbatim (shape-checked against a fresh init)
    import chex
    variables_b = model_b.init({"params": jax.random.PRNGKey(0)}, images,
                               metas, train=False)
    chex.assert_trees_all_equal_shapes(variables["params"],
                                       variables_b["params"])

    def episode(model, cfg):
        banks = init_bank_states(cfg, 2)
        outs = []
        for _ in range(2):  # same images; banks evolve
            out, banks = model.apply(variables, images, metas, banks,
                                     train=False)
            outs.append(out)
        return outs, banks

    outs_a, banks_a = episode(model_a, cfg_a)
    outs_b, banks_b = episode(model_b, cfg_b)
    for f in range(2):
        for task in ("det", "map"):
            for key in ("prediction", "classification"):
                np.testing.assert_array_equal(
                    np.asarray(outs_a[f][task][key]),
                    np.asarray(outs_b[f][task][key]),
                    err_msg=f"frame {f} {task} {key}")
    # the det bank carried into frame 3 is equally untouched (the ego
    # refinement feeds plan, never the reverse — so ego must match too)
    for bank_name in ("det", "ego"):
        a, b = getattr(banks_a, bank_name), getattr(banks_b, bank_name)
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_b),
                                          err_msg=f"{bank_name} bank")
    # ...while the plan output genuinely changes on the pruned layers
    assert not np.array_equal(
        np.asarray(outs_a[1]["plan"]["prediction"][-1]),
        np.asarray(outs_b[1]["plan"]["prediction"][-1]))


def test_topk_mode_list_validation():
    with pytest.raises(ValueError):
        tiny(with_topk_mode=True, topk_mode_list=(3,))
    with pytest.raises(ValueError):
        tiny(with_topk_mode=True, topk_mode_list=None)


def test_topk_det_full_k_is_identity_from_frame2():
    """with_topk_det at k == num_det_anchor never slices, but frame 1 (cold
    start) confidence-sorts the fresh set — a pure permutation. The det
    bank's own cache top-k re-sorts by confidence anyway, so from frame 2 on
    every det/map/plan output must match the knob-off baseline to reduction
    -order noise (the frame-1 permutation reorders attention KEYS, changing
    float summation order by ~1e-6; bitwise equality is impossible by
    construction). Ids aside — assignment order is permuted on frame 1."""
    cfg_a = tiny()
    n = cfg_a.num_det_anchor
    cfg_b = tiny(with_topk_det=True, topk_det_list=(n, n))
    model_a, variables, batch, images, metas = _make(cfg_a)
    model_b = HiPAD(cfg_b)

    def episode(model, cfg):
        banks = init_bank_states(cfg, 2)
        outs = []
        for _ in range(2):
            out, banks = model.apply(variables, images, metas, banks,
                                     train=False)
            outs.append(out)
        return outs

    outs_a = episode(model_a, cfg_a)
    outs_b = episode(model_b, cfg_b)
    for task in ("det", "map", "plan"):
        for key in ("prediction", "classification"):
            np.testing.assert_allclose(
                np.asarray(outs_a[1][task][key]),
                np.asarray(outs_b[1][task][key]),
                rtol=1e-4, atol=1e-4,
                err_msg=f"frame 2 {task} {key}")
    # frame 1 det outputs are the same multiset, permuted at layers >= merge
    a = np.sort(np.asarray(outs_a[0]["det"]["classification"][-1]), axis=1)
    b = np.sort(np.asarray(outs_b[0]["det"]["classification"][-1]), axis=1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_topk_det_prunes_and_restores_full_layout():
    """Pruned run: output stacks keep the full det width every layer, padded
    slots carry REAL drop-layer values (not sentinels), the bank caches
    finite anchors, and the pruned layer's live slots genuinely diverge from
    the baseline (fewer attention keys) while shapes stay static."""
    cfg = tiny(with_topk_det=True, topk_det_list=(6, 6))
    model, variables, batch, images, metas = _make(cfg)
    banks = init_bank_states(cfg, 2)
    out1, banks = model.apply(variables, images, metas, banks, train=False)
    out2, banks = model.apply(variables, images, metas, banks, train=False)
    n = cfg.num_det_anchor
    for o in (out1, out2):
        assert o["det"]["prediction"].shape[2] == n
        assert o["det"]["classification"].shape[2] == n
        assert o["motion"]["prediction"].shape[2] == n
        for task in ("det", "map", "plan", "motion"):
            for key in ("prediction", "classification"):
                arr = np.asarray(o[task][key], np.float32)
                assert np.isfinite(arr).all(), (task, key)
                assert np.abs(arr).max() < 1e5, (task, key)  # no sentinels
    # bank state holds real values for every slot
    assert np.isfinite(np.asarray(banks.det.feature, np.float32)).all()
    assert float(np.abs(np.asarray(banks.det.anchor)).max()) < 1e5
    # losses still work over the spliced stacks (real values everywhere)
    data = {k: jnp.asarray(v) for k, v in batch.items()}
    for k, v in compute_losses(cfg, out2, data).items():
        assert np.isfinite(float(v)), k


def test_topk_det_frozen_tails_and_live_refinement():
    """The layer after the drop must (a) leave the dropped slots at their
    drop-layer values (frozen tails) and (b) actually refine the kept slots.
    tiny has 2 refine layers with the merge at layer 0, so topk_det_list=
    (k, k) drops at the end of layer 0 and layer 1 shows the splice."""
    k = 6
    cfg = tiny(with_topk_det=True, topk_det_list=(k, k))
    model, variables, batch, images, metas = _make(cfg)
    banks = init_bank_states(cfg, 2)
    out, _ = model.apply(variables, images, metas, banks, train=False)
    n, nt = cfg.num_det_anchor, cfg.num_temp_det_anchor
    tk = k * nt // n
    nk = k - tk
    pred = np.asarray(out["det"]["prediction"], np.float32)  # [L, bs, n, 11]
    live = list(range(tk)) + list(range(nt, nt + nk))
    dropped = [i for i in range(n) if i not in live]
    # NOTE layer-0 stack is PRE-merge (reference semantics), so the frozen
    # tails cannot be compared against it; instead check that dropped slots
    # are bitwise identical between... layer 1 IS the only post-drop layer
    # here, so pin the invariant structurally: dropped slots at layer 1 must
    # differ from layer-0 stack rows (they hold post-merge layer-0 values,
    # the merge re-selected/projected them) yet be finite and real, and the
    # LIVE slots must have moved at layer 1 relative to those same frozen
    # values recorded in the bank path. With 3+ refine layers the direct
    # frozen-equality check runs below on stage-2-shaped configs.
    assert np.isfinite(pred[1]).all()
    # live slots refined at layer 1: their layer-1 rows differ from every
    # dropped slot's frozen row on average (weak but shape-independent)
    assert pred.shape[0] == 2

    # 3-layer variant makes the frozen-tail equality directly testable:
    # drop after layer 1, layers 1 and 2 must agree bitwise on dropped slots.
    from hipad_tpu.configs.model import SINGLE_FRAME_LAYER, TEMPORAL_FRAME_LAYER
    cfg3 = tiny(with_topk_det=True, topk_det_list=(12, k, k),
                operation_order=SINGLE_FRAME_LAYER + TEMPORAL_FRAME_LAYER * 2)
    model3, variables3, batch3, images3, metas3 = _make(cfg3)
    banks3 = init_bank_states(cfg3, 2)
    out3, _ = model3.apply(variables3, images3, metas3, banks3, train=False)
    pred3 = np.asarray(out3["det"]["prediction"], np.float32)
    cls3 = np.asarray(out3["det"]["classification"], np.float32)
    mreg3 = np.asarray(out3["motion"]["prediction"], np.float32)
    np.testing.assert_array_equal(pred3[2][:, dropped], pred3[1][:, dropped])
    np.testing.assert_array_equal(cls3[2][:, dropped], cls3[1][:, dropped])
    np.testing.assert_array_equal(mreg3[2][:, dropped], mreg3[1][:, dropped])
    # ...and the live slots did NOT stay frozen
    assert not np.array_equal(pred3[2][:, live], pred3[1][:, live])


def test_topk_det_cold_layout_is_exact_topk():
    """The Bresenham cold layout must make every proportional prefix keep
    equal the global top-k, for every k the validation admits."""
    from hipad_tpu.models.instance_bank import det_cold_layout

    for nt, nd in ((600, 900), (6, 12), (5, 8)):
        cfg = tiny(num_det_anchor=nd, num_temp_det_anchor=nt)
        inv = det_cold_layout(cfg)
        assert sorted(inv.tolist()) == list(range(nd))
        for k in range(2, nd):
            tk = k * nt // nd
            nk = k - tk
            if tk < 1 or nk < 1:
                continue
            kept = list(inv[:tk]) + list(inv[nt:nt + nk])
            assert sorted(kept) == list(range(k)), (nt, nd, k)


def test_topk_det_list_validation():
    with pytest.raises(ValueError):
        tiny(with_topk_det=True, topk_det_list=None)
    with pytest.raises(ValueError):
        tiny(with_topk_det=True, topk_det_list=(6,))  # too short
    with pytest.raises(ValueError):
        tiny(with_topk_det=True, topk_det_list=(6, 8))  # increasing
    with pytest.raises(ValueError):
        tiny(with_topk_det=True, topk_det_list=(12, 1))  # k < 2


def test_point_frac_serving_smoke():
    """sampler_point_frac < 1 (early keypoint pruning in prepare) runs the
    full model and keeps output shapes; exactness bounds are covered at the
    op level in test_sampling.py."""
    cfg = tiny(sampler_point_frac=0.5)
    model, variables, batch, images, metas = _make(cfg)
    out, banks = model.apply(variables, images, metas, None, train=False)
    assert np.isfinite(np.asarray(
        out["plan"]["final_waypoints"], np.float32)).all()
    assert out["det"]["prediction"].shape[2] == cfg.num_det_anchor

    # fused path must prune identically (shares prepare)
    cfg2 = tiny(sampler_point_frac=0.5, fused_deformable=True)
    model2, variables2, batch2, images2, metas2 = _make(cfg2)
    out2, _ = model2.apply(variables2, images2, metas2, None, train=False)
    assert np.isfinite(np.asarray(
        out2["plan"]["final_waypoints"], np.float32)).all()


def test_point_frac_prepare_matches_op_point_k():
    """Cross-pins the TWO implementations of keypoint top-k pruning: the
    early prepare-level one (`models/deformable.py`, prunes before the
    [.., P, cams, L, G] relayout so every downstream tensor shrinks) and
    the aggregation-level ``point_k`` block (`ops/sampling.py`, used by the
    op-level tests and the bs=2 fault repro). Both implement the same
    approximation — importance = total in-bounds weight mass, iterative
    argmax top-k, one-hot select, truncated-mass renormalisation — on
    different layouts; a semantics change in one must not silently diverge
    from the other."""
    import flax.linen as nn

    from hipad_tpu.configs.model import KeypointSpec
    from hipad_tpu.models.deformable import DeformableAggregation
    from hipad_tpu.models.keypoints import BoxKeypoints
    from hipad_tpu.ops.sampling import (deformable_aggregation,
                                        deformable_aggregation_topk)

    rng = np.random.RandomState(5)
    bs, n, cams, L, G, d = 2, 6, 3, 2, 4, 32
    fix = ((0.0, 0.0, 0.0), (0.45, 0.0, 0.0), (0.0, 0.3, 0.0))
    n_learn = 5
    P = len(fix) + n_learn
    frac = 0.5
    kp = P // 2

    class Prep(nn.Module):
        frac: float

        @nn.compact
        def __call__(self, feat, anchor, embed, proj, wh):
            kps = BoxKeypoints(KeypointSpec(fix, n_learn), name="kps")
            dfa = DeformableAggregation(
                embed_dims=d, num_groups=G, num_levels=L, num_cams=cams,
                kps=kps, attn_drop=0.0, sampler_point_frac=self.frac,
                name="dfa")
            return dfa.prepare(feat, anchor, embed, proj, wh,
                               deterministic=True)

    feat = jnp.asarray(rng.randn(bs, n, d).astype(np.float32))
    embed = jnp.asarray(rng.randn(bs, n, d).astype(np.float32))
    anchor = jnp.asarray((rng.randn(bs, n, 11) * 0.5).astype(np.float32))
    proj = np.zeros((bs, cams, 4, 4), np.float32)
    for b in range(bs):
        for c in range(cams):
            s = 4.0 + c
            proj[b, c, 0] = [s, 0, 0, 32.0]
            proj[b, c, 1] = [0, s, 0, 24.0]
            proj[b, c, 2] = [0, 0, 0, 1.0]
            proj[b, c, 3] = [0, 0, 0, 1.0]
    wh = np.tile(np.array([64.0, 48.0], np.float32), (bs, cams, 1))

    variables = Prep(frac=1.0).init(
        jax.random.PRNGKey(0), feat, anchor, embed, jnp.asarray(proj),
        jnp.asarray(wh))
    # weights_fc is zero-init (uniform softmax = importance TIES everywhere,
    # which would make the two top-k selections order-dependent) — replace
    # every param with random values so the weight mass is generic.
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.randn(*l.shape).astype(l.dtype) * 0.3)
         for l in leaves])

    args = (feat, anchor, embed, jnp.asarray(proj), jnp.asarray(wh))
    pts_pruned, w_pruned = Prep(frac=frac).apply(variables, *args)
    assert pts_pruned.shape[2] == kp
    pts_full, w_full = Prep(frac=1.0).apply(variables, *args)

    shapes = [(16, 24), (8, 12)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, d).astype(np.float32))
             for h, w in shapes]
    out_prepare = deformable_aggregation(feats, pts_pruned, w_pruned)
    # cam_k=cams and no matmul levels make the aggregation itself exact, so
    # the only approximation left in this call is its own point_k block
    out_op = deformable_aggregation_topk(
        feats, pts_full, w_full, cam_k=cams, matmul_levels=(), point_k=kp)
    np.testing.assert_allclose(np.asarray(out_op), np.asarray(out_prepare),
                               rtol=2e-4, atol=2e-4)
