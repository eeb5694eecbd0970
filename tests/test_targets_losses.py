"""Target assignment + loss machinery tests (CPU, tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from hipad_tpu.configs.model import tiny
from hipad_tpu.data import synthetic
from hipad_tpu.losses import hipad_loss
from hipad_tpu.models.detector import HiPAD
from hipad_tpu.targets import det as det_tgt
from hipad_tpu.targets import map as map_tgt
from hipad_tpu.targets import matching
from hipad_tpu.targets import plan as plan_tgt


def test_hungarian_matches_scipy_optimum():
    rng = np.random.RandomState(42)
    R, C = 16, 120
    cost = rng.randn(4, R, C).astype(np.float32) * 5
    n_valid = [0, 1, 9, 16]
    mask = np.zeros((4, R), bool)
    for b, n in enumerate(n_valid):
        mask[b, :n] = True
    got = np.asarray(matching.assign(jnp.asarray(cost), jnp.asarray(mask)))
    for b, n in enumerate(n_valid):
        assert (got[b, n:] == -1).all()
        if n == 0:
            continue
        cols = got[b, :n]
        assert len(set(cols.tolist())) == n  # one-to-one
        r, c = linear_sum_assignment(cost[b, :n])
        opt = cost[b, :n][r, c].sum()
        mine = cost[b, np.arange(n), cols].sum()
        np.testing.assert_allclose(mine, opt, atol=1e-3)


def test_det_target_assigns_close_anchors():
    """A GT box sitting exactly on an anchor must match that anchor."""
    cfg = tiny()
    bs, P, G = 2, cfg.num_det_anchor, 4
    rng = np.random.RandomState(0)
    box_pred = jnp.asarray(rng.randn(bs, P, 11).astype(np.float32))
    cls_pred = jnp.asarray(rng.randn(bs, P, cfg.num_det_classes).astype(np.float32) - 3)

    # Build GT from prediction rows 3 and 7 (decode back to 9-dim).
    from hipad_tpu.core.box3d import decode_box

    gt_rows = [3, 7]
    gt_boxes = np.zeros((bs, G, 9), np.float32)
    dec = np.asarray(decode_box(box_pred))
    gt_boxes[:, 0] = dec[:, gt_rows[0], :9]
    gt_boxes[:, 1] = dec[:, gt_rows[1], :9]
    gt_labels = np.zeros((bs, G), np.int32)
    gt_mask = np.zeros((bs, G), bool)
    gt_mask[:, :2] = True

    cls_t, box_t, rw, col4gt = det_tgt.det_target(
        cls_pred, box_pred, jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
        jnp.asarray(gt_mask), cfg.num_det_classes,
    )
    assert set(np.asarray(col4gt)[0, :2].tolist()) == set(gt_rows)
    # matched anchors get the GT label, others background
    matched = np.asarray(cls_t)[0]
    assert (matched[gt_rows] == 0).all()
    assert (np.delete(matched, gt_rows) == cfg.num_det_classes).all()
    # reg weights zero on unmatched anchors
    assert np.asarray(rw)[0].sum() > 0
    assert np.abs(np.asarray(box_t)[0][np.delete(np.arange(P), gt_rows)]).sum() == 0


def test_map_target_picks_best_permutation():
    cfg = tiny()
    bs, P, G = 1, cfg.num_map_anchor, 2
    n_pts, n_perm = cfg.map_num_pts, 6
    rng = np.random.RandomState(1)
    pts_pred = rng.randn(bs, P, n_pts * 2).astype(np.float32)
    cls_pred = rng.randn(bs, P, cfg.num_map_classes).astype(np.float32) - 3

    # GT = query 2's polyline, but stored at permutation slot 4.
    gt_pts = rng.randn(bs, G, n_perm, n_pts, 2).astype(np.float32) * 10
    gt_pts[0, 0, 4] = pts_pred[0, 2].reshape(n_pts, 2)
    gt_labels = np.zeros((bs, G), np.int32)
    gt_mask = np.array([[True, False]])

    cls_t, pts_t, rw = map_tgt.map_target(
        jnp.asarray(cls_pred), jnp.asarray(pts_pred), jnp.asarray(gt_labels),
        jnp.asarray(gt_pts), jnp.asarray(gt_mask), cfg.num_map_classes,
        cfg.map_roi_size,
    )
    np.testing.assert_allclose(np.asarray(pts_t)[0, 2], pts_pred[0, 2], atol=1e-5)
    assert np.asarray(cls_t)[0, 2] == 0


def test_plan_wta_mode_selection():
    cfg = tiny()
    bs, mode, ts = 2, 4, cfg.ego_fut_ts
    rng = np.random.RandomState(2)
    reg = rng.randn(bs, 1, mode, ts, 2).astype(np.float32)
    gt = reg[:, 0, 1]  # mode 1 is exact
    mask = np.ones((bs, ts), np.float32)
    cls = rng.randn(bs, 1, mode).astype(np.float32)
    _, cls_t, cls_w, best, _, _ = plan_tgt.sparse_plan_target(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(gt), jnp.asarray(mask),
        jnp.ones((bs, cfg.num_command)), 1, ts,
    )
    assert (np.asarray(cls_t) == 1).all()
    np.testing.assert_allclose(np.asarray(best)[:, 0], gt, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_model_outputs():
    cfg = tiny()
    bs = 2
    model = HiPAD(cfg)
    batch = synthetic.make_batch(cfg, bs)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, metas, train=False
    )
    outputs, _ = model.apply(variables, images, metas, train=False)
    return cfg, outputs, batch


def test_full_loss_finite_and_positive(tiny_model_outputs):
    cfg, outputs, batch = tiny_model_outputs
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}
    losses = hipad_loss.compute_losses(cfg, outputs, data)
    expected = {
        "det_loss_cls", "det_loss_box", "det_loss_cns", "det_loss_yns",
        "map_loss_cls", "map_loss_line", "ego_loss_status",
        "motion_loss_cls", "motion_loss_reg",
        "plan_loss_temp_cls", "plan_loss_temp_reg",
        "plan_loss_spat_cls", "plan_loss_spat_reg",
        "plan_loss_speed_cls", "plan_loss_speed_reg",
    }
    assert expected <= set(losses)
    for k, v in losses.items():
        v = float(v)
        assert np.isfinite(v), f"{k} is not finite"
        assert v >= 0, f"{k} < 0"
    assert float(hipad_loss.total_loss(losses)) > 0


def test_loss_is_differentiable(tiny_model_outputs):
    cfg, outputs, batch = tiny_model_outputs
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}

    # grad only w.r.t. float leaves (instance ids are int32)
    float_part = jax.tree_util.tree_map(
        lambda x: x if jnp.issubdtype(x.dtype, jnp.floating) else None, outputs
    )
    int_part = jax.tree_util.tree_map(
        lambda x: None if jnp.issubdtype(x.dtype, jnp.floating) else x, outputs
    )

    def merge(f, i):
        return jax.tree_util.tree_map(
            lambda a, b: a if a is not None else b, f, i,
            is_leaf=lambda x: x is None,
        )

    def f(outs_float):
        outs = merge(outs_float, int_part)
        return hipad_loss.total_loss(hipad_loss.compute_losses(cfg, outs, data))

    grads = jax.grad(f)(float_part)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
