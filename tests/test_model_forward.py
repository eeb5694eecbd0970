import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipad_tpu.configs.model import tiny
from hipad_tpu.models.detector import HiPAD


def make_metas(cfg, bs=1, t=0.0):
    rs = np.random.RandomState(0)
    proj = np.tile(np.eye(4, dtype=np.float32), (bs, cfg.num_cams, 1, 1))
    proj[:, :, 0, 0] = 50.0
    proj[:, :, 1, 1] = 50.0
    proj[:, :, 0, 2] = cfg.input_size[1] / 2
    proj[:, :, 1, 2] = cfg.input_size[0] / 2
    wh = np.tile(
        np.array([cfg.input_size[1], cfg.input_size[0]], np.float32), (bs, cfg.num_cams, 1)
    )
    cmd = np.zeros((bs, cfg.num_command), np.float32)
    cmd[:, 2] = 1.0
    return {
        "projection_mat": jnp.asarray(proj),
        "image_wh": jnp.asarray(wh),
        "timestamp": jnp.full((bs,), t, jnp.float32),
        "T_global": jnp.tile(jnp.eye(4)[None], (bs, 1, 1)),
        "T_global_inv": jnp.tile(jnp.eye(4)[None], (bs, 1, 1)),
        "gt_ego_fut_cmd": jnp.asarray(cmd),
        "target_point": jnp.asarray(rs.randn(bs, 2).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny()
    model = HiPAD(cfg)
    bs = 1
    imgs = jnp.asarray(
        np.random.RandomState(1).rand(bs, cfg.num_cams, *cfg.input_size, 3).astype(np.float32)
    )
    metas = make_metas(cfg, bs)
    variables = model.init(jax.random.PRNGKey(0), imgs, metas)
    return cfg, model, variables, imgs, metas


def test_forward_shapes(model_and_vars):
    cfg, model, variables, imgs, metas = model_and_vars
    outputs, bank_states = model.apply(variables, imgs, metas)
    L = cfg.operation_order.count("refine")
    bs = imgs.shape[0]
    assert outputs["det"]["classification"].shape == (L, bs, cfg.num_det_anchor, cfg.num_det_classes)
    assert outputs["det"]["prediction"].shape == (L, bs, cfg.num_det_anchor, 11)
    assert outputs["det"]["quality"].shape == (L, bs, cfg.num_det_anchor, 2)
    assert outputs["map"]["prediction"].shape == (L, bs, cfg.num_map_anchor, cfg.map_num_pts * 2)
    assert outputs["ego"]["status"].shape == (L, bs, 1, cfg.ego_status_dims)
    n_plan = cfg.num_plan_anchor
    assert outputs["plan"]["classification"].shape == (L, bs, 1, n_plan)
    assert outputs["plan"]["prediction"].shape == (L, bs, 1, n_plan, cfg.ego_fut_ts, 2)
    assert outputs["motion"]["prediction"].shape == (
        L, bs, cfg.num_det_anchor, cfg.fut_mode, cfg.fut_ts, 2,
    )
    # bank state shapes
    assert bank_states.det.feature.shape == (bs, cfg.num_temp_det_anchor, cfg.embed_dims)
    assert bank_states.det.anchor.shape == (bs, cfg.num_temp_det_anchor, 11)
    assert np.isfinite(np.asarray(outputs["plan"]["prediction"])).all()


def test_temporal_second_frame(model_and_vars):
    cfg, model, variables, imgs, metas = model_and_vars
    _, banks1 = model.apply(variables, imgs, metas)
    metas2 = dict(metas)
    metas2["timestamp"] = metas["timestamp"] + 0.5
    outputs2, banks2 = model.apply(variables, imgs, metas2, bank_states=banks1)
    assert np.isfinite(np.asarray(outputs2["det"]["prediction"])).all()
    # cached confidence decayed/propagated
    assert banks2.det.confidence.shape == banks1.det.confidence.shape
    # instance ids: temporal continuity — some ids survive into frame 2
    ids = np.asarray(outputs2["det"]["instance_id"])
    assert (ids >= 0).all()


def test_train_mode_runs_with_dropout(model_and_vars):
    cfg, model, variables, imgs, metas = model_and_vars
    outputs, _ = model.apply(
        variables,
        imgs,
        metas,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1), "grid_mask": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    assert np.isfinite(np.asarray(outputs["det"]["classification"])).all()
