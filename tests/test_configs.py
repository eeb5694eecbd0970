"""Named config factories build and carry the reference's structural
constants (`projects/configs/hipad_b2d_stage{1,2}.py`).

Pure-host test (no jit): every named config must construct — `__post_init__`
runs all cross-field validations — and expose the documented query budget /
task structure. Guards against a refactor silently breaking a config nobody
benches on CPU (the r101 stress config only ever runs on the TPU).
"""

import numpy as np

from hipad_tpu.configs import model as cfgs


def test_stage2_structure():
    c = cfgs.stage2()
    # stage-2 query budget (`hipad_b2d_stage2.py:24-55`): det 900 + map 100
    # + plan 480 (10 groups x 48) + ego 1
    assert c.num_det_anchor == 900 and c.num_map_anchor == 100
    assert c.plan_anchor_group * c.ego_fut_cmd * c.num_temp_plan_mode == 480
    assert len(c.plan_anchor_types) == 10
    assert c.operation_order.count("refine") == 6
    assert set(c.task_select) == {"det", "map", "motion", "ego", "plan"}
    assert c.det_anchor.shape[0] == 900
    assert c.map_anchor.shape[0] == 100


def test_stage1_differences():
    c = cfgs.stage1()
    # stage 1 (`hipad_b2d_stage1.py:67,85-87`): no motion task, single plan
    # anchor type ("temp","2hz")
    assert "motion" not in c.task_select
    assert list(c.plan_anchor_types) == [("temp", "2hz")]


def test_serving_is_stage2_plus_latency_knobs():
    base, srv = cfgs.stage2(), cfgs.stage2_serving()
    assert srv.sampler_point_frac < 1.0 < base.sampler_point_frac + 1e-9
    # everything structural matches stage2 (same weights must load)
    assert srv.num_det_anchor == base.num_det_anchor
    assert srv.plan_anchor_types == base.plan_anchor_types
    assert srv.sampler_cam_k == base.sampler_cam_k


def test_serving_topk_variant():
    base, srv = cfgs.stage2(), cfgs.stage2_serving_topk()
    # serving knobs inherited, plus the reference's plan-mode pruning
    # (`sparse_onedecoder.py:982-1007`) with a valid per-refine schedule
    assert srv.sampler_point_frac < 1.0 and srv.with_topk_mode
    n_refine = srv.operation_order.count("refine")
    assert len(srv.topk_mode_list) >= n_refine
    assert srv.topk_mode_list[0] == base.ego_fut_mode  # layer 1 unpruned
    # structural parity: the same stage-2 weights must load
    assert srv.num_det_anchor == base.num_det_anchor
    assert srv.plan_anchor_types == base.plan_anchor_types
    # overrides still win over the variant's defaults
    assert cfgs.stage2_serving_topk(num_temp_plan_mode=24,
                                    topk_mode_list=(48,) * 6)\
        .num_temp_plan_mode == 24


def test_r101_2x_stress_config():
    c = cfgs.stage2_r101_2x()
    # BASELINE.json configs[4]: ResNet101 stage blocks, 2x input resolution
    assert tuple(c.backbone_stage_blocks) == (3, 4, 23, 3)
    assert tuple(c.input_size) == (704, 1280)
    # decoder structure unchanged vs stage2 (same heads/queries)
    base = cfgs.stage2()
    assert c.num_det_anchor == base.num_det_anchor and c.num_map_anchor == base.num_map_anchor


def test_tiny_builds():
    c = cfgs.tiny()
    assert c.num_det_anchor > 0
    assert np.isfinite(c.det_anchor).all()


def test_bs2_fault_fence():
    """The bs>=2 full-res + compaction + point-pruning combination hard-
    crashes the axon TPU worker (tools/repro_bs2_fault.py); the guard must
    refuse it on a TPU backend and allow every workaround."""
    import pytest

    srv = cfgs.stage2_serving()
    with pytest.raises(ValueError, match="crashes the TPU worker"):
        cfgs.assert_supported_batch(srv, 2, backend="tpu")
    # the shipped serving shape and every documented workaround pass
    cfgs.assert_supported_batch(srv, 1, backend="tpu")
    cfgs.assert_supported_batch(srv, 2, backend="cpu")
    cfgs.assert_supported_batch(cfgs.stage2_serving(input_size=(176, 320)),
                                2, backend="tpu")
    cfgs.assert_supported_batch(cfgs.stage2_serving(sampler_point_frac=1.0),
                                2, backend="tpu")
    cfgs.assert_supported_batch(cfgs.stage2_serving(sampler_cam_k=6),
                                2, backend="tpu")


def test_bench_summarize_rtt_guard():
    """bench.py's RTT-subtraction guard (the round-3 1e9-fps artifact fix).

    `summarize` must (a) subtract a healthy tunnel RTT from the frame
    median, (b) REFUSE the subtraction — raw wall rate + ``rtt_anomaly``
    flag — whenever the measured RTT exceeds half the frame median (the
    drifted-RTT regime that inflated BENCH_r03.json to 1e9 fps), and
    (c) never report a value above the raw rate in the anomalous regime.
    """
    import bench

    # healthy: 26 ms RTT against a 90 ms frame -> device estimate 1/(64 ms)
    rec = bench.summarize(times=[0.090] * 9, rtts=[0.026] * 10, bs=1)
    assert "rtt_anomaly" not in rec
    assert rec["value"] == round(1 / 0.064, 2)
    assert rec["fps_unadjusted"] == round(1 / 0.090, 2)
    assert rec["rtt_ms"] == 26.0

    # sick tunnel (the r3 regime): 172 ms RTT against a 90 ms frame.
    # Old behavior: max(med - rtt, 1e-9) -> 1e9 fps. Required behavior:
    # refuse, flag, fall back to the raw wall rate.
    rec = bench.summarize(times=[0.090] * 9, rtts=[0.172] * 10, bs=1)
    assert rec["rtt_anomaly"] is True
    assert rec["value"] == rec["fps_unadjusted"] == round(1 / 0.090, 2)
    assert rec["value"] < 100  # nothing remotely like the 1e9 artifact

    # boundary: rtt slightly over half the median still refuses; a noisy
    # single RTT spike does not (median-of-rtts absorbs it)
    assert "rtt_anomaly" in bench.summarize([0.090] * 9, [0.046] * 10, 1)
    assert "rtt_anomaly" not in bench.summarize(
        [0.090] * 9, [0.026] * 9 + [0.500], 1)

    # bs scales both rates (aggregate streams per chip)
    rec = bench.summarize(times=[0.090] * 9, rtts=[0.026] * 10, bs=2)
    assert rec["value"] == round(2 / 0.064, 2)
