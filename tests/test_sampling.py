import jax
import jax.numpy as jnp
import numpy as np

from hipad_tpu.ops.sampling import deformable_aggregation


def naive_reference(feature_maps, points_2d, weights):
    """Per-sample python loop implementing the CUDA kernel semantics
    (`ops/src/deformable_aggregation_cuda.cu:129-187`)."""
    bs, A, P, C_, _ = points_2d.shape
    channels = feature_maps[0].shape[-1]
    groups = weights.shape[-1]
    gd = channels // groups
    out = np.zeros((bs, A, channels), np.float64)
    for b in range(bs):
        for a in range(A):
            for p in range(P):
                for c in range(C_):
                    lx, ly = points_2d[b, a, p, c]
                    if not (0 < lx < 1 and 0 < ly < 1):
                        continue
                    for l, fm in enumerate(feature_maps):
                        H, W = fm.shape[2], fm.shape[3]
                        px, py = lx * W - 0.5, ly * H - 0.5
                        x0, y0 = int(np.floor(px)), int(np.floor(py))
                        fx, fy = px - x0, py - y0
                        val = np.zeros(channels)
                        for dy, dx, cw in (
                            (0, 0, (1 - fy) * (1 - fx)),
                            (0, 1, (1 - fy) * fx),
                            (1, 0, fy * (1 - fx)),
                            (1, 1, fy * fx),
                        ):
                            xi, yi = x0 + dx, y0 + dy
                            if 0 <= xi < W and 0 <= yi < H:
                                val += cw * fm[b, c, yi, xi]
                        w = np.repeat(weights[b, a, p, c, l], gd)
                        out[b, a] += w * val
    return out


def _random_inputs(seed=0, bs=2, A=3, P=4, cams=2, levels=2, C=8, groups=2):
    rs = np.random.RandomState(seed)
    shapes = [(6, 8), (3, 4)][:levels]
    feats = [rs.randn(bs, cams, h, w, C).astype(np.float32) for h, w in shapes]
    pts = rs.uniform(-0.2, 1.2, (bs, A, P, cams, 2)).astype(np.float32)
    w = rs.rand(bs, A, P, cams, levels, groups).astype(np.float32)
    return feats, pts, w


def test_matches_naive_reference():
    feats, pts, w = _random_inputs()
    got = np.asarray(deformable_aggregation([jnp.asarray(f) for f in feats], jnp.asarray(pts), jnp.asarray(w)))
    want = naive_reference(feats, pts, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_out_of_bounds_is_zero():
    feats, pts, w = _random_inputs()
    pts_oob = np.full_like(pts, 1.5)
    got = np.asarray(
        deformable_aggregation([jnp.asarray(f) for f in feats], jnp.asarray(pts_oob), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_differentiable():
    feats, pts, w = _random_inputs(bs=1, A=2, P=2, cams=1, levels=1, C=4, groups=1)

    def loss(feats0, pts_, w_):
        return jnp.sum(deformable_aggregation([feats0], pts_, w_) ** 2)

    g_f, g_p, g_w = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(feats[0]), jnp.asarray(pts), jnp.asarray(w)
    )
    assert np.isfinite(np.asarray(g_f)).all()
    assert np.isfinite(np.asarray(g_p)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    assert float(jnp.abs(g_f).sum()) > 0
    assert float(jnp.abs(g_w).sum()) > 0


def test_jit_compiles():
    feats, pts, w = _random_inputs()
    fn = jax.jit(lambda f0, f1, p, ww: deformable_aggregation([f0, f1], p, ww))
    out = fn(jnp.asarray(feats[0]), jnp.asarray(feats[1]), jnp.asarray(pts), jnp.asarray(w))
    assert out.shape == (2, 3, 8)


def test_variant_parity_patch_mixed_topk():
    """All sampler backends must agree with the reference formulation."""
    from hipad_tpu.ops.sampling import (deformable_aggregation_mixed,
                                        deformable_aggregation_patch,
                                        deformable_aggregation_topk)

    rng = np.random.RandomState(7)
    bs, cams, C, G = 2, 4, 32, 4
    shapes = [(16, 24), (8, 12), (4, 6)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    A, P = 6, 5
    # each point visible in at most 2 cameras (realistic rig geometry)
    pts = np.full((bs, A, P, cams, 2), 2.0, np.float32)
    for b in range(bs):
        for a in range(A):
            for p in range(P):
                for c in rng.choice(cams, 2, replace=False):
                    pts[b, a, p, c] = rng.rand(2) * 0.9 + 0.05
    pts = jnp.asarray(pts)
    w = jnp.asarray(rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32))

    ref = deformable_aggregation(feats, pts, w)
    for got in (
        deformable_aggregation_patch(feats, pts, w),
        deformable_aggregation_mixed(feats, pts, w, matmul_levels=(1, 2)),
        deformable_aggregation_topk(feats, pts, w, cam_k=2, matmul_levels=(2,)),
        deformable_aggregation_topk(feats, pts, w, cam_k=3, matmul_levels=(1, 2)),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_model_level_sampler_parity():
    """Full tiny-model forward: production sampler == reference sampler."""
    import jax as _jax

    from hipad_tpu.configs.model import tiny
    from hipad_tpu.data import synthetic
    from hipad_tpu.models.detector import HiPAD

    cfg_ref = tiny(sampler="reference")
    cfg_fast = tiny(sampler="topk", sampler_cam_k=2, sampler_matmul_levels=(2, 3))
    batch = synthetic.make_batch(cfg_ref, 1)
    images = jnp.asarray(batch["images"])
    metas = {k: jnp.asarray(v) for k, v in batch.items() if k != "images"}
    model_ref = HiPAD(cfg_ref)
    variables = model_ref.init({"params": _jax.random.PRNGKey(0)}, images, metas,
                               train=False)
    out_ref, _ = model_ref.apply(variables, images, metas, train=False)
    out_fast, _ = HiPAD(cfg_fast).apply(variables, images, metas, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fast["plan"]["final_waypoints"]),
        np.asarray(out_ref["plan"]["final_waypoints"]), atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_fast["det"]["prediction"]),
        np.asarray(out_ref["det"]["prediction"]), atol=2e-3,
    )


def test_dense_fmap_grad_parity():
    """patch_bilinear's matmul adjoint must equal XLA's scatter adjoint.

    The production sampler computes d(feature_maps) with chunked einsums
    (see ``patch_bilinear``); the scatter formulation is ground truth.
    fp32 + HIGHEST matmul precision isolates the algorithm from bf16
    operand rounding (JAX's DEFAULT precision multiplies in bf16).
    """
    from functools import partial

    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(11)
    bs, cams, C, G = 2, 4, 32, 4
    shapes = [(16, 24), (8, 12)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    A, P = 6, 5
    pts = jnp.asarray(rng.rand(bs, A, P, cams, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32))
    key = jnp.asarray(rng.randn(bs, A, C).astype(np.float32))

    def loss(f0, f1, dense):
        out = deformable_aggregation_topk(
            [f0, f1], pts, w, cam_k=3, matmul_levels=(),
            dense_fmap_grad=dense)
        return (out * key).sum()

    with jax.default_matmul_precision("highest"):
        g_dense = jax.grad(partial(loss, dense=True), argnums=(0, 1))(*feats)
        g_scatter = jax.grad(partial(loss, dense=False), argnums=(0, 1))(*feats)
    for a, b in zip(g_dense, g_scatter):
        scale = np.abs(np.asarray(b)).max()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * scale)


def test_row_packed_parity_and_grads():
    """row_packed (one pre-packed 4C-row gather per sample) must match the
    reference formulation in both values and gradients."""
    from functools import partial

    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(13)
    bs, cams, C, G = 2, 4, 32, 4
    shapes = [(16, 24), (8, 12), (4, 6)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    A, P = 6, 5
    pts = jnp.asarray((rng.rand(bs, A, P, cams, 2) * 1.1 - 0.05).astype(np.float32))
    w = jnp.asarray(rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32))

    ref = deformable_aggregation(feats, pts, w)
    got = deformable_aggregation_topk(feats, pts, w, cam_k=4,
                                      matmul_levels=(2,), row_packed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    key = jnp.asarray(rng.randn(bs, A, C).astype(np.float32))

    w2 = w[..., :2, :]

    def loss(f0, f1, p, wts, packed):
        out = deformable_aggregation_topk(
            [f0, f1], p, wts, cam_k=4, matmul_levels=(),
            dense_fmap_grad=False, row_packed=packed)
        return (out * key).sum()

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(partial(loss, packed=False),
                         argnums=(0, 1, 2, 3))(feats[0], feats[1], pts, w2)
        g_pk = jax.grad(partial(loss, packed=True),
                        argnums=(0, 1, 2, 3))(feats[0], feats[1], pts, w2)
    for a, b in zip(g_pk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cam_k_triple_overlap_bound():
    """Near-field points inside THREE cameras: cam_k=3 is exact; cam_k=2's
    error equals the dropped camera's softmax-weighted contribution (the
    ADVICE-flagged close-range divergence — measured, not assumed)."""
    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(11)
    bs, cams, C, G = 1, 6, 32, 4
    shapes = [(16, 24), (8, 12)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    A, P = 5, 4
    pts = np.full((bs, A, P, cams, 2), 2.0, np.float32)  # out of bounds
    tri_cams = np.zeros((A, P, 3), np.int64)
    for a in range(A):
        for p in range(P):
            chosen = rng.choice(cams, 3, replace=False)
            tri_cams[a, p] = chosen
            for c in chosen:
                pts[0, a, p, c] = rng.rand(2) * 0.9 + 0.05
    ptsj = jnp.asarray(pts)
    w = rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32)
    wj = jnp.asarray(w)

    ref = np.asarray(deformable_aggregation(feats, ptsj, wj))
    k3 = np.asarray(deformable_aggregation_topk(
        feats, ptsj, wj, cam_k=3, matmul_levels=()))
    np.testing.assert_allclose(k3, ref, atol=2e-4)

    # k=2 drops exactly one in-bounds camera per point; bound its error by
    # the total dropped weight times the max feature magnitude.
    k2 = np.asarray(deformable_aggregation_topk(
        feats, ptsj, wj, cam_k=2, matmul_levels=()))
    err = np.abs(k2 - ref).max()
    assert err > 1e-6, "synthetic triple overlap must make k=2 diverge"
    # in-bounds-ness ties are broken toward the lowest camera index, so the
    # dropped camera is the largest index of each point's chosen three
    dropped_w = 0.0
    for a in range(A):
        for p in range(P):
            dropped_w = max(
                dropped_w, w[0, a, p, tri_cams[a, p].max()].sum())
    fmax = max(np.abs(np.asarray(f)).max() for f in feats)
    assert err <= dropped_w * fmax + 1e-4


def test_cam_renorm_exact_when_k_covers():
    """cam_renorm is an exact no-op when <= cam_k cameras see each point,
    and shrinks the triple-overlap error vs dropping the third camera."""
    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(13)
    bs, cams, C, G = 1, 6, 32, 4
    shapes = [(16, 24), (8, 12)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    A, P = 5, 4

    # (a) each point in at most 2 cams: renorm must change nothing
    pts = np.full((bs, A, P, cams, 2), 2.0, np.float32)
    for a in range(A):
        for p in range(P):
            for c in rng.choice(cams, 2, replace=False):
                pts[0, a, p, c] = rng.rand(2) * 0.9 + 0.05
    ptsj = jnp.asarray(pts)
    w = jnp.asarray(rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32))
    base = deformable_aggregation_topk(feats, ptsj, w, cam_k=2,
                                       matmul_levels=())
    ren = deformable_aggregation_topk(feats, ptsj, w, cam_k=2,
                                      matmul_levels=(), cam_renorm=True)
    np.testing.assert_allclose(np.asarray(ren), np.asarray(base),
                               rtol=1e-5, atol=1e-5)

    # (b) triple overlap with *consistent* multi-view content (the real
    # regime: the overlapping cameras observe the same 3D point, so their
    # sampled features agree): renormalisation recovers the dropped
    # camera's mass exactly, while raw k=2 loses it.
    feats_same = [jnp.asarray(np.broadcast_to(
        np.asarray(f)[:, :1], f.shape).copy()) for f in feats]
    pts3 = np.full((bs, A, P, cams, 2), 2.0, np.float32)
    for a in range(A):
        for p in range(P):
            loc = rng.rand(2) * 0.9 + 0.05
            for c in rng.choice(cams, 3, replace=False):
                pts3[0, a, p, c] = loc
    pts3j = jnp.asarray(pts3)
    ref = np.asarray(deformable_aggregation(feats_same, pts3j, w))
    raw = np.asarray(deformable_aggregation_topk(
        feats_same, pts3j, w, cam_k=2, matmul_levels=()))
    ren3 = np.asarray(deformable_aggregation_topk(
        feats_same, pts3j, w, cam_k=2, matmul_levels=(), cam_renorm=True))
    err_raw = np.abs(raw - ref).mean()
    err_ren = np.abs(ren3 - ref).mean()
    assert err_raw > 1e-3, err_raw
    np.testing.assert_allclose(ren3, ref, rtol=1e-4, atol=1e-4)
    assert err_ren < err_raw * 0.05, (err_ren, err_raw)


def test_point_topk_exact_when_mass_covered():
    """point_k pruning is exact when the dropped keypoints carry zero
    weight, and near-exact when they carry concentrated small mass."""
    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(17)
    bs, cams, C, G, A, P = 1, 4, 32, 4, 5, 8
    shapes = [(16, 24), (8, 12)]
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    pts = jnp.asarray(rng.uniform(0.05, 0.95, (bs, A, P, cams, 2)).astype(np.float32))
    w = rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32)
    # zero out all but 3 points per anchor
    keep = np.zeros((A, P), np.float32)
    for a in range(A):
        keep[a, rng.choice(P, 3, replace=False)] = 1.0
    w_sparse = jnp.asarray(w * keep[None, :, :, None, None, None])

    ref = deformable_aggregation(feats, pts, w_sparse)
    pruned = deformable_aggregation_topk(
        feats, pts, w_sparse, cam_k=cams, matmul_levels=(), point_k=3)
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # concentrated-but-nonzero tail: renormalised top-half stays close
    w_conc = w * (keep[None, :, :, None, None, None] + 0.02)
    w_conc = jnp.asarray(w_conc)
    ref_c = np.asarray(deformable_aggregation(feats, pts, w_conc))
    pr_c = np.asarray(deformable_aggregation_topk(
        feats, pts, w_conc, cam_k=cams, matmul_levels=(), point_k=4))
    rel = np.abs(pr_c - ref_c).mean() / (np.abs(ref_c).mean() + 1e-9)
    assert rel < 0.12, rel


def test_level_topk_exact_when_mass_covered():
    """level_k pruning of the gather levels is exact when each sample's
    weight lives on a single fine level, stays close (renormalised) under a
    small off-level tail, and is differentiable through the combined-map
    patch path."""
    from hipad_tpu.ops.sampling import deformable_aggregation_topk

    rng = np.random.RandomState(29)
    bs, cams, C, G, A, P = 1, 4, 32, 4, 5, 6
    shapes = [(16, 24), (8, 12), (4, 6)]  # two gather levels + one matmul
    feats = [jnp.asarray(rng.randn(bs, cams, h, w, C).astype(np.float32))
             for h, w in shapes]
    pts = jnp.asarray(
        rng.uniform(0.05, 0.95, (bs, A, P, cams, 2)).astype(np.float32))
    w = rng.rand(bs, A, P, cams, len(shapes), G).astype(np.float32)
    # (a) one-hot fine level per (a, p, c) sample: level_k=1 must be exact
    pick = rng.randint(0, 2, (A, P, cams))
    w_sparse = w.copy()
    for a in range(A):
        for p in range(P):
            for c in range(cams):
                w_sparse[:, a, p, c, 1 - pick[a, p, c], :] = 0.0
    w_sparse = jnp.asarray(w_sparse)

    ref = deformable_aggregation(feats, pts, w_sparse)
    pruned = deformable_aggregation_topk(
        feats, pts, w_sparse, cam_k=cams, matmul_levels=(2,), level_k=1)
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # (b) concentrated-but-nonzero off-level tail: renormalised top level
    # stays close to the exact result
    w_conc = w.copy()
    for a in range(A):
        for p in range(P):
            for c in range(cams):
                w_conc[:, a, p, c, 1 - pick[a, p, c], :] *= 0.05
    w_conc = jnp.asarray(w_conc)
    ref_c = np.asarray(deformable_aggregation(feats, pts, w_conc))
    pr_c = np.asarray(deformable_aggregation_topk(
        feats, pts, w_conc, cam_k=cams, matmul_levels=(2,), level_k=1))
    rel = np.abs(pr_c - ref_c).mean() / (np.abs(ref_c).mean() + 1e-9)
    assert rel < 0.12, rel

    # (c) level_k == n_gather_levels is a structural no-op vs level_k=None
    full = deformable_aggregation_topk(
        feats, pts, jnp.asarray(w), cam_k=cams, matmul_levels=(2,))
    lk2 = deformable_aggregation_topk(
        feats, pts, jnp.asarray(w), cam_k=cams, matmul_levels=(2,), level_k=2)
    np.testing.assert_allclose(np.asarray(lk2), np.asarray(full),
                               rtol=1e-4, atol=1e-4)

    # (d) gradients flow through the combined-map path (feature maps AND
    # weights), finite and nonzero
    def loss(f0, f1, f2, ww):
        return jnp.sum(deformable_aggregation_topk(
            [f0, f1, f2], pts, ww, cam_k=cams, matmul_levels=(2,),
            level_k=1) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(*feats, w_sparse)
    for gi in g:
        arr = np.asarray(gi)
        assert np.isfinite(arr).all()
        assert np.abs(arr).sum() > 0


def test_segment_fmap_grad_matches_dense():
    """The sort+segment feature-map adjoint (HIPAD_FMGRAD=segment) equals
    the chunked-einsum adjoint, including under adversarial concentration
    (every sample in one 8x8 patch — the case capacity-based schemes get
    wrong; this one has no capacities)."""
    from hipad_tpu.ops.sampling import _dense_fmap_grad, _segment_fmap_grad

    rng = np.random.RandomState(23)
    bs, cams, H, W, C, M = 2, 6, 24, 40, 64, 3000
    feat = jnp.zeros((bs, cams, H, W, C), jnp.float32)

    for conc in (False, True):
        if conc:
            cam = np.zeros((bs, M), np.int32)
            sy = rng.randint(0, 8, (bs, M)).astype(np.int32)
            sx = rng.randint(0, 8, (bs, M)).astype(np.int32)
        else:
            cam = rng.randint(0, cams, (bs, M)).astype(np.int32)
            sy = rng.randint(0, H - 1, (bs, M)).astype(np.int32)
            sx = rng.randint(0, W - 1, (bs, M)).astype(np.int32)
        wy = jnp.asarray(rng.rand(bs, M, 2).astype(np.float32))
        wx = jnp.asarray(rng.rand(bs, M, 2).astype(np.float32))
        g = jnp.asarray(rng.randn(bs, M, C).astype(np.float32))
        ref = np.asarray(_dense_fmap_grad(feat, jnp.asarray(cam),
                                          jnp.asarray(sy), jnp.asarray(sx),
                                          wy, wx, g))
        new = np.asarray(_segment_fmap_grad(feat, jnp.asarray(cam),
                                            jnp.asarray(sy), jnp.asarray(sx),
                                            wy, wx, g))
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(ref - new).max() / scale < 1e-4, conc
