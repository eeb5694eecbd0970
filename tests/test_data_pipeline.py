"""Host data-pipeline tests (pure numpy, no model)."""

import numpy as np

from hipad_tpu.data import pipelines as pp
from hipad_tpu.data.sampler import GroupStreamSampler, collate


def test_img_transform_matrix_projection_consistency():
    """A pixel tracked through the image ops must match the matrix."""
    aug = {"resize": 0.4, "resize_dims": (640, 360), "crop": (0, 8, 640, 360),
           "flip": False, "rotate": 0.0}
    m = pp.img_transform_matrix(aug)
    src = np.array([800.0, 450.0, 1.0])  # center of a 1600x900 image
    dst = m[:3, :3] @ src
    np.testing.assert_allclose(dst[:2], [800 * 0.4, 450 * 0.4 - 8], atol=1e-6)


def test_img_transform_flip():
    aug = {"resize": 1.0, "resize_dims": (100, 50), "crop": (0, 0, 100, 50),
           "flip": True, "rotate": 0.0}
    m = pp.img_transform_matrix(aug)
    dst = m[:3, :3] @ np.array([10.0, 20.0, 1.0])
    np.testing.assert_allclose(dst[:2], [90.0, 20.0], atol=1e-6)


def test_resize_crop_flip_updates_projection():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (900, 1600, 3)).astype(np.float32)] * 2
    l2i = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    aug = pp.sample_aug_config(test_mode=True)
    out, new_l2i = pp.resize_crop_flip(imgs, l2i, aug)
    assert out.shape == (2, 352, 640, 3)
    np.testing.assert_allclose(new_l2i[0], pp.img_transform_matrix(aug), atol=1e-6)


def test_photometric_distortion_consistency():
    rng = np.random.RandomState(0)
    imgs = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    params = pp.sample_distortion_params(rng, 2)
    a = pp.photometric_distortion(imgs, params)
    b = pp.photometric_distortion(imgs, params)
    np.testing.assert_allclose(a, b)  # deterministic given params
    assert a.shape == imgs.shape


def test_hsv_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 255, (4, 4, 3)).astype(np.float32)
    back = pp._hsv2bgr(pp._bgr2hsv(img))
    np.testing.assert_allclose(back, img, atol=1.0)


def test_depth_maps_projection():
    # one point 10 m in front of a pinhole camera at the origin
    l2i = np.eye(4)[None].copy()
    l2i[0, 0, 0] = l2i[0, 1, 1] = 100.0  # f=100
    l2i[0, 0, 2] = 32.0
    l2i[0, 1, 2] = 16.0
    pts = np.array([[0.0, 0.0, 10.0]])
    # project: camera looks along +z here -> use identity extrinsics
    l2i[0, 2, 2] = 1.0
    maps = pp.multiscale_depth_maps(pts, l2i, (32, 64), strides=(4,))
    d = maps[0][0]
    assert d[16 // 4, 32 // 4] == 10.0
    assert (d > 0).sum() == 1


def test_permute_line_open_and_closed():
    open_line = np.stack([np.arange(5.0), np.zeros(5)], axis=1)
    p = pp.permute_line(open_line)
    assert p.shape == (8, 5, 2)
    np.testing.assert_allclose(p[0], open_line)
    np.testing.assert_allclose(p[1], open_line[::-1])
    assert (p[2:] == 1e5).all()

    t = np.linspace(0, 2 * np.pi, 5)
    closed = np.stack([np.cos(t), np.sin(t)], axis=1)
    closed[-1] = closed[0]
    pc = pp.permute_line(closed)
    assert pc.shape == (8, 5, 2)
    for i in range(8):
        np.testing.assert_allclose(pc[i, 0], pc[i, -1], atol=1e-6)


def test_interp_polyline_arclength():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = pp.interp_polyline(line, 5)
    np.testing.assert_allclose(out[:, 0], [0, 2.5, 5, 7.5, 10], atol=1e-6)


def test_pad_gt_frame():
    frame = {
        "gt_labels_3d": np.array([1, 2]),
        "gt_bboxes_3d": np.ones((2, 9), np.float32),
        "gt_map_labels": np.array([0]),
        "gt_map_pts": np.ones((1, 38, 20, 2), np.float32),
    }
    out = pp.pad_gt_frame(frame, max_boxes=4, max_map=3)
    assert out["gt_labels_3d"].shape == (4,)
    assert out["gt_valid"].tolist() == [True, True, False, False]
    assert out["gt_map_pts"].shape == (3, 38, 20, 2)
    assert out["gt_map_valid"].tolist() == [True, False, False]


def test_group_stream_sampler_sequential_within_slot():
    """Each slot must stream its sequence's frames in order (the property the
    temporal banks rely on, `group_in_batch_sampler.py:123-171`)."""
    flags = np.array([0] * 5 + [1] * 4 + [2] * 6)
    s = GroupStreamSampler(flags, batch_size=2, seed=0, num_cams=1)
    idx_hist = [[], []]
    aug_hist = [[], []]
    epoch_hist = [[], []]
    for _ in range(12):
        reqs = next(s)
        for slot, r in enumerate(reqs):
            idx_hist[slot].append(r["idx"])
            aug_hist[slot].append(id(r["aug_config"]))
            epoch_hist[slot].append(r["epoch"])
    group_start = {g: int(np.where(flags == g)[0][0]) for g in np.unique(flags)}
    for slot in range(2):
        seq = idx_hist[slot]
        ep = epoch_hist[slot]
        for i in range(1, 12):
            if ep[i] == ep[i - 1]:  # same sequence stretch
                assert seq[i] == seq[i - 1] + 1  # in-order frames
                assert aug_hist[slot][i] == aug_hist[slot][i - 1]  # same aug
            else:
                assert seq[i] == group_start[flags[seq[i]]]  # fresh sequence


def test_collate_stacks():
    frames = [{"a": np.ones((2, 3)), "s": "x"}, {"a": np.zeros((2, 3)), "s": "y"}]
    out = collate(frames)
    assert out["a"].shape == (2, 2, 3)
    assert out["s"] == ["x", "y"]


def test_train_loader_rank_slices_partition_global_batch():
    """Multi-host slot sharding (`tools/train.py --multihost`): every rank
    builds the identically-seeded GLOBAL sampler and loads its contiguous
    slot slice — ranks' batches concatenated in process order must equal the
    single-process global batch (the reference's per-DDP-rank slot shard,
    `group_in_batch_sampler.py:123-171`)."""
    from hipad_tpu.data.sampler import TrainLoader

    class FakeDataset:
        flag = np.array([0] * 5 + [1] * 4 + [2] * 6)
        data_aug_conf = None
        keep_consistent_seq_aug = True

        def __init__(self):
            from hipad_tpu.data import pipelines as pp
            self.data_aug_conf = pp.DATA_AUG_CONF

        def __getitem__(self, req):
            return {"idx": np.int32(req["idx"])}

    def take(loader, n):
        it = iter(loader)
        return [next(it)["idx"] for _ in range(n)]

    ds = FakeDataset()
    glob = take(TrainLoader(ds, 4, seed=3), 6)
    r0 = take(TrainLoader(ds, 4, seed=3, rank=0, world=2), 6)
    r1 = take(TrainLoader(ds, 4, seed=3, rank=1, world=2), 6)
    for g, a, b in zip(glob, r0, r1):
        assert g.tolist() == a.tolist() + b.tolist()
