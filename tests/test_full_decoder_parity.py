"""END-TO-END decoder parity: the reference's full SparseOneDecoder vs ours.

This is the strongest checkpoint-parity evidence available without the real
``hipad_stage2.pth`` (which cannot ship here): the reference's OWN 1606-line
unified decoder (`models/sparse_onedecoder.py`), instantiated from the
reference's OWN stage-2 config file (`projects/configs/hipad_b2d_stage2.py`,
exec'd with only path/scale/size substitutions), with randomized weights,
run on CPU torch — against our flax `SparseOneDecoder` loaded with the SAME
weights through the production converter (`tools/convert_weights.py`).

Covers in one numeric assertion per output family: the op-program loop
(concat/gnn/inter_gnn/temp_gnn/norm/split/deformable/ffn/refine), all four
instance banks (det/map/ego/plan) including the frame-2 temporal path
(SE(3) anchor projection, top-k merge, confidence decay), anchor encoders,
camera-conditioned deformable sampling, all five refinement heads, motion
anchors, command/target-point embeds, and the converter's name/layout map.

Alignment choices (each is a documented equivalence, not a fudge):
  * flash-attn is exact softmax attention — `_reference_loader.load_onedecoder`
    replaces the CUDA kernel with the same math on CPU.
  * the reference's CUDA sampler is replaced by its own torch grid_sample
    fallback (`use_deformable_func=False`, `blocks.py:227-264`); our sampler's
    only documented divergence from it is the out-of-image boundary band, so
    the test zeroes a 1-pixel border on every feature-map level, which makes
    zeros-padding (torch) and validity-masking (ours) agree exactly.
  * cam_k is set to num_cams (every camera sampled — the exact-semantics
    configuration; the serving cam-top-k knobs have their own error-bound
    tests in test_sampling.py).
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import convert_weights as cw  # noqa: E402
from _reference_loader import load_onedecoder  # noqa: E402

from hipad_tpu.configs.model import stage2  # noqa: E402
from hipad_tpu.models.decoder import SparseOneDecoder  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CFG = "/root/reference/projects/configs/hipad_b2d_stage2.py"

BS = 1
H, W = 128, 256  # reduced input; feature pyramid at strides 4/8/16/32
CAMS = 6


def _exec_reference_config():
    """Exec the reference stage-2 config (plain dict assignments, no imports)
    with the anchor directory redirected at our byte-identical kmeans assets."""
    txt = open(REF_CFG).read()
    txt = txt.replace('project_dir = "/opt/data/private/project/HiP-AD"',
                      f'project_dir = "{REPO_ROOT}"')
    ns = {}
    exec(compile(txt, REF_CFG, "exec"), ns)
    return ns


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _projection_mats():
    """Six yaw-spaced pinholes looking outward along the rotated +x axis."""
    f = 0.5 * W
    cx, cy = W / 2.0, H / 2.0
    mats = []
    for c in range(CAMS):
        E = np.eye(4)
        E[:3, :3] = _rot_z(-2.0 * np.pi * c / CAMS)  # world -> cam
        P = np.array([
            [cx, -f, 0.0, 0.0],   # u*w = cx*x' - f*y'
            [cy, 0.0, -f, 0.0],   # v*w = cy*x' - f*z'
            [1.0, 0.0, 0.0, 0.0],  # w = x' (forward depth)
            [0.0, 0.0, 0.0, 1.0],
        ])
        mats.append((P @ E).astype(np.float32))
    return np.stack(mats)  # [cams, 4, 4]


def _frame_metas(t, T_global):
    proj = np.tile(_projection_mats()[None], (BS, 1, 1, 1))
    wh = np.tile(np.array([W, H], np.float32), (BS, CAMS, 1))
    rs = np.random.RandomState(7)
    cmd = np.zeros((BS, 6), np.float32)
    cmd[:, 2] = 1.0
    target = rs.uniform(-5, 5, (BS, 2)).astype(np.float32)
    Tg = T_global.astype(np.float32)
    Tg_inv = np.linalg.inv(Tg).astype(np.float32)

    t_metas = {
        "projection_mat": torch.tensor(proj),
        "image_wh": torch.tensor(wh),
        "timestamp": torch.full((BS,), float(t)),
        "img_metas": [{"T_global": Tg, "T_global_inv": Tg_inv}
                      for _ in range(BS)],
        "target_point": torch.tensor(target),
        "gt_ego_fut_cmd": torch.tensor(cmd),
    }
    j_metas = {
        "projection_mat": jnp.asarray(proj),
        "image_wh": jnp.asarray(wh),
        "timestamp": jnp.full((BS,), float(t), jnp.float32),
        "T_global": jnp.tile(jnp.asarray(Tg)[None], (BS, 1, 1)),
        "T_global_inv": jnp.tile(jnp.asarray(Tg_inv)[None], (BS, 1, 1)),
        "target_point": jnp.asarray(target),
        "gt_ego_fut_cmd": jnp.asarray(cmd),
    }
    return t_metas, j_metas


def _feature_maps(seed):
    """Per-level multi-view features with a ZEROED 1-pixel border so torch
    grid_sample's zeros-padding and our validity masking agree exactly."""
    rs = np.random.RandomState(seed)
    t_fms, j_fms = [], []
    for stride in (4, 8, 16, 32):
        h, w = H // stride, W // stride
        fm = rs.randn(BS, CAMS, 256, h, w).astype(np.float32) * 0.5
        fm[..., 0, :] = 0.0
        fm[..., -1, :] = 0.0
        fm[..., :, 0] = 0.0
        fm[..., :, -1] = 0.0
        t_fms.append(torch.tensor(fm))
        j_fms.append(jnp.asarray(np.transpose(fm, (0, 1, 3, 4, 2))))  # NHWC
    return t_fms, j_fms


def _randomize_converted(dec, converted, seed=0):
    """Randomize exactly the state-dict entries the converter maps; leave
    unconverted buffers (kps fix scales, ego/motion anchor constants,
    num_batches_tracked) at their reference-initialized values, which our
    side reproduces from config constants."""
    gen = torch.Generator().manual_seed(seed)
    sd = dec.state_dict()
    with torch.no_grad():
        for name, t in sd.items():
            if cw.HEAD + name not in converted:
                continue
            if name == "motion_anchor":
                # popped by the converter as a CONSTANT (identical kmeans
                # asset on our side), not mapped to a parameter
                continue
            if not torch.is_floating_point(t):
                continue
            if name.endswith("running_var"):
                t.copy_(torch.rand(t.shape, generator=gen) * 0.5 + 0.75)
            else:
                t.copy_((torch.rand(t.shape, generator=gen) - 0.5) * 0.6)


@pytest.fixture(scope="module")
def both():
    ns = load_onedecoder()
    cfgns = _exec_reference_config()
    head = cfgns["model"]["head"]["onedecoder_head"]

    # ---- reference-side config surgery (documented in the module docstring)
    registries = sys.modules["mmcv.cnn.bricks.registry"]
    samplers = sys.modules["mmdet.core.bbox.builder"].BBOX_SAMPLERS
    coders = sys.modules["mmdet.core.bbox.builder"].BBOX_CODERS

    class _StubSampler:
        dn_metas = None

        def __init__(self, **kw):
            pass

    class _StubCoder:
        def __init__(self, **kw):
            self.score_threshold = kw.get("score_threshold", 0.05)

    samplers.modules.setdefault("_StubSampler", _StubSampler)
    coders.modules.setdefault("_StubCoder", _StubCoder)

    score_thr = (head.get("det_decoder") or {}).get("score_threshold", 0.05)
    for k in list(head):
        if k.startswith("loss_"):
            head[k] = None
    for k in ("det_sampler", "map_sampler", "plan_sampler", "align_sampler",
              "motion_sampler"):
        head[k] = dict(type="_StubSampler")
    head["det_decoder"] = dict(type="_StubCoder", score_threshold=score_thr)
    for k in ("map_decoder", "ego_decoder", "plan_decoder", "motion_decoder"):
        head[k] = None
    for k in ("det_deformable", "map_deformable", "ego_deformable",
              "plan_deformable"):
        head[k]["use_deformable_func"] = False  # torch grid_sample fallback
    # 2 layers (1 single-frame + 1 temporal) keep CPU compile sane while
    # still covering both op programs
    head["operation_order"] = (cfgns["single_frame_layer"]
                               + cfgns["temporal_frame_layer"])
    head["num_decoder"] = 2
    # reduced input size: banks' front-view pool kernel derives from it
    for bank in ("ego_instance_bank", "plan_instance_bank"):
        head[bank]["feature_map_scale"] = (H / 32, W / 32)
    head.pop("type")

    tdec = ns.onedecoder.SparseOneDecoder(**head)
    tdec.eval()
    tdec.init_instance_bank_list()

    # ---- which keys does the converter own?
    op_order = tuple(head["operation_order"])
    sd_probe = {cw.HEAD + k: v.detach().numpy().copy()
                for k, v in tdec.state_dict().items()}
    probe_p, probe_s = {}, {}
    cw.convert_decoder(sd_probe, probe_p, probe_s, operation_order=op_order)
    converted = {cw.HEAD + k for k in tdec.state_dict()} - set(sd_probe)

    _randomize_converted(tdec, converted)
    sd = {cw.HEAD + k: v.detach().numpy().copy()
          for k, v in tdec.state_dict().items()}
    params, stats = {}, {}
    cw.convert_decoder(sd, params, stats, operation_order=op_order)

    # ---- our side
    cfg = stage2(
        num_temporal_layers=1,
        input_size=(H, W),
        sampler_cam_k=CAMS,      # exact semantics: every camera sampled
        sampler_point_frac=1.0,
        decoder_remat=False,
    )
    ours = SparseOneDecoder(cfg)
    t_fms1, j_fms1 = _feature_maps(11)
    t_metas1, j_metas1 = _frame_metas(10.0, np.eye(4))

    variables = jax.jit(ours.init)(jax.random.PRNGKey(0), j_fms1, j_metas1)

    tgt_params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    merged, applied, unused = cw.merge_into({"decoder": tgt_params},
                                            params)
    assert not unused, f"converted params with no destination: {unused[:8]}"
    new_vars = {"params": merged["decoder"]}
    if "batch_stats" in variables:
        tgt_stats = jax.tree_util.tree_map(np.asarray,
                                           dict(variables["batch_stats"]))
        merged_s, _, unused_s = cw.merge_into({"decoder": tgt_stats}, stats)
        assert not unused_s, f"unused batch stats: {unused_s[:8]}"
        new_vars["batch_stats"] = merged_s["decoder"]

    apply = jax.jit(lambda v, f, m, b: ours.apply(v, f, m, bank_states=b))

    # ---- frame 1
    with torch.no_grad():
        ref1 = tdec(torch.zeros(BS), t_fms1, t_metas1)
    out1, banks1 = apply(new_vars, j_fms1, j_metas1, None)

    # ---- frame 2: ego moved 1.5m forward, 0.1 rad yaw, 0.5s later
    Tg2 = np.eye(4)
    Tg2[:3, :3] = _rot_z(0.1)
    Tg2[0, 3], Tg2[1, 3] = 1.5, 0.3
    t_fms2, j_fms2 = _feature_maps(23)
    t_metas2, j_metas2 = _frame_metas(10.5, Tg2)
    with torch.no_grad():
        ref2 = tdec(torch.zeros(BS), t_fms2, t_metas2)
    out2, _ = apply(new_vars, j_fms2, j_metas2, banks1)

    return ref1, out1, ref2, out2


def _cmp(ref_list, ours_stacked, label, atol):
    """ref: list of per-layer torch tensors; ours: [L, ...] jnp array."""
    ours = np.asarray(ours_stacked)
    assert len(ref_list) == ours.shape[0], label
    for layer, r in enumerate(ref_list):
        r = r.detach().numpy()
        o = ours[layer].reshape(r.shape)
        err = np.max(np.abs(r - o))
        assert err <= atol, f"{label} layer {layer}: max|Δ|={err:.2e}"


def _cmp_rows(ref_list, ours_stacked, label, atol, max_bad_frac=0.06):
    """Frame-2 comparison robust to near-tie top-k ORDER swaps.

    The det bank caches the top-600 of 900 instances sorted by confidence.
    With randomized weights the sorted confidences are ~8e-4 apart while the
    two implementations' logits agree only to float-reduction noise (~1e-4),
    so a handful of adjacent cache slots legitimately swap — each swap puts a
    *different instance* in a slot, a large positional diff that says nothing
    about the math. A real wiring bug breaks EVERY row; swaps touch a few.
    Assert: per-instance rows agree to ``atol`` except <= ``max_bad_frac``,
    and the overall median is at float-noise level."""
    ours = np.asarray(ours_stacked)
    assert len(ref_list) == ours.shape[0], label
    for layer, r in enumerate(ref_list):
        r = r.detach().numpy()
        o = ours[layer].reshape(r.shape)
        d = np.abs(r - o)
        row = d.reshape(d.shape[0], d.shape[1], -1).max(-1)  # [bs, inst]
        bad = float((row > atol).mean())
        med = float(np.median(d))
        assert bad <= max_bad_frac and med <= 1e-5, (
            f"{label} layer {layer}: {bad*100:.2f}% rows >|{atol}|, "
            f"median={med:.2e}")


FAMILIES = [
    # (task, ref key, our key, atol)
    ("det", "classification", "classification", 2e-3),
    ("det", "prediction", "prediction", 2e-3),
    ("det", "quality", "quality", 2e-3),
    ("map", "classification", "classification", 2e-3),
    ("map", "prediction", "prediction", 2e-3),
    ("ego", "status", "status", 2e-3),
    ("plan", "classification", "classification", 2e-3),
    ("plan", "prediction", "prediction", 2e-3),
    ("motion", "classification", "classification", 2e-3),
    ("motion", "prediction", "prediction", 2e-3),
]

TASK_INDEX = {"det": 0, "map": 1, "ego": 2, "plan": 3, "motion": 4}


@pytest.mark.parametrize("task,rkey,okey,atol", FAMILIES)
def test_frame1_outputs(both, task, rkey, okey, atol):
    ref1, out1, _, _ = both
    _cmp(ref1[TASK_INDEX[task]][rkey], out1[task][okey],
         f"frame1 {task}.{okey}", atol)


@pytest.mark.parametrize("task,rkey,okey,atol", FAMILIES)
def test_frame2_temporal_outputs(both, task, rkey, okey, atol):
    _, _, ref2, out2 = both
    _cmp_rows(ref2[TASK_INDEX[task]][rkey], out2[task][okey],
              f"frame2 {task}.{okey}", atol)


def test_frame2_instance_ids_match(both):
    _, _, ref2, out2 = both
    rid = ref2[0]["instance_id"].detach().numpy()
    oid = np.asarray(out2["det"]["instance_id"]).reshape(rid.shape)
    assert (rid == oid).mean() > 0.9
