"""END-TO-END decoder parity: the reference's full SparseOneDecoder vs ours.

This is the strongest checkpoint-parity evidence available without the real
``hipad_stage2.pth`` (which cannot ship here): the reference's OWN 1606-line
unified decoder (`models/sparse_onedecoder.py`), instantiated from the
reference's OWN stage-2 config file (`projects/configs/hipad_b2d_stage2.py`,
exec'd with only path/scale/size substitutions), with randomized weights,
run on CPU torch — against our flax `SparseOneDecoder` loaded with the SAME
weights through the production converter (`tools/convert_weights.py`).

FULL DEPTH: the complete 6-layer op program (1 single-frame + 5 temporal
layers, `hipad_b2d_stage2.py:47,70-74`) over a two-frame temporal episode,
plus a second fixture with the per-layer ``with_topk_mode`` plan-mode
pruning schedule enabled (`sparse_onedecoder.py:982-1007`).

Covers in one numeric assertion per output family: the op-program loop
(concat/gnn/inter_gnn/temp_gnn/norm/split/deformable/ffn/refine), all four
instance banks (det/map/ego/plan) including the frame-2 temporal path
(SE(3) anchor projection, top-k merge, confidence decay), anchor encoders,
camera-conditioned deformable sampling, all five refinement heads, motion
anchors, command/target-point embeds, and the converter's name/layout map.

EXACT frame-2: both sides run in float64 (torch ``.double()``, jax
``enable_x64``) over the SAME float32 weight/input bits widened to f64, so
cross-implementation reduction noise is ~1e-12 — far below the ~1e-3
spacing of the 900 sorted det confidences. The temporal top-k cache
ordering therefore agrees slot-for-slot and every comparison is a hard
max|Δ| assertion (round 2 needed a 6%-of-rows allowance for near-tie cache
order swaps at f32 noise; f64 removes the ties instead of tolerating them).

Alignment choices (each is a documented equivalence, not a fudge):
  * flash-attn is exact softmax attention — `_reference_loader.load_onedecoder`
    replaces the CUDA kernel with the same math on CPU.
  * the reference's CUDA sampler is replaced by its own torch grid_sample
    fallback (`use_deformable_func=False`, `blocks.py:227-264`); our sampler's
    only documented divergence from it is the out-of-image boundary band, so
    the test zeroes a 1-pixel border on every feature-map level, which makes
    zeros-padding (torch) and validity-masking (ours) agree exactly.
  * cam_k is set to num_cams and sampler="reference" (every camera sampled,
    row-gather oracle path — the exact-semantics configuration; the serving
    topk sampler's equivalence and cam-top-k error bounds have their own
    tests in test_sampling.py).
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
enable_x64 = jax.enable_x64  # scoped x64 context (jax >= 0.9)

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
N_LAYERS = 6  # full stage-2 depth: 1 single-frame + 5 temporal

# Non-increasing per-refine-layer plan-mode keeps (of ego_fut_mode=48 per
# anchor-type group); torch's topk requires k <= current size, so the
# schedule must not grow. The last keep must cover the plan bank's
# num_temp_mode (configs/model.py __post_init__ invariant).
TOPK_SCHEDULE = (48, 36, 24, 18, 12, 12)
TOPK_TEMP_MODE = 12

ATOL = 1e-6  # f64 compute over shared f32 bits; see module docstring


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
    """Both sides in float64 — the same f32 bits widened (see docstring)."""
    proj = np.tile(_projection_mats()[None], (BS, 1, 1, 1)).astype(np.float64)
    wh = np.tile(np.array([W, H], np.float32), (BS, CAMS, 1)).astype(np.float64)
    rs = np.random.RandomState(7)
    cmd = np.zeros((BS, 6), np.float64)
    cmd[:, 2] = 1.0
    target = rs.uniform(-5, 5, (BS, 2)).astype(np.float32).astype(np.float64)
    Tg = T_global.astype(np.float64)
    Tg_inv = np.linalg.inv(Tg).astype(np.float64)

    t_metas = {
        "projection_mat": torch.tensor(proj),
        "image_wh": torch.tensor(wh),
        "timestamp": torch.full((BS,), float(t), dtype=torch.float64),
        "img_metas": [{"T_global": Tg, "T_global_inv": Tg_inv}
                      for _ in range(BS)],
        "target_point": torch.tensor(target),
        "gt_ego_fut_cmd": torch.tensor(cmd),
    }
    j_metas = {
        "projection_mat": jnp.asarray(proj),
        "image_wh": jnp.asarray(wh),
        "timestamp": jnp.full((BS,), float(t), jnp.float64),
        "T_global": jnp.tile(jnp.asarray(Tg)[None], (BS, 1, 1)),
        "T_global_inv": jnp.tile(jnp.asarray(Tg_inv)[None], (BS, 1, 1)),
        "target_point": jnp.asarray(target),
        "gt_ego_fut_cmd": jnp.asarray(cmd),
    }
    return t_metas, j_metas


def _feature_maps(seed):
    """Per-level multi-view features with a ZEROED 1-pixel border so torch
    grid_sample's zeros-padding and our validity masking agree exactly.
    f32 values widened to f64 on both sides."""
    rs = np.random.RandomState(seed)
    t_fms, j_fms = [], []
    for stride in (4, 8, 16, 32):
        h, w = H // stride, W // stride
        fm = rs.randn(BS, CAMS, 256, h, w).astype(np.float32) * 0.5
        fm[..., 0, :] = 0.0
        fm[..., -1, :] = 0.0
        fm[..., :, 0] = 0.0
        fm[..., :, -1] = 0.0
        fm = fm.astype(np.float64)
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


def _build(topk: bool):
    ns = load_onedecoder()
    cfgns = _exec_reference_config()
    head = cfgns["model"]["head"]["onedecoder_head"]

    # ---- reference-side config surgery (documented in the module docstring)
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
    head["operation_order"] = (cfgns["single_frame_layer"]
                               + cfgns["temporal_frame_layer"] * (N_LAYERS - 1))
    head["num_decoder"] = N_LAYERS
    # reduced input size: banks' front-view pool kernel derives from it
    for bank in ("ego_instance_bank", "plan_instance_bank"):
        head[bank]["feature_map_scale"] = (H / 32, W / 32)
    if topk:
        head["with_topk_mode"] = True
        head["topk_mode_list"] = list(TOPK_SCHEDULE)
        head["plan_instance_bank"]["num_temp_mode"] = TOPK_TEMP_MODE
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
    tdec.double()  # AFTER extraction: both sides widen the same f32 bits

    # ---- our side
    extra = {}
    if topk:
        extra = dict(with_topk_mode=True, topk_mode_list=TOPK_SCHEDULE,
                     num_temp_plan_mode=TOPK_TEMP_MODE)
    cfg = stage2(
        num_temporal_layers=N_LAYERS - 1,
        input_size=(H, W),
        sampler="reference",     # row-gather parity oracle path
        sampler_cam_k=CAMS,      # exact semantics: every camera sampled
        sampler_point_frac=1.0,
        decoder_remat=False,
        **extra,
    )
    ours = SparseOneDecoder(cfg)
    Tg2 = np.eye(4)
    Tg2[:3, :3] = _rot_z(0.1)
    Tg2[0, 3], Tg2[1, 3] = 1.5, 0.3

    with enable_x64():
        # jnp arrays must be created INSIDE the x64 scope or f64 truncates
        t_fms1, j_fms1 = _feature_maps(11)
        t_metas1, j_metas1 = _frame_metas(10.0, np.eye(4))
        t_fms2, j_fms2 = _feature_maps(23)
        t_metas2, j_metas2 = _frame_metas(10.5, Tg2)
        variables = jax.jit(ours.init)(jax.random.PRNGKey(0), j_fms1, j_metas1)

        as64 = lambda tree: jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a),
            tree)
        tgt_params = as64(dict(variables["params"]))
        merged, applied, unused = cw.merge_into({"decoder": tgt_params}, params)
        assert not unused, f"converted params with no destination: {unused[:8]}"
        new_vars = {"params": as64(merged["decoder"])}
        if "batch_stats" in variables:
            tgt_stats = as64(dict(variables["batch_stats"]))
            merged_s, _, unused_s = cw.merge_into({"decoder": tgt_stats}, stats)
            assert not unused_s, f"unused batch stats: {unused_s[:8]}"
            new_vars["batch_stats"] = as64(merged_s["decoder"])

        apply = jax.jit(lambda v, f, m, b: ours.apply(v, f, m, bank_states=b))

        # ---- frame 1
        out1, banks1 = apply(new_vars, j_fms1, j_metas1, None)
        # ---- frame 2: ego moved 1.5m forward, 0.3m left, 0.1 rad yaw, 0.5s on
        out2, _ = apply(new_vars, j_fms2, j_metas2, banks1)
        out1 = jax.tree_util.tree_map(np.asarray, out1)
        out2 = jax.tree_util.tree_map(np.asarray, out2)

    with torch.no_grad():
        ref1 = tdec(torch.zeros(BS), t_fms1, t_metas1)
        ref2 = tdec(torch.zeros(BS), t_fms2, t_metas2)

    return ref1, out1, ref2, out2


@pytest.fixture(scope="module")
def both():
    return _build(topk=False)


@pytest.fixture(scope="module")
def both_topk():
    return _build(topk=True)


def _cmp(ref_list, ours_stacked, label, atol=ATOL):
    """ref: list of per-layer torch tensors; ours: [L, ...] array."""
    ours = np.asarray(ours_stacked)
    assert len(ref_list) == ours.shape[0], label
    for layer, r in enumerate(ref_list):
        r = r.detach().numpy()
        o = ours[layer].reshape(r.shape)
        err = np.max(np.abs(r - o))
        assert err <= atol, f"{label} layer {layer}: max|Δ|={err:.2e}"


def _cmp_topk_plan(ref_list, ours_stacked, kind, label, atol=ATOL):
    """Plan outputs under topk mode: the reference's per-layer tensors SHRINK
    to ng*k_l live modes while ours pad the pruned tail back to the full
    ng*48 with sentinels (static shapes); compare the live prefix per group."""
    ours = np.asarray(ours_stacked)
    ng, per_full = 10, 48
    assert len(ref_list) == ours.shape[0], label
    for layer, r in enumerate(ref_list):
        k = TOPK_SCHEDULE[layer]
        r = r.detach().numpy()
        if kind == "cls":  # ref [bs, 1, ng*k]; ours [bs, 1, ng*per_full]
            o = ours[layer].reshape(BS, 1, ng, per_full)[..., :k]
            r = r.reshape(BS, 1, ng, k)
        else:  # reg: ref [bs, 1, ng*k, ts, 2]; ours [bs, 1, ng*per_full, ts, 2]
            o = ours[layer].reshape(BS, 1, ng, per_full, -1)[..., :k, :]
            r = r.reshape(BS, 1, ng, k, -1)
        err = np.max(np.abs(r - o))
        assert err <= atol, f"{label} layer {layer} (k={k}): max|Δ|={err:.2e}"


FAMILIES = [
    # (task, ref key, our key)
    ("det", "classification", "classification"),
    ("det", "prediction", "prediction"),
    ("det", "quality", "quality"),
    ("map", "classification", "classification"),
    ("map", "prediction", "prediction"),
    ("ego", "status", "status"),
    ("plan", "classification", "classification"),
    ("plan", "prediction", "prediction"),
    ("motion", "classification", "classification"),
    ("motion", "prediction", "prediction"),
]

TASK_INDEX = {"det": 0, "map": 1, "ego": 2, "plan": 3, "motion": 4}


@pytest.mark.parametrize("task,rkey,okey", FAMILIES)
def test_frame1_outputs(both, task, rkey, okey):
    ref1, out1, _, _ = both
    _cmp(ref1[TASK_INDEX[task]][rkey], out1[task][okey],
         f"frame1 {task}.{okey}")


@pytest.mark.parametrize("task,rkey,okey", FAMILIES)
def test_frame2_temporal_outputs(both, task, rkey, okey):
    _, _, ref2, out2 = both
    _cmp(ref2[TASK_INDEX[task]][rkey], out2[task][okey],
         f"frame2 {task}.{okey}")


def test_frame2_instance_ids_match(both):
    _, _, ref2, out2 = both
    rid = ref2[0]["instance_id"].detach().numpy()
    oid = np.asarray(out2["det"]["instance_id"]).reshape(rid.shape)
    assert (rid == oid).all()


@pytest.mark.parametrize("task,rkey,okey", FAMILIES)
def test_topk_frame1_outputs(both_topk, task, rkey, okey):
    ref1, out1, _, _ = both_topk
    if task == "plan":
        _cmp_topk_plan(ref1[TASK_INDEX[task]][rkey], out1[task][okey],
                       "cls" if rkey == "classification" else "reg",
                       f"topk frame1 plan.{okey}")
    else:
        _cmp(ref1[TASK_INDEX[task]][rkey], out1[task][okey],
             f"topk frame1 {task}.{okey}")


@pytest.mark.parametrize("task,rkey,okey", FAMILIES)
def test_topk_frame2_temporal_outputs(both_topk, task, rkey, okey):
    _, _, ref2, out2 = both_topk
    if task == "plan":
        _cmp_topk_plan(ref2[TASK_INDEX[task]][rkey], out2[task][okey],
                       "cls" if rkey == "classification" else "reg",
                       f"topk frame2 plan.{okey}")
    else:
        _cmp(ref2[TASK_INDEX[task]][rkey], out2[task][okey],
             f"topk frame2 {task}.{okey}")
