"""Load the reference's pure-torch leaf modules as golden oracles.

The reference (/root/reference, read-only) guards its math behind mmcv/mmdet
registry plumbing that is not installed here. The torch math itself — the
grid_sample fallback sampler, the plan decoder rescore, the instance-bank
get/update/cache — is dependency-free, so we satisfy the *imports* with
minimal stubs and execute the reference files in place (no code copied).

Only for tests: `load()` returns a namespace of reference modules, or raises
ImportError when torch / the reference checkout is unavailable.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference/projects/mmdet3d_plugin"


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _package(name):
    mod = types.ModuleType(name)
    mod.__path__ = []  # package with no importable submodules
    sys.modules[name] = mod
    return mod


class _Registry:
    def __init__(self):
        self.modules = {}

    def register_module(self, *args, **kwargs):
        def deco(cls):
            self.modules[cls.__name__] = cls
            return cls

        if args and isinstance(args[0], type):
            return deco(args[0])
        return deco


def _install_stubs():
    import torch
    import torch.nn as nn

    if "mmcv" in sys.modules and getattr(sys.modules["mmcv"], "_hipad_stub", False):
        return

    def build_from_cfg(cfg, registry, default_args=None):
        # tests pass constructed objects straight through
        if not isinstance(cfg, dict):
            return cfg
        cfg = dict(cfg)
        cls = registry.modules[cfg.pop("type")]
        return cls(**cfg)

    def build_norm_layer(cfg, num_features, postfix=""):
        return f"norm{postfix}", nn.LayerNorm(num_features)

    def build_activation_layer(cfg):
        return nn.ReLU(inplace=cfg.get("inplace", False)) if cfg else nn.ReLU()

    def build_dropout(cfg):
        return nn.Dropout(cfg.get("drop_prob", 0.0)) if cfg else nn.Identity()

    def _noop_init(module, *a, **k):
        return None

    def bias_init_with_prob(p):
        import math

        return float(-math.log((1 - p) / p))

    class Scale(nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            # mmcv.cnn.Scale accepts a scalar or a per-channel list
            self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float32))

        def forward(self, x):
            return x * self.scale

    class FFN(nn.Module):
        def __init__(self, embed_dims=256, feedforward_channels=1024,
                     num_fcs=2, act_cfg=None, ffn_drop=0.0, **kwargs):
            super().__init__()
            layers = []
            dims = embed_dims
            for _ in range(num_fcs - 1):
                layers += [nn.Linear(dims, feedforward_channels), nn.ReLU(),
                           nn.Dropout(ffn_drop)]
                dims = feedforward_channels
            layers += [nn.Linear(dims, embed_dims), nn.Dropout(ffn_drop)]
            self.layers = nn.Sequential(*layers)

        def forward(self, x, identity=None):
            out = self.layers(x)
            return out + (x if identity is None else identity)

    def deprecated_api_warning(name_dict, cls_name=None):
        def deco(fn):
            return fn

        return deco

    def _fp_decorator(*dargs, **dkwargs):
        # mmcv auto_fp16/force_fp32: precision management is a no-op on CPU
        if dargs and callable(dargs[0]):
            return dargs[0]

        def deco(fn):
            return fn

        return deco

    mmcv = _module("mmcv")
    mmcv._hipad_stub = True
    _module("mmcv.utils", build_from_cfg=build_from_cfg,
            deprecated_api_warning=deprecated_api_warning)
    _module(
        "mmcv.cnn",
        Linear=nn.Linear, Scale=Scale,
        build_norm_layer=build_norm_layer,
        build_activation_layer=build_activation_layer,
        xavier_init=_noop_init, constant_init=_noop_init,
        bias_init_with_prob=bias_init_with_prob,
    )
    _module("mmcv.cnn.bricks")
    _module("mmcv.cnn.bricks.transformer", FFN=FFN)
    _module("mmcv.cnn.bricks.drop", build_dropout=build_dropout)
    NORM_LAYERS = _Registry()
    # torch LayerNorm (eps=1e-5) is what mmcv builds for type="LN"
    NORM_LAYERS.modules["LN"] = nn.LayerNorm
    _module(
        "mmcv.cnn.bricks.registry",
        ATTENTION=_Registry(), PLUGIN_LAYERS=_Registry(),
        FEEDFORWARD_NETWORK=_Registry(), POSITIONAL_ENCODING=_Registry(),
        NORM_LAYERS=NORM_LAYERS,
    )
    class BaseModule(nn.Module):
        # mmcv BaseModule takes an optional init_cfg positional
        def __init__(self, init_cfg=None):
            super().__init__()

    _module("mmcv.runner", BaseModule=BaseModule, auto_fp16=_fp_decorator,
            force_fp32=_fp_decorator)
    _module("mmcv.runner.base_module", BaseModule=BaseModule,
            Sequential=nn.Sequential)

    HEADS, LOSSES = _Registry(), _Registry()
    _module("mmdet")
    _module("mmdet.core", reduce_mean=lambda x: x)
    _module("mmdet.core.bbox")
    _module("mmdet.core.bbox.builder", BBOX_CODERS=_Registry(),
            BBOX_SAMPLERS=_Registry())
    _module("mmdet.models", HEADS=HEADS, LOSSES=LOSSES)
    _module("mmdet.models.builder", BACKBONES=_Registry(), HEADS=HEADS,
            NECKS=_Registry(), LOSSES=LOSSES)

    # flash_attn is CUDA-only; the kernels are replaced with exact CPU
    # attention by load_onedecoder() below, so the symbols just need to exist.
    def _no_flash(*a, **k):
        raise RuntimeError("flash_attn stub: CPU tests must patch FlashAttention")

    _module("flash_attn")
    _module("flash_attn.flash_attn_interface",
            flash_attn_unpadded_kvpacked_func=_no_flash,
            flash_attn_varlen_kvpacked_func=_no_flash)
    _module("flash_attn.bert_padding", unpad_input=_no_flash,
            pad_input=_no_flash, index_first_axis=_no_flash)

    if "cv2" not in sys.modules:
        cv2 = _module("cv2")
        cv2.__getattr__ = lambda name: (lambda *a, **k: None)

    if "pyquaternion" not in sys.modules:
        import numpy as np

        class Quaternion:
            """Minimal [w,x,y,z] quaternion (only what the vendored
            evaluator touches: construction + rotation_matrix)."""

            def __init__(self, wxyz):
                a = np.asarray(wxyz, dtype=float).ravel()
                self.w, self.x, self.y, self.z = a

            @property
            def rotation_matrix(self):
                w, x, y, z = self.w, self.x, self.y, self.z
                n = w * w + x * x + y * y + z * z
                s = 0.0 if n == 0 else 2.0 / n
                return np.array([
                    [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
                    [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
                    [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
                ])

        _module("pyquaternion", Quaternion=Quaternion)

    # reference package skeleton (empty packages so leaf loads below are the
    # only code that executes — the real __init__ imports everything)
    for name in (
        "projects", "projects.mmdet3d_plugin", "projects.mmdet3d_plugin.core",
        "projects.mmdet3d_plugin.models", "projects.mmdet3d_plugin.models.det",
        "projects.mmdet3d_plugin.models.map",
        "projects.mmdet3d_plugin.models.plan",
        "projects.mmdet3d_plugin.models.ego",
        "projects.mmdet3d_plugin.models.motion",
        "projects.mmdet3d_plugin.datasets",
    ):
        if name not in sys.modules:
            _package(name)

    def feature_maps_format(feature_maps, inverse=False):
        """Stand-in for `ops/__init__.py:feature_maps_format`: CPU tests keep
        feature maps in list-of-levels [bs, cams, C, H, W] form (the
        use_deformable_func=False layout), so the forward format is identity
        and the inverse just wraps the list in the single uniform-camera
        group the banks index as `[0][-1][:, 0]` (front cam, last level)."""
        if inverse:
            return [list(feature_maps)]
        return feature_maps

    if "projects.mmdet3d_plugin.ops" not in sys.modules:
        _module("projects.mmdet3d_plugin.ops",
                feature_maps_format=feature_maps_format,
                deformable_aggregation_function=None)

    # plan/instance_bank.py imports VectorizeMapNumpy but never uses it
    if "projects.mmdet3d_plugin.datasets.pipelines" not in sys.modules:
        _package("projects.mmdet3d_plugin.datasets.pipelines")
        _module("projects.mmdet3d_plugin.datasets.pipelines.vectorize_numpy",
                VectorizeMapNumpy=None)


def _install_loss_stubs():
    """mmdet loss / match-cost / assigner primitives the reference's loss
    path builds from config (`hipad_b2d_stage2.py:417-476`). These are
    faithful CPU implementations of the published mmdet formulas
    (FocalLoss, L1Loss, CrossEntropyLoss(use_sigmoid), GaussianFocalLoss,
    FocalLossCost, weighted smooth_l1/l1) — the reference's OWN code
    (SparseBox3DTarget/SparsePoint3DTarget/plan/motion targets,
    SparseBox3DLoss/SparseLineLoss and the decoder loss assembly) is loaded
    from /root/reference and is the thing under test."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    core = sys.modules["mmdet.core"]
    if getattr(core, "_hipad_loss_stub", False):
        return
    core._hipad_loss_stub = True

    def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
        if weight is not None:
            loss = loss * weight
        if avg_factor is None:
            if reduction == "mean":
                return loss.mean()
            if reduction == "sum":
                return loss.sum()
            return loss
        if reduction == "mean":
            return loss.sum() / avg_factor
        if reduction == "none":
            return loss
        raise ValueError(reduction)

    def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
        return weight_reduce_loss((pred - target).abs(), weight, reduction,
                                  avg_factor)

    def smooth_l1_loss(pred, target, weight=None, reduction="mean",
                       avg_factor=None, beta=1.0):
        d = (pred - target).abs()
        loss = torch.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    class L1Loss(nn.Module):
        def __init__(self, reduction="mean", loss_weight=1.0):
            super().__init__()
            self.reduction = reduction
            self.loss_weight = loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None, **kw):
            return self.loss_weight * l1_loss(pred, target, weight,
                                              self.reduction, avg_factor)

    class FocalLoss(nn.Module):
        def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                     reduction="mean", loss_weight=1.0):
            super().__init__()
            assert use_sigmoid
            self.gamma, self.alpha = gamma, alpha
            self.reduction, self.loss_weight = reduction, loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None, **kw):
            n_cls = pred.size(1)
            t = F.one_hot(target.long(), num_classes=n_cls + 1)
            t = t[:, :n_cls].type_as(pred)
            p = pred.sigmoid()
            pt = (1 - p) * t + p * (1 - t)
            fw = (self.alpha * t + (1 - self.alpha) * (1 - t)) * pt.pow(self.gamma)
            loss = F.binary_cross_entropy_with_logits(
                pred, t, reduction="none") * fw
            if weight is not None and weight.dim() == 1:
                weight = weight.view(-1, 1)
            return self.loss_weight * weight_reduce_loss(
                loss, weight, self.reduction, avg_factor)

    class CrossEntropyLoss(nn.Module):
        def __init__(self, use_sigmoid=False, reduction="mean", loss_weight=1.0):
            super().__init__()
            assert use_sigmoid
            self.reduction, self.loss_weight = reduction, loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None, **kw):
            loss = F.binary_cross_entropy_with_logits(
                pred, target.float(), reduction="none")
            return self.loss_weight * weight_reduce_loss(
                loss, weight, self.reduction, avg_factor)

    class GaussianFocalLoss(nn.Module):
        def __init__(self, alpha=2.0, gamma=4.0, reduction="mean",
                     loss_weight=1.0):
            super().__init__()
            self.alpha, self.gamma = alpha, gamma
            self.reduction, self.loss_weight = reduction, loss_weight

        def forward(self, pred, target, weight=None, avg_factor=None, **kw):
            eps = 1e-12
            pos_w = target.eq(1)
            neg_w = (1 - target).pow(self.gamma)
            pos = -(pred + eps).log() * (1 - pred).pow(self.alpha) * pos_w
            neg = -(1 - pred + eps).log() * pred.pow(self.alpha) * neg_w
            return self.loss_weight * weight_reduce_loss(
                pos + neg, weight, self.reduction, avg_factor)

    LOSSES = sys.modules["mmdet.models"].LOSSES
    for cls in (L1Loss, FocalLoss, CrossEntropyLoss, GaussianFocalLoss):
        LOSSES.modules[cls.__name__] = cls

    _module("mmdet.models.losses", l1_loss=l1_loss,
            smooth_l1_loss=smooth_l1_loss)

    # ---- match costs / assigners (map target path)
    MATCH_COST = _Registry()

    class FocalLossCost:
        def __init__(self, weight=1.0, alpha=0.25, gamma=2, eps=1e-12):
            self.weight, self.alpha, self.gamma, self.eps = weight, alpha, gamma, eps

        def __call__(self, cls_pred, gt_labels):
            p = cls_pred.sigmoid()
            neg = -(1 - p + self.eps).log() * (1 - self.alpha) * p.pow(self.gamma)
            pos = -(p + self.eps).log() * self.alpha * (1 - p).pow(self.gamma)
            return (pos[:, gt_labels] - neg[:, gt_labels]) * self.weight

    MATCH_COST.modules["FocalLossCost"] = FocalLossCost

    def build_match_cost(cfg):
        cfg = dict(cfg)
        return MATCH_COST.modules[cfg.pop("type")](**cfg)

    BBOX_ASSIGNERS = _Registry()
    builder = sys.modules["mmdet.core.bbox.builder"]
    builder.BBOX_ASSIGNERS = BBOX_ASSIGNERS

    def build_assigner(cfg):
        cfg = dict(cfg)
        return BBOX_ASSIGNERS.modules[cfg.pop("type")](**cfg)

    core.build_assigner = build_assigner
    core.build_sampler = None
    _module("mmdet.core.bbox.match_costs", build_match_cost=build_match_cost)
    _module("mmdet.core.bbox.match_costs.builder", MATCH_COST=MATCH_COST)
    _module("mmdet.core.bbox.assigners", AssignResult=object,
            BaseAssigner=object)


def load_loss() -> types.SimpleNamespace:
    """`load()` plus the reference's full loss path: target assigners
    (`det/target.py`, `map/target.py`+`match_cost.py`, `plan/target.py`,
    `motion/target.py`), loss modules (`det/losses.py`, `map/loss.py`) and
    the `SparseOneDecoder` class whose `loss*` methods assemble them
    (`sparse_onedecoder.py:1095-1579`)."""
    ns = load()
    _install_loss_stubs()
    p = "projects.mmdet3d_plugin"
    ns.base_target = _load(f"{p}.models.base_target", "models/base_target.py")
    ns.det_target = _load(f"{p}.models.det.target", "models/det/target.py")
    ns.det_losses = _load(f"{p}.models.det.losses", "models/det/losses.py")
    ns.map_match_cost = _load(f"{p}.models.map.match_cost",
                              "models/map/match_cost.py")
    ns.map_target = _load(f"{p}.models.map.target", "models/map/target.py")
    ns.map_loss = _load(f"{p}.models.map.loss", "models/map/loss.py")
    ns.plan_target = _load(f"{p}.models.plan.target", "models/plan/target.py")
    ns.motion_target = _load(f"{p}.models.motion.target",
                             "models/motion/target.py")
    ns.attention = _load(f"{p}.models.attention", "models/attention.py")
    ns.onedecoder = _load(f"{p}.models.sparse_onedecoder",
                          "models/sparse_onedecoder.py")
    return ns


def _load(fullname: str, relpath: str):
    if fullname in sys.modules and hasattr(sys.modules[fullname], "__file__"):
        return sys.modules[fullname]
    spec = importlib.util.spec_from_file_location(
        fullname, f"{REF_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    parent, _, child = fullname.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    return mod


def load() -> types.SimpleNamespace:
    import os

    import pytest

    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout not available")
    _install_stubs()

    p = "projects.mmdet3d_plugin"
    box3d = _load(f"{p}.core.box3d", "core/box3d.py")
    utils = _load(f"{p}.datasets.utils", "datasets/utils.py")
    blocks = _load(f"{p}.models.blocks", "models/blocks.py")
    det_blocks = _load(f"{p}.models.det.blocks", "models/det/blocks.py")
    det_decoder = _load(f"{p}.models.det.decoder", "models/det/decoder.py")
    _load(f"{p}.models.utils", "models/utils.py")  # nerf_positional_encoding
    map_blocks = _load(f"{p}.models.map.blocks", "models/map/blocks.py")
    plan_blocks = _load(f"{p}.models.plan.blocks", "models/plan/blocks.py")
    ego_blocks = _load(f"{p}.models.ego.blocks", "models/ego/blocks.py")
    motion_blocks = _load(f"{p}.models.motion.blocks", "models/motion/blocks.py")
    plan_decoder = _load(f"{p}.models.plan.decoder", "models/plan/decoder.py")
    instance_bank = _load(f"{p}.models.instance_bank", "models/instance_bank.py")
    eval_utils = _load(f"{p}.datasets.bench2drive_eval_utils",
                       "datasets/bench2drive_eval_utils.py")
    return types.SimpleNamespace(
        torch=torch, box3d=box3d, utils=utils, blocks=blocks,
        det_blocks=det_blocks, det_decoder=det_decoder,
        map_blocks=map_blocks, plan_blocks=plan_blocks,
        ego_blocks=ego_blocks, motion_blocks=motion_blocks,
        plan_decoder=plan_decoder, instance_bank=instance_bank,
        eval_utils=eval_utils,
    )


def load_onedecoder() -> types.SimpleNamespace:
    """`load()` plus the full reference `SparseOneDecoder` stack (attention,
    separate attentions, ego/plan banks, the 1606-line unified decoder),
    runnable on CPU: the flash-attn kernel inside `FlashMHA` is replaced with
    exact softmax attention (flash attention is numerically exact attention,
    so this preserves reference semantics bit-for-fp32-bit up to reduction
    order)."""
    import math

    ns = load()
    torch = ns.torch
    p = "projects.mmdet3d_plugin"

    attention = _load(f"{p}.models.attention", "models/attention.py")

    def _cpu_exact_attention(self, q, kv, causal=False, key_padding_mask=None):
        # reference semantics: softmax(q k^T / sqrt(d)) v  (attention.py:52-99);
        # dropout_p only applies in training, and parity runs in eval mode.
        assert not causal and key_padding_mask is None
        k, v = kv[:, :, 0], kv[:, :, 1]  # [B, S, H, D]
        scale = self.softmax_scale or 1.0 / math.sqrt(q.shape[-1])
        # upcast-only: fp16 params run in f32; f64 oracles (tdec.double())
        # must stay f64 or downstream f64 linears reject the f32 output
        dt = torch.promote_types(q.dtype, torch.float32)
        logits = torch.einsum("bthd,bshd->bhts", q.to(dt), k.to(dt)) * scale
        w = torch.softmax(logits, dim=-1)
        out = torch.einsum("bhts,bshd->bthd", w, v.to(dt))
        return out, w

    attention.FlashAttention.forward = _cpu_exact_attention

    separate_attn = _load(f"{p}.models.separate_attn", "models/separate_attn.py")
    ego_bank = _load(f"{p}.models.ego.instance_bank", "models/ego/instance_bank.py")
    plan_bank = _load(f"{p}.models.plan.instance_bank", "models/plan/instance_bank.py")
    onedecoder = _load(f"{p}.models.sparse_onedecoder", "models/sparse_onedecoder.py")

    ns.attention = attention
    ns.separate_attn = separate_attn
    ns.ego_bank = ego_bank
    ns.plan_bank = plan_bank
    ns.onedecoder = onedecoder
    return ns
