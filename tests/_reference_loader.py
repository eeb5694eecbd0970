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
            self.scale = nn.Parameter(torch.tensor(float(scale)))

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

    mmcv = _module("mmcv")
    mmcv._hipad_stub = True
    _module("mmcv.utils", build_from_cfg=build_from_cfg)
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
    _module(
        "mmcv.cnn.bricks.registry",
        ATTENTION=_Registry(), PLUGIN_LAYERS=_Registry(),
        FEEDFORWARD_NETWORK=_Registry(), POSITIONAL_ENCODING=_Registry(),
        NORM_LAYERS=_Registry(),
    )
    _module("mmcv.runner")
    _module("mmcv.runner.base_module", BaseModule=nn.Module,
            Sequential=nn.Sequential)

    _module("mmdet")
    _module("mmdet.core")
    _module("mmdet.core.bbox")
    _module("mmdet.core.bbox.builder", BBOX_CODERS=_Registry())
    _module("mmdet.models")
    _module("mmdet.models.builder", BACKBONES=_Registry(), HEADS=_Registry(),
            NECKS=_Registry(), LOSSES=_Registry())

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
        "projects.mmdet3d_plugin.datasets",
    ):
        if name not in sys.modules:
            _package(name)


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
    plan_decoder = _load(f"{p}.models.plan.decoder", "models/plan/decoder.py")
    instance_bank = _load(f"{p}.models.instance_bank", "models/instance_bank.py")
    eval_utils = _load(f"{p}.datasets.bench2drive_eval_utils",
                       "datasets/bench2drive_eval_utils.py")
    return types.SimpleNamespace(
        torch=torch, box3d=box3d, utils=utils, blocks=blocks,
        det_blocks=det_blocks, det_decoder=det_decoder,
        plan_decoder=plan_decoder, instance_bank=instance_bank,
        eval_utils=eval_utils,
    )
