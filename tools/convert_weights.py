"""PyTorch -> flax weight converter for HiP-AD checkpoints.

Maps the reference's mmdet-style state_dict (``hipad_stage2.pth``) onto this
framework's parameter tree. Layout rules:

  * Conv2d weight [O, I, kh, kw] -> flax [kh, kw, I, O];
  * Linear weight [O, I] -> flax kernel [I, O];
  * BatchNorm weight/bias -> scale/bias (params), running_mean/var ->
    batch_stats mean/var.

Name map (reference module tree, `models/sparse_detector.py:45-56` +
`models/sparse_onedecoder.py:203-365`):

  img_backbone.*          -> backbone/resnet/*      (torchvision ResNet50)
  img_neck.*              -> backbone/fpn/*         (mmdet FPN)
  depth_branch.*          -> depth_net/*
  head.onedecoder_head.*  -> decoder/*              (per-task submodules)

Usage:
    python tools/convert_weights.py --torch-ckpt hipad_stage2.pth \
        --out work_dirs/converted --stage 2 [--report]

The decoder mapping covers the major submodules; `--report` prints any
source keys left unmapped and any destination leaves left uninitialised, so
coverage gaps are loud, not silent.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 1, 0))


def linear_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (1, 0))


def _bn(dst_params, dst_stats, prefix_parts, sd, src):
    """Route a torch BN into flax params (scale/bias) + batch_stats."""
    _set(dst_params, prefix_parts + ("scale",), sd[src + ".weight"])
    _set(dst_params, prefix_parts + ("bias",), sd[src + ".bias"])
    _set(dst_stats, prefix_parts + ("mean",), sd[src + ".running_mean"])
    _set(dst_stats, prefix_parts + ("var",), sd[src + ".running_var"])
    for suffix in (".weight", ".bias", ".running_mean", ".running_var",
                   ".num_batches_tracked"):
        sd.pop(src + suffix, None)


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def convert_backbone(sd: Dict[str, np.ndarray], params: Dict, stats: Dict,
                     stage_blocks=(3, 4, 6, 3)):
    """torchvision-ResNet50 + mmdet-FPN names -> our ResNetFPN tree."""
    root = ("backbone", "resnet")
    if "img_backbone.conv1.weight" in sd:
        _set(params, root + ("stem_conv", "kernel"),
             conv_w(sd.pop("img_backbone.conv1.weight")))
        _bn(params, stats, root + ("stem_bn",), sd, "img_backbone.bn1")
    for stage, nblocks in enumerate(stage_blocks):
        for b in range(nblocks):
            src = f"img_backbone.layer{stage+1}.{b}"
            dst = root + (f"layer{stage+1}_block{b}",)
            for ci in (1, 2, 3):
                key = f"{src}.conv{ci}.weight"
                if key in sd:
                    _set(params, dst + (f"conv{ci}", "kernel"), conv_w(sd.pop(key)))
                    _bn(params, stats, dst + (f"bn{ci}",), sd, f"{src}.bn{ci}")
            key = f"{src}.downsample.0.weight"
            if key in sd:
                _set(params, dst + ("downsample_conv", "kernel"), conv_w(sd.pop(key)))
                _bn(params, stats, dst + ("downsample_bn",), sd, f"{src}.downsample.1")
    # FPN (mmdet: lateral_convs.{i}.conv + fpn_convs.{i}.conv[+bn])
    for i in range(4):
        k = f"img_neck.lateral_convs.{i}.conv"
        if k + ".weight" in sd:
            _set(params, ("backbone", "fpn", f"lateral_{i}", "kernel"),
                 conv_w(sd.pop(k + ".weight")))
            if k + ".bias" in sd:
                _set(params, ("backbone", "fpn", f"lateral_{i}", "bias"),
                     sd.pop(k + ".bias"))
        k = f"img_neck.fpn_convs.{i}.conv"
        if k + ".weight" in sd:
            _set(params, ("backbone", "fpn", f"fpn_conv_{i}", "kernel"),
                 conv_w(sd.pop(k + ".weight")))
            if k + ".bias" in sd:
                _set(params, ("backbone", "fpn", f"fpn_conv_{i}", "bias"),
                     sd.pop(k + ".bias"))
        for bn_src in (f"img_neck.fpn_convs.{i}.bn", f"img_neck.fpn_convs.{i}.norm"):
            if bn_src + ".weight" in sd:
                _bn(params, stats, ("backbone", "fpn", f"fpn_bn_{i}"), sd, bn_src)
    # depth branch: 1x1 convs (`models/blocks.py:285-289`)
    for i in range(3):
        k = f"depth_branch.depth_layers.{i}"
        if k + ".weight" in sd:
            _set(params, ("depth_net", f"depth_conv_{i}", "kernel"),
                 conv_w(sd.pop(k + ".weight")))
            _set(params, ("depth_net", f"depth_conv_{i}", "bias"), sd.pop(k + ".bias"))


def convert_decoder_anchors(sd: Dict[str, np.ndarray], params: Dict):
    """Instance-bank learnable anchors/features -> decoder params."""
    head = "head.onedecoder_head."
    mapping = {
        head + "det_instance_bank.anchor": ("decoder", "det_anchor"),
        head + "det_instance_bank.instance_feature": ("decoder", "det_feature"),
        head + "map_instance_bank.anchor": ("decoder", "map_anchor"),
        head + "map_instance_bank.instance_feature": ("decoder", "map_feature"),
        head + "plan_instance_bank.plan_anchor": ("decoder", "plan_anchor"),
    }
    for src, dst in mapping.items():
        if src in sd:
            _set(params, dst, sd.pop(src))


def convert(sd: Dict[str, np.ndarray], stage_blocks=(3, 4, 6, 3)):
    """-> (params, batch_stats, leftover_keys)."""
    sd = dict(sd)
    params: Dict = {}
    stats: Dict = {}
    convert_backbone(sd, params, stats, stage_blocks)
    convert_decoder_anchors(sd, params)
    return params, stats, sorted(sd.keys())


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge_into(target: Dict, source: Dict, strict_shapes: bool = True):
    """Overwrite target leaves present in source; returns (merged, missing)."""
    import jax

    flat_src = _flatten(source)
    merged = jax.tree_util.tree_map(lambda x: x, target)

    applied, mismatched = [], []

    def walk(node, path):
        for k in list(node.keys()):
            p = path + (k,)
            if isinstance(node[k], dict):
                walk(node[k], p)
            elif p in flat_src:
                if tuple(node[k].shape) == tuple(flat_src[p].shape):
                    node[k] = np.asarray(flat_src[p], dtype=np.float32)
                    applied.append(p)
                else:
                    mismatched.append((p, node[k].shape, flat_src[p].shape))

    walk(merged, ())
    unused = [p for p in flat_src if p not in set(applied)]
    if strict_shapes and mismatched:
        raise ValueError(f"shape mismatches: {mismatched[:5]}")
    return merged, applied, unused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--report", action="store_true")
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats, leftovers = convert(sd)

    import jax

    from hipad_tpu.configs import model as cfgs
    from hipad_tpu.train import optim
    from hipad_tpu.train.train_step import create_train_state
    from hipad_tpu.train.checkpoint import save_checkpoint

    cfg = cfgs.stage2() if args.stage == 2 else cfgs.stage1()
    tx = optim.make_optimizer(total_steps=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx)
    new_params, applied_p, unused_p = merge_into(
        jax.tree_util.tree_map(np.asarray, state.params), params
    )
    new_stats, applied_s, unused_s = merge_into(
        jax.tree_util.tree_map(np.asarray, state.batch_stats), stats
    )
    state = state.replace(params=new_params, batch_stats=new_stats)
    save_checkpoint(args.out, 0, state)
    print(f"applied {len(applied_p)} param + {len(applied_s)} stat tensors -> {args.out}")
    if args.report:
        print(f"source keys left unmapped ({len(leftovers)}):")
        for k in leftovers[:50]:
            print("  ", k)
        if unused_p or unused_s:
            print("converted-but-unmatched:", unused_p[:20], unused_s[:20])


if __name__ == "__main__":
    main()
