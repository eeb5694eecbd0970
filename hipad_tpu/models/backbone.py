"""ResNet + FPN image backbone (flax.linen, NHWC, TPU-native).

Topology mirrors torchvision ResNet-50 / mmdet FPN exactly (so the released
``hipad_stage2.pth`` weights can be mapped 1:1 by a converter):
  * stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool,
  * 4 stages of bottlenecks [3, 4, 6, 3], "pytorch" style (stride on the 3x3),
  * FPN: 1x1 laterals (bias, no norm — ``no_norm_on_lateral``), nearest
    top-down upsample, 3x3 output convs with BN
    (reference config `projects/configs/hipad_b2d_stage2.py:112-134`).

TPU notes: NHWC layout feeds the MXU's native convolution tiling; stage
boundaries are wrapped in ``nn.remat`` when ``remat=True`` — the counterpart
of the reference's ``with_cp=True`` activation checkpointing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    planes: int  # mid width; out width = planes * 4
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Configurable bottleneck ResNet; (3,4,6,3)@64 == ResNet-50."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_planes: int = 64
    out_indices: Sequence[int] = (0, 1, 2, 3)
    remat: bool = False
    # which stages get per-block remat when ``remat`` is on. Memory lives in
    # the EARLY stages (large H x W); replay FLOPs are ~uniform per stage in
    # a ResNet — so rematting only stages 0-1 keeps most of the memory win
    # while skipping half the recompute (measured A/B in tools/bench_train).
    remat_stages: Sequence[int] = (0, 1, 2, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(
            self.base_planes, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        remat_block = nn.remat(Bottleneck, static_argnums=(2,))
        for stage, num_blocks in enumerate(self.stage_blocks):
            block_cls = (remat_block
                         if self.remat and stage in self.remat_stages
                         else Bottleneck)
            planes = self.base_planes * (2**stage)
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                downsample = b == 0  # width always changes on the first block
                x = block_cls(
                    planes=planes,
                    stride=stride,
                    downsample=downsample,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(f)
            for i, f in enumerate(inputs)
        ]
        # Top-down pathway: nearest 2x upsample + add.
        for i in range(len(laterals) - 1, 0, -1):
            up = laterals[i]
            b, h, w, c = up.shape
            up = jax.image.resize(up, (b, h * 2, w * 2, c), method="nearest")
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw]
        outs = []
        for i, lat in enumerate(laterals):
            o = nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"fpn_conv_{i}",
            )(lat)
            o = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"fpn_bn_{i}",
            )(o)
            outs.append(o)
        return tuple(outs)


class ResNetFPN(nn.Module):
    """Full image encoder: 6-view images -> 4-level, 256-channel pyramid.

    Input ``[bs, cams, H, W, 3]`` is flattened to ``[bs*cams, H, W, 3]``
    (cameras ride the batch dimension — big batched convs for the MXU, as in
    `models/sparse_detector.py:66-94`), and each pyramid level is reshaped
    back to ``[bs, cams, H_l, W_l, C]``.
    """

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_planes: int = 64
    out_channels: int = 256
    remat: bool = False
    remat_stages: Sequence[int] = (0, 1, 2, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        bs, cams = images.shape[:2]
        x = images.reshape((bs * cams,) + images.shape[2:])
        feats = ResNet(
            stage_blocks=self.stage_blocks,
            base_planes=self.base_planes,
            remat=self.remat,
            remat_stages=self.remat_stages,
            dtype=self.dtype,
            name="resnet",
        )(x, train)
        feats = FPN(out_channels=self.out_channels, dtype=self.dtype, name="fpn")(feats, train)
        return [f.reshape((bs, cams) + f.shape[1:]) for f in feats]
