"""Top-level HiP-AD model: 6 cameras in, multi-task predictions out.

TPU-native counterpart of the reference ``SparseDetector``
(`models/sparse_detector.py:26-174`) + ``SparseHead``: images -> (GridMask) ->
ResNet+FPN -> unified sparse decoder with explicit temporal bank state.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..configs.model import HiPADConfig
from .backbone import ResNetFPN
from .decoder import SparseOneDecoder
from .depth_net import DenseDepthNet
from .grid_mask import grid_mask
from .instance_bank import BankStates


class HiPAD(nn.Module):
    cfg: HiPADConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN(
            stage_blocks=c.backbone_stage_blocks,
            base_planes=c.backbone_base_planes,
            out_channels=c.embed_dims,
            remat=c.backbone_remat,
            remat_stages=c.backbone_remat_stages,
            dtype=self.dtype,
        )
        self.decoder = SparseOneDecoder(c, dtype=self.dtype)
        self.depth_net = DenseDepthNet(num_depth_layers=c.num_depth_layers)

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        """[bs, cams, H, W, 3] -> list of per-level [bs, cams, H_l, W_l, C]."""
        if train and self.cfg.use_grid_mask:
            rng = self.make_rng("grid_mask")
            images = grid_mask(rng, images)
        return self.backbone(images, train=train)

    def __call__(
        self,
        images: jnp.ndarray,
        metas: Dict[str, jnp.ndarray],
        bank_states: Optional[BankStates] = None,
        train: bool = False,
        return_depth: bool = False,
    ):
        feature_maps = self.extract_feat(images, train=train)
        if self.cfg.stop_fmap_gradient:  # MFU attribution only (see config)
            import jax

            feature_maps = [jax.lax.stop_gradient(f) for f in feature_maps]
        outputs, new_banks = self.decoder(feature_maps, metas, bank_states, train=train)
        if return_depth:
            outputs["depth"] = self.depth_net(feature_maps, metas.get("focal"))
        return outputs, new_banks
