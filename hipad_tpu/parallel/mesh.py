"""Device mesh + sharding helpers.

HiP-AD's only parallelism is data parallelism (SURVEY §2.9: the reference is
mmcv DDP over NCCL, `apis/mmdet_train.py:97-102`). TPU-native that is a 1-D
``data`` mesh: parameters and optimizer state replicated, the batch sharded on
axis 0, XLA inserting the gradient all-reduce over ICI. ~60M params make any
model parallelism pointless at this scale; the helpers still take an axis
name so a second (model) axis can be added without touching call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a pytree of [global_bs, ...] arrays batch-sharded on the mesh."""
    sh = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
