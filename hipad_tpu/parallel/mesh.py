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


def microbatch_sharded(mesh: Mesh) -> NamedSharding:
    """Gradient-accumulation layout [accum_steps, batch, ...]: the micro-step
    axis stays local (scanned), the per-sample axis shards over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any, accum: bool = False) -> Any:
    """Place a batch pytree batch-sharded (axis 0; with ``accum=True`` the
    [accum, batch, ...] layout — axis 1) on the mesh.

    Single-process: arrays are the [global_bs, ...] batch; ``device_put``
    scatters them. Multi-process (``jax.distributed`` initialised, e.g.
    ``tools/train.py --multihost``): each process passes its *local* shard
    [global_bs / process_count, ...] — the host-local data-loader slice, the
    counterpart of the reference's per-rank ``GroupInBatchSampler`` shards
    (`datasets/samplers/group_in_batch_sampler.py:48-178`) — and the global
    array is assembled without any cross-host copy
    (``jax.make_array_from_process_local_data``; ``device_put`` cannot
    target non-addressable devices).
    """
    sh = microbatch_sharded(mesh) if accum else batch_sharded(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    ax = 1 if accum else 0

    def _make(x):
        x = np.asarray(x)
        global_shape = (x.shape[:ax]
                        + (x.shape[ax] * jax.process_count(),)
                        + x.shape[ax + 1:])
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(_make, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree onto every device of the mesh.

    Multi-process: every process must hold the same host values (same seed /
    same restored checkpoint — the reference's DDP has the identical
    invariant); they become the replicated shards of one global array.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), np.shape(x)), tree)
