"""Device-mesh utilities and sharding policies.

The reference's only distributed mode is single-process DataParallel
(base/base_trainer.py:17-18). The TPU-native equivalent (SURVEY §2.3): a 1-D
``Mesh(('data',))`` with parameters replicated and the batch sharded over
``data``; XLA inserts the gradient all-reduce over ICI. Because batch-stat
reductions under jit are global, BatchNorm becomes sync-BN across the mesh
for free (an upgrade over the reference's per-GPU stats).

Inference needs no cross-chip communication at all (per-view independence) —
eval fleets shard the view list over the same axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "shard_batch", "replicate", "batch_sharding"]


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Shard every leaf of a batch pytree along axis 0 over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)
