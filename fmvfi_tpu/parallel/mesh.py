"""Device mesh + sharding helpers.

The reference has no distributed layer at all (single --gpu_id, no
torch.distributed anywhere — SURVEY §2.7).  Here parallelism is a first-class
axis: a 1-D `data` mesh for batch-parallel training/inference (gradient psum
inserted by XLA from sharding propagation), with room for a `spatial` axis
(H-sharded high-res inference with halo exchange) as the second dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        arr = np.array(devs[:n])
    else:
        raise NotImplementedError("multi-axis meshes land with spatial sharding")
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batched arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
