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
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data mesh by default; pass axis_names + shape for multi-axis, e.g.
    make_mesh(8, ("data", "spatial"), (4, 2)) — batch over 4 groups of 2
    H-sharded chips (lay the fastest-varying axis over intra-host ICI
    neighbours: jax.devices() order is ICI-contiguous on TPU slices)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        arr = np.array(devs[:n])
    else:
        if shape is None:
            raise ValueError(
                f"multi-axis mesh {tuple(axis_names)} needs an explicit shape"
            )
        if int(np.prod(shape)) != n:
            raise ValueError(f"mesh shape {shape} != {n} devices")
        arr = np.array(devs[:n]).reshape(tuple(shape))
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
