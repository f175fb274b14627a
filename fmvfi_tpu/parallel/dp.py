"""Data-parallel execution of train/eval steps over a device mesh.

Replaces the reference's nothing (single-GPU only) with pjit-style sharding:
batch axis sharded over the `data` mesh axis, parameters/optimizer state
replicated.  XLA's sharding propagation inserts the gradient all-reduce over
ICI — no hand-written collectives needed for DP.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated


def data_parallel(step_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap `state, metrics = step_fn(state, batch)` so `batch` (a pytree of
    leading-batch-axis arrays) is sharded over the data axis and state stays
    replicated.  Returns the jitted step."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    # shardings are pytree prefixes: one sharding covers the whole subtree
    return jax.jit(
        step_fn,
        in_shardings=(rep, shard),
        out_shardings=(rep, rep),
    )


def data_parallel_apply(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap `out = fn(weights, *batched_args)` for sharded batch inference.
    One jitted executable per arity (built lazily, cached — NOT re-wrapped
    per call, which would pay dispatch/retrace overhead every time)."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    cache = {}

    def wrapper(weights, *args):
        n = len(args)
        if n not in cache:
            cache[n] = jax.jit(
                fn,
                in_shardings=(rep,) + (shard,) * n,
                out_shardings=shard,
            )
        return cache[n](weights, *args)

    return wrapper
