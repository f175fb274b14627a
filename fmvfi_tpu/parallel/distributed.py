"""Multi-host (multi-process) initialization and input-pipeline helpers.

The reference is strictly single-process/single-GPU (SURVEY §2.7: no
torch.distributed anywhere).  Here multi-host runs ride jax.distributed: one
process per host, all hosts seeing the global mesh; collectives ride ICI
within a slice and DCN across slices.  Per SURVEY §5, the only genuinely
multi-host-specific subsystem this framework needs is the input pipeline —
each host loads its own shard of the global batch (`local_batch_slice`) and
`jax.make_array_from_process_local_data` assembles the sharded global array.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the multi-host runtime (idempotent).

    On TPU pods with standard orchestration (GKE/TPU VM), all arguments are
    discovered automatically; pass them explicitly for manual clusters:

        initialize("10.0.0.1:1234", num_processes=4, process_id=rank)

    Must run before any other JAX call in the process."""
    # NOTE: the guard must NOT touch the local XLA backend (jax.process_count()
    # would initialize it, after which jax.distributed.initialize() always
    # raises "must be called before any JAX computations").
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process environment with no coordinator configured, or the
        # XLA backend is already up (tests): fine — the mesh helpers all
        # degrade to local devices
        if coordinator_address is not None:
            raise


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[start, stop) of the global batch this process should LOAD.  Each host
    reads only its shard (the DCN-side data-loading split, SURVEY §5)."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return i * per, (i + 1) * per


def global_batch_array(mesh: Mesh, local_batch: np.ndarray, axis: str = "data"):
    """Assemble a globally-sharded array from this process's local shard
    (host-local numpy -> global jax.Array over the mesh)."""
    spec = P(axis, *([None] * (local_batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_batch)
