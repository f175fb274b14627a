"""Worker process for the multi-process data-parallel proof test.

Launched (2x) by tests/test_parallel.py::test_multiprocess_dp_matches_single.
Each process owns ONE CPU device, joins the cluster via
jax.distributed.initialize, loads only its slice of the global batch, and
runs one data-parallel AdaCoF train step.  Prints the (replicated) loss and
a parameter checksum for the parent to compare against the single-process
values — this is the verified-capability counterpart of
fmvfi_tpu/parallel/distributed.py (SURVEY §5: multi-host input pipeline).
"""

import sys

coordinator, rank = sys.argv[1], int(sys.argv[2])

import jax

jax.config.update("jax_platforms", "cpu")

from fmvfi_tpu.parallel import distributed

# must run before any backend-initializing JAX call (see distributed.py)
distributed.initialize(coordinator, num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1

import numpy as np
from jax.sharding import Mesh

from fmvfi_tpu.parallel.distributed import global_batch_array, local_batch_slice
from fmvfi_tpu.parallel.dp import data_parallel
from fmvfi_tpu.parallel.mesh import replicate
from fmvfi_tpu.train.trainer import make_adacof_trainer

GLOBAL_BATCH, H, W = 8, 32, 32
mesh = Mesh(np.array(jax.devices()), ("data",))

# identical deterministic "dataset" in every process; each loads ONLY its
# slice (the DCN-side split real multi-host input pipelines do)
rng = np.random.default_rng(0)
full = rng.uniform(0, 1, (3, GLOBAL_BATCH, H, W, 3)).astype(np.float32)
lo, hi = local_batch_slice(GLOBAL_BATCH)
assert (hi - lo) == GLOBAL_BATCH // 2
batch = tuple(global_batch_array(mesh, full[i, lo:hi]) for i in range(3))

state0, step = make_adacof_trainer(jax.random.key(1), H, W, kernel_size=3)
pstep = data_parallel(step, mesh)
state, metrics = pstep(replicate(mesh, state0), batch)

checksum = float(
    sum(jax.numpy.sum(jax.numpy.abs(x)) for x in jax.tree.leaves(state.params))
)
print(f"RESULT rank={rank} loss={float(metrics['loss']):.8f} ck={checksum:.6f}")
