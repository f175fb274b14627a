"""Spatial (height-axis) sharding for high-resolution inference.

The reference's answer to large frames was per-RGB-channel chunked inference
and center-cropping (SURVEY §5 "long-context").  The TPU-native answer: shard
the image HEIGHT across chips and let XLA's SPMD partitioner insert the halo
exchanges for convolutions and the collectives for FFTs — no hand-written
communication, same numerics.

Use for frames too large for one chip's HBM or to cut per-frame latency
across a pod slice.  (With a 1-D mesh the same axis is reused; a 2-D
(data, spatial) mesh composes batch and height sharding.)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_image_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC with H sharded across the mesh axis."""
    return NamedSharding(mesh, P(None, axis, None, None))


def spatial_apply(fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Wrap `out = fn(weights, frame1, frame2)` so frames (NHWC) are H-sharded
    and weights replicated; XLA SPMD partitions the graph (conv halos,
    FFT collectives) automatically."""
    rep = NamedSharding(mesh, P())
    sh = spatial_image_sharding(mesh, axis)
    jfn = jax.jit(fn, in_shardings=(rep, sh, sh), out_shardings=sh)

    def wrapper(weights, f1, f2):
        f1 = jax.device_put(f1, sh)
        f2 = jax.device_put(f2, sh)
        return jfn(jax.device_put(weights, rep), f1, f2)

    return wrapper


def data_spatial_sharding(
    mesh: Mesh, batch_axis: str = "data", spatial_axis: str = "spatial"
) -> NamedSharding:
    """NHWC with batch over `batch_axis` AND height over `spatial_axis`."""
    return NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))


def fusion_spatial_apply(
    weights,
    mesh: Mesh,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    **kw,
) -> Callable:
    """2-D (data x spatial) fusion inference: batch sharded over `batch_axis`,
    image height over `spatial_axis`.  The conv subgraphs (AdaCoF U-Net,
    FusionNet, warp gathers) partition with halo exchanges; the FFT subgraphs
    are pinned to batch-only sharding inside the pipeline (XLA all-gathers the
    H-shards before them — see pipeline.interpolate._wsc).  Returns
    fn(frame1, frame2) -> fused frames with the same 2-D sharding."""
    from ..pipeline.interpolate import fusion_interpolate

    rep = NamedSharding(mesh, P())
    sh = data_spatial_sharding(mesh, batch_axis, spatial_axis)
    jfn = jax.jit(
        lambda w_, a, b: fusion_interpolate(
            w_, a, b, spatial_mesh=mesh, batch_axis=batch_axis,
            spatial_axis=spatial_axis, **kw
        ),
        in_shardings=(rep, sh, sh),
        out_shardings=sh,
    )
    weights_r = jax.device_put(weights, rep)

    def wrapper(f1, f2):
        return jfn(weights_r, jax.device_put(f1, sh), jax.device_put(f2, sh))

    return wrapper


def fusion_spatial_trainer(
    rng,
    h: int,
    w: int,
    phase_vars,
    adacof_vars,
    mesh: Mesh,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    **kw,
):
    """2-D (data x spatial) fusion TRAINING: the batch is sharded over
    `batch_axis` AND image height over `spatial_axis`, extending the
    inference-only 2-D path (fusion_spatial_apply) to the train step.

    Params/optimizer state are replicated and the step is jitted with
    explicit shardings, so XLA SPMD inserts the conv halo exchanges in the
    forward AND backward and the cross-device gradient reduction — no
    hand-written pmean, bit-comparable numerics to the single-device step
    (tests/test_parallel.py::test_fusion_spatial_train_step).

    Returns (state, step) like train.trainer.make_fusion_trainer; `step`
    is already jitted and device_puts its batch."""
    from ..train.trainer import make_fusion_trainer

    state, step = make_fusion_trainer(
        rng, h, w, phase_vars, adacof_vars,
        spatial_mesh=mesh, batch_axis=batch_axis, spatial_axis=spatial_axis,
        **kw,
    )
    rep = NamedSharding(mesh, P())
    sh = data_spatial_sharding(mesh, batch_axis, spatial_axis)
    jstep = jax.jit(
        step,
        in_shardings=(rep, (sh, sh, sh)),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )

    def wrapper(st, batch):
        batch = tuple(jax.device_put(jnp.asarray(b), sh) for b in batch)
        return jstep(st, batch)

    return state, wrapper


def adacof_spatial_trainer(
    rng,
    h: int,
    w: int,
    mesh: Mesh,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    **kw,
):
    """2-D (data x spatial) AdaCoF training — same contract as
    fusion_spatial_trainer.  Forces the XLA-gather warp (the Pallas kernel
    is a single-device program); XLA SPMD partitions the U-Net with halo
    exchanges and gathers the warp's source rows across the spatial axis."""
    from ..train.trainer import make_adacof_trainer

    state, step = make_adacof_trainer(rng, h, w, use_pallas=False, **kw)
    rep = NamedSharding(mesh, P())
    sh = data_spatial_sharding(mesh, batch_axis, spatial_axis)
    jstep = jax.jit(
        step,
        in_shardings=(rep, (sh, sh, sh)),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )

    def wrapper(st, batch):
        batch = tuple(jax.device_put(jnp.asarray(b), sh) for b in batch)
        return jstep(st, batch)

    return state, wrapper
