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

    state, step = make_adacof_trainer(
        rng, h, w, use_pallas=False, spatial_mesh=mesh,
        batch_axis=batch_axis, spatial_axis=spatial_axis, **kw
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

def adacof_warp_tm_sharded(
    x,
    w_tm,
    a_tm,
    b_tm,
    dilation: int,
    mesh: Mesh,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    max_offset: int = 48,
):
    """Height-sharded AdaCoF warp with explicit halo exchange: each device
    ppermutes its boundary rows with the spatial neighbours, then runs the
    best single-device warp (the Pallas kernel on TPU — a single-device
    program XLA's SPMD partitioner cannot use — or the clipped XLA-gather
    warp elsewhere) on its local halo-padded block.  Replaces the
    auto-partitioned gather warp on 2-D (data x spatial) meshes, whose
    source-row gathers SPMD serves with cross-device full-frame gathers.

    Unlike ops.adacof_pallas.adacof_warp_fast_tm this takes the UNPADDED
    frame `x` (B, H, W, C): the kp = ((F-1)*dilation)//2 replicate padding
    is produced locally (edge shards replicate their own border rows, which
    is exactly what global replicate-padding plus index clamping yields).
    Fields are tap-major (F2, B, H, W); H and B must divide by the mesh's
    spatial/batch sizes.  Same clamp/gradient contract as
    adacof_warp_fast_tm (offsets clipped to +-max_offset, dx == 0).
    Returns (B, H, W, C), (batch x spatial)-sharded.
    """
    import math

    from ..ops.adacof_pallas import adacof_warp_fast_tm

    F = int(math.isqrt(w_tm.shape[0]))
    kp = ((F - 1) * dilation) // 2
    n_sp = mesh.shape[spatial_axis]
    # halo covers the largest vertical reach of any tap: clipped offset
    # (max_offset) + tap displacement relative to the centre (kp) + the
    # bilinear +1 row, so the local warp never clamps except where the
    # unsharded warp would clamp at the global border
    halo = max_offset + kp + 1
    h_loc = w_tm.shape[2] // n_sp
    if w_tm.shape[2] % n_sp or h_loc < halo:
        raise ValueError(
            f"H={w_tm.shape[2]} over {n_sp} spatial shards gives local "
            f"blocks of {h_loc} rows < halo {halo} (single-neighbour "
            f"exchange); lower max_offset (<= {h_loc - kp - 1}) or use "
            "fewer spatial shards"
        )
    pad_t = halo - kp  # zero-rows around the field shard (wasted rows)

    def local(xb, wb, ab, bb):
        idx = jax.lax.axis_index(spatial_axis)
        fwd = [(i, i + 1) for i in range(n_sp - 1)]
        bwd = [(i + 1, i) for i in range(n_sp - 1)]
        recv_top = jax.lax.ppermute(xb[:, -halo:], spatial_axis, fwd)
        recv_bot = jax.lax.ppermute(xb[:, :halo], spatial_axis, bwd)
        top = jnp.where(idx == 0, jnp.repeat(xb[:, :1], halo, axis=1), recv_top)
        bot = jnp.where(
            idx == n_sp - 1, jnp.repeat(xb[:, -1:], halo, axis=1), recv_bot
        )
        xl = jnp.concatenate([top, xb, bot], axis=1)
        xl = jnp.pad(xl, ((0, 0), (0, 0), (kp, kp), (0, 0)), mode="edge")

        fpad = ((0, 0), (0, 0), (pad_t, pad_t), (0, 0))
        out = adacof_warp_fast_tm(
            xl,
            jnp.pad(wb, fpad),
            jnp.pad(ab, fpad),
            jnp.pad(bb, fpad),
            dilation,
            max_offset=max_offset,
        )
        return out[:, pad_t : pad_t + wb.shape[2]]

    img = P(batch_axis, spatial_axis, None, None)
    fld = P(None, batch_axis, spatial_axis, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(img, fld, fld, fld),
        out_specs=img,
        check_vma=False,
    )(x, w_tm, a_tm, b_tm)
