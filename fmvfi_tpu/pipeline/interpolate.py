"""End-to-end interpolation pipelines, each ONE jittable pure function.

The reference runs this as a Python orchestration of 5 model invocations,
4 pyramid passes, CPU color conversions and CPU scipy filters per frame pair
(/root/reference/src/fusion_net/interpolate_twoframe.py:82-334, trainer.py
:65-220) — and even re-creates/reloads PhaseNet *per frame pair* inside the
eval loop (interpolate_twoframe.py:135-137).  Here the whole graph traces
once per resolution bucket and XLA fuses it; weights are plain pytrees passed
in, so there is nothing to "reload".

Layouts: frames are NHWC RGB float32 in [0,1].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.adacof import AdaCoFNet
from ..models.fusion_net import FusionNet
from ..models.phase_net import (
    PhaseNetCore,
    normalize_inputs,
    predictions_to_decomp,
)
from ..ops import decomp as dec_ops
from ..ops.color import lab_to_rgb, rgb_to_lab
from ..ops.filters import gaussian_blur, median_filter_fast
from ..ops.pyramid import (
    Decomp,
    decompose,
    decompose_coarse,
    finest_recon_mask,
    make_filters,
    max_pyr_height,
    reconstruct,
    reconstruct_coarse,
)


class FusionWeights(NamedTuple):
    """All frozen/learned weights of the fusion pipeline."""

    phase_net: dict
    adacof: dict
    fusion_net: dict


def _to_chan_batch(img: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B*3, H, W), batch-major then channel (matching the
    reference's rgb2lab(...).reshape((-1,) + hw) layout, trainer.py:231)."""
    b, h, w, c = img.shape
    return jnp.transpose(img, (0, 3, 1, 2)).reshape(b * c, h, w)


def _from_chan_batch(x: jnp.ndarray, channels: int = 3) -> jnp.ndarray:
    n, h, w = x.shape
    return jnp.transpose(x.reshape(n // channels, channels, h, w), (0, 2, 3, 1))


def _phase_net_predict(
    phase_vars,
    chan_batch: jnp.ndarray,
    filters,
    m=None,
    compute_dtype=None,
    spatial_mesh=None,
    batch_axis: str = "data",
):
    """Shared PhaseNet sub-graph: a packed 2-frame channel batch
    (2*B*3, H, W) -> predicted single-frame decomposition (B*3 leading)."""
    if spatial_mesh is not None:
        # Pin the packed frame stack to batch-only sharding BEFORE it meets
        # the shard_mapped FFT section: without the constraint SPMD
        # propagates an all-device sharding of the H axis onto the
        # frame-concat and pays an involuntary full rematerialization
        # converting it (the concatenate.307 warning in r2's dryrun); with
        # it, the (data x spatial) -> (data x replicated) change is a plain
        # spatial-group all-gather on the inputs.
        chan_batch = _wsc(chan_batch, spatial_mesh, batch_axis)
        vals = _shmap_batch(
            lambda flt, x: decompose(x, flt), spatial_mesh, batch_axis, 1
        )(filters, chan_batch)
    else:
        vals = decompose(chan_batch, filters)
    return _phase_net_from_vals(phase_vars, vals, compute_dtype=compute_dtype, m=m)


def _phase_net_from_vals(phase_vars, vals: Decomp, compute_dtype=None, m=None):
    """PhaseNet tail on an already-decomposed packed 2-frame batch (the
    streaming path reuses the previous frame's decomposition, so decompose
    and the net tail are separable)."""
    v1, v2 = dec_ops.split_frames(vals, 2)
    low, phases, amps = dec_ops.concat_for_net([v1, v2])
    lown, pn, an, norm = normalize_inputs(low, phases, amps)
    core = PhaseNetCore(num_img=2, dtype=compute_dtype)
    lo, pp, ap = core.apply(phase_vars, lown, pn, an, m=m)
    high = jnp.zeros_like(v1.high)  # zeros, core.py:142-145
    return predictions_to_decomp(lo, pp, ap, norm, high)


def _wsc(x, mesh, *spec):
    """Optional sharding constraint (no-op without a mesh)."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*spec))
    )


def _shmap_batch(fn, mesh, batch_axis, n_img_args, n_outs=1):
    """Run an FFT-heavy, per-sample-independent section under shard_map over
    the BATCH axis of a 2-D (data x spatial) mesh: each device computes its
    batch shard with ordinary local FFTs (replicated across the spatial axis
    — FFTs need whole rows/columns, so H-sharding them would force gathers
    anyway, and the XLA CPU backend additionally rejects the layouts SPMD
    propagation produces inside fft thunks).  `fn(filters, *imgs)`; images
    and outputs are leading-batch-axis arrays/pytrees."""
    from jax.sharding import PartitionSpec as P

    spec = P(batch_axis)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(),) + (spec,) * n_img_args,
        out_specs=spec if n_outs == 1 else (spec,) * n_outs,
        check_vma=False,
    )


def fusion_uncertainty(
    ada_pred: jnp.ndarray,
    phase_pred: jnp.ndarray,
    filters,
    spatial_mesh=None,
    batch_axis: str = "data",
):
    """Dispatch wrapper: under a 2-D mesh the whole (per-sample-independent)
    uncertainty section runs shard_mapped over the batch axis (NOT the
    spatial axis — FFT sections need whole rows/columns); see
    _fusion_uncertainty_impl for the math."""
    if spatial_mesh is not None:
        return _shmap_batch(
            _fusion_uncertainty_impl, spatial_mesh, batch_axis, 2, n_outs=2
        )(filters, ada_pred, phase_pred)
    return _fusion_uncertainty_impl(filters, ada_pred, phase_pred)


def _fusion_uncertainty_impl(filters, ada_pred: jnp.ndarray, phase_pred: jnp.ndarray):
    """The two pyramid-derived uncertainty maps of the fusion pipeline
    (trainer.py:122-146), restructured around linearity for the TPU:

    (a) phase uncertainty — reference: reconstruct the finest band + highpass
        of each prediction, channel-mean, |difference|, gaussian.  Every step
        up to the |.| is linear, so it collapses to ONE spectral multiply on
        the channel-mean difference image: |Re ifft(fft(mean_c(ada - ph)) *
        M0)| — one full-res FFT pair instead of 2x3 decompose + partial
        reconstructs (see ops.pyramid.finest_recon_mask).

    (b) adacof artifact uncertainty — reference: |band difference| of the 6
        coarsest levels, reconstructed, channel-meaned, minus its 50x50
        median.  The coarse decompositions never need the full-plane DFT
        (windowed axis FFTs, ops.pyramid.decompose_coarse), and since the
        reconstruction is linear in the complex band, the 3 channels'
        difference-bands are averaged BEFORE reconstruction (3x less work,
        identical output).

    Returns (ada_uncertainty, phase_uncertainty), each (B, H, W)."""
    from ..ops.pyramid import _fft2s, _ifft2s

    b, h, w, _ = ada_pred.shape
    nlev = filters.height - 2

    # (a) phase uncertainty
    g = jnp.mean(ada_pred - phase_pred, axis=-1)  # (B, H, W)
    h_diff = jnp.abs(jnp.real(_ifft2s(_fft2s(g) * finest_recon_mask(filters))))
    phase_unc = gaussian_blur(jnp.clip(h_diff * 100.0, 0.0, 1.0), 5.0)

    # (b) adacof artifact uncertainty
    start = max(nlev - 6, 0)
    rgb_batch = jnp.concatenate(
        [_to_chan_batch(ada_pred), _to_chan_batch(phase_pred)], 0
    )
    vals = decompose_coarse(rgb_batch, filters, start)
    vals_ada, vals_ph = dec_ops.split_frames(vals, 2)

    def chan_mean(x):  # (B*3, ...) -> (B, ...)
        return x.reshape((b, 3) + x.shape[1:]).mean(axis=1)

    phases, amps = [], []
    for lvl in range(nlev):
        if lvl < start:
            sh = (b, filters.nbands) + filters.level_shapes[lvl]
            phases.append(jnp.zeros(sh, jnp.float32))
            amps.append(jnp.zeros(sh, jnp.float32))
            continue
        da = jnp.abs(vals_ph.amplitude[lvl] - vals_ada.amplitude[lvl])
        dp = jnp.abs(vals_ph.phase[lvl] - vals_ada.phase[lvl])
        band = chan_mean(da * jnp.exp(1j * dp))
        amps.append(jnp.abs(band))
        phases.append(jnp.arctan2(jnp.imag(band), jnp.real(band)))
    low = chan_mean(jnp.abs(vals_ph.low - vals_ada.low))
    dvals = Decomp(
        high=jnp.zeros((b, h, w), jnp.float32),
        low=low,
        phase=tuple(phases),
        amplitude=tuple(amps),
    )
    freq_diff = reconstruct_coarse(dvals, filters, start) * 30.0
    freq_med = median_filter_fast(freq_diff, size=50)
    ada_unc = jnp.clip(jnp.abs(freq_diff - freq_med) * 5.0, 0.0, 1.0)
    return ada_unc, phase_unc


def phase_interpolate(
    phase_vars,
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    height: Optional[int] = None,
    filters=None,
    spatial_mesh=None,
    batch_axis: str = "data",
) -> jnp.ndarray:
    """PhaseNet-only interpolation (config 1 of BASELINE.json).

    Pass `filters` (a PyramidFilters pytree) explicitly when jitting at high
    resolution so the masks are traced HBM arguments, not HLO constants.
    `spatial_mesh`: run the FFT sections shard_mapped over the batch axis of
    a multi-axis mesh (see fusion_interpolate)."""
    b, h, w, _ = frame1.shape
    if filters is None:
        filters = make_filters(h, w, height or max_pyr_height(h, w))
    # pin the concat INPUTS to batch sharding under a 2-D mesh — same
    # involuntary-remat fix as fusion_interpolate's frame-stack concat
    lab = jnp.concatenate(
        [
            _wsc(_to_chan_batch(rgb_to_lab(frame1)), spatial_mesh, batch_axis),
            _wsc(_to_chan_batch(rgb_to_lab(frame2)), spatial_mesh, batch_axis),
        ],
        0,
    )
    dec = _phase_net_predict(
        phase_vars, lab, filters, spatial_mesh=spatial_mesh, batch_axis=batch_axis
    )
    if spatial_mesh is not None:
        lab_pred = _shmap_batch(
            lambda flt, d: reconstruct(d, flt), spatial_mesh, batch_axis, 1
        )(filters, dec)
    else:
        lab_pred = reconstruct(dec, filters)
    return jnp.clip(lab_to_rgb(_from_chan_batch(lab_pred)), 0.0, 1.0)


def adacof_interpolate(
    adacof_vars,
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    kernel_size: int = 5,
    dilation: int = 1,
) -> jnp.ndarray:
    """AdaCoF-only interpolation (config 2)."""
    model = AdaCoFNet(kernel_size=kernel_size, dilation=dilation)
    return jnp.clip(model.apply(adacof_vars, frame1, frame2).blended, 0.0, 1.0)


def fusion_interpolate(
    weights: FusionWeights,
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    kernel_size: int = 5,
    dilation: int = 1,
    height: Optional[int] = None,
    return_parts: bool = False,
    filters=None,
    compute_dtype=None,
    spatial_mesh=None,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    variant: int = 0,
    uncertainty_maps: int = 3,
    seq_chunk: int = 0,
):
    """The full fusion pipeline (trainer.predict / interp, §3.3 of SURVEY):

    1. AdaCoF prediction + flow-variance uncertainty,
    2. PhaseNet prediction through the steerable pyramid (Lab domain),
    3. phase/adacof band-difference uncertainty maps (on-device gaussian +
       median filters replacing trainer.py:134,143's CPU scipy),
    4. 3-pass AdaCoF baseline composite (trainer.py:149-159),
    5. FusionNet residual blend.

    Pass `filters` explicitly when jitting at high resolution (see
    phase_interpolate).

    `spatial_mesh`: a 2-D (data x spatial) Mesh for H-sharded execution of
    the conv subgraphs — the FFT subgraphs are pinned to batch-only sharding
    (see _wsc); the warp uses the XLA-gather path under spatial sharding
    (the Pallas kernel is a single-device program).

    `variant`/`uncertainty_maps` select the reference's published checkpoint
    modes (fusion_net.py:69-77, fusion_net/train.py:79): (0, 3) is the
    default `fusion_net.pt`; (1, 3) is `fusion_net_phase.pt` (residual on
    the PhaseNet prediction); (0, 0) is `fusion_net_nouncertainty.pt` — the
    uncertainty-map section (and AdaCoF's flow-stats tail) is skipped
    entirely, saving ~45 ms/frame at 1080p.

    `seq_chunk` (0 = off): run the activation-heavy middle sections
    (PhaseNet + pyramid decompose/reconstruct, uncertainty maps, the 3-pass
    baseline composite) over batch chunks of this size under `lax.map`
    INSIDE the same jit, bounding their peak live activations near the
    chunk-size footprint while the MXU-bound AdaCoF main pass and FusionNet
    blend stay fully batched.  Identical math (per-sample-independent
    sections; pinned by tests/test_pipeline.py::test_fusion_seq_chunk).
    Those sections are HBM-bandwidth-bound at high resolution, so
    sequentialising them costs ~no throughput — this is what makes batch>1
    offline dispatch FIT at 1080p (bs=2 OOMed a 16 GB chip unchunked).
    Requires b % seq_chunk == 0; incompatible with spatial_mesh."""
    b, full_h, full_w, _ = frame1.shape
    # FusionNet's encoder/decoder needs /8 spatial dims (models/fusion_net.py);
    # AdaCoF already pads itself to /32 internally.  Off-grid inputs are
    # reflect-padded here and every output cropped back — the reference
    # instead center-crops to --dim (interpolate_twoframe.py:109-113), losing
    # pixels; we keep them all.
    pad_h = (-full_h) % 8
    pad_w = (-full_w) % 8
    if pad_h or pad_w:
        pad = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
        frame1 = jnp.pad(frame1, pad, mode="reflect")
        frame2 = jnp.pad(frame2, pad, mode="reflect")
    b, h, w, _ = frame1.shape
    if filters is None:
        filters = make_filters(h, w, height or max_pyr_height(h, w))
    adacof = AdaCoFNet(
        kernel_size=kernel_size,
        dilation=dilation,
        dtype=compute_dtype,
        # under a spatial mesh the warp goes through the halo-exchange
        # shard_map (per-device fast kernel); the SPMD gather warp is the
        # fallback when shapes don't shard (use_pallas=False: the plain
        # Pallas kernel is a single-device program)
        use_pallas=False if spatial_mesh is not None else None,
        with_stats=uncertainty_maps != 0,
        spatial_mesh=spatial_mesh,
        batch_axis=batch_axis,
        spatial_axis=spatial_axis,
    )

    # 1. AdaCoF
    ada_out = adacof.apply(weights.adacof, frame1, frame2)
    ada_pred = ada_out.blended
    if uncertainty_maps:
        flow_var_map = ada_out.uncertainty[..., 0]  # (B, H, W)

    adacof_lite = AdaCoFNet(
        kernel_size=kernel_size,
        dilation=dilation,
        dtype=compute_dtype,
        # same warp routing as the main pass (halo-exchange shard_map under
        # a spatial mesh, SPMD gather fallback)
        use_pallas=False if spatial_mesh is not None else None,
        with_stats=False,
        spatial_mesh=spatial_mesh,
        batch_axis=batch_axis,
        spatial_axis=spatial_axis,
    )

    def _mid_sections(f1, f2, ada_p):
        """Sections 2-4 — per-sample independent, so they can run whole-batch
        (inline) or per-chunk under lax.map (seq_chunk)."""
        # 2. PhaseNet (Lab domain).  Under a 2-D mesh the frame-stack
        # concat's INPUTS are pinned to batch-only sharding: pinning only the
        # concat output (r2) left SPMD free to give the concat an all-device
        # H sharding and pay an involuntary full rematerialization converting
        # it (concatenate.307); with the inputs pinned, the (data x spatial)
        # -> (data x replicated) change is a plain spatial-group all-gather
        # on each frame and the concat is born batch-sharded.
        lab1 = rgb_to_lab(f1)
        lab2 = rgb_to_lab(f2)
        lab_batch = jnp.concatenate(
            [
                _wsc(_to_chan_batch(lab1), spatial_mesh, batch_axis),
                _wsc(_to_chan_batch(lab2), spatial_mesh, batch_axis),
            ],
            0,
        )
        dec = _phase_net_predict(
            weights.phase_net,
            lab_batch,
            filters,
            compute_dtype=compute_dtype,
            spatial_mesh=spatial_mesh,
            batch_axis=batch_axis,
        )
        if spatial_mesh is not None:
            lab_pred = _shmap_batch(
                lambda flt, d: reconstruct(d, flt), spatial_mesh, batch_axis, 1
            )(filters, dec)
        else:
            lab_pred = reconstruct(dec, filters)
        phase_pred = jnp.clip(lab_to_rgb(_from_chan_batch(lab_pred)), 0.0, 1.0)
        phase_pred = _wsc(phase_pred, spatial_mesh, batch_axis, spatial_axis)

        # 3. uncertainty maps (trainer.py:122-146), frequency-domain fast
        # path — see fusion_uncertainty for the linearity restructuring.
        # Skipped entirely for the no-maps ablation
        # (fusion_net_nouncertainty.pt).
        unc = (
            fusion_uncertainty(
                ada_p, phase_pred, filters, spatial_mesh, batch_axis
            )
            if uncertainty_maps
            else ()
        )

        # 4. baseline: AdaCoF(AdaCoF(f1, phase), AdaCoF(phase, f2)).  The
        # first two passes are independent -> ONE batched call (B doubled);
        # all three passes skip the flow-stats tail (only .blended is
        # consumed).
        lhs = jnp.concatenate([f1, phase_pred], axis=0)
        rhs = jnp.concatenate([phase_pred, f2], axis=0)
        mids = adacof_lite.apply(weights.adacof, lhs, rhs).blended
        in1, in2 = jnp.split(mids, 2, axis=0)
        base = adacof_lite.apply(weights.adacof, in1, in2).blended
        return phase_pred, lab1, lab2, base, unc

    if seq_chunk and seq_chunk < b:
        if spatial_mesh is not None:
            raise ValueError("seq_chunk is incompatible with spatial_mesh")
        if b % seq_chunk:
            raise ValueError(f"batch {b} not divisible by seq_chunk {seq_chunk}")
        n = b // seq_chunk

        def _chunk(x):
            return x.reshape((n, seq_chunk) + x.shape[1:])

        def _merge(x):
            return x.reshape((b,) + x.shape[2:])

        outs = jax.lax.map(
            lambda t: _mid_sections(*t),
            (_chunk(frame1), _chunk(frame2), _chunk(ada_pred)),
        )
        phase_pred, lab1, lab2, base, unc = jax.tree.map(_merge, outs)
    else:
        phase_pred, lab1, lab2, base, unc = _mid_sections(
            frame1, frame2, ada_pred
        )
    if uncertainty_maps:
        ada_uncertainty, phase_uncertainty = unc

    # 5. FusionNet blend; other = Lab frames (trainer.py:208), maps order
    # [ada_unc, phase_unc, flow_var] (trainer.py:210)
    other = jnp.concatenate([lab1, lab2], axis=-1)
    if uncertainty_maps:
        maps = jnp.stack(
            [ada_uncertainty, phase_uncertainty, flow_var_map], axis=-1
        )
    else:
        maps = None
    fusion = FusionNet(dtype=compute_dtype, uncertainty_maps=uncertainty_maps)
    final = fusion.apply(
        weights.fusion_net, base, ada_pred, phase_pred, other, maps, variant
    )
    crop = (
        (lambda t: t[:, :full_h, :full_w]) if (pad_h or pad_w) else (lambda t: t)
    )
    final = crop(final)
    if return_parts:
        parts = {
            "phase": crop(phase_pred),
            "adacof": crop(ada_pred),
            "baseline": crop(base),
        }
        if uncertainty_maps:
            parts["maps"] = crop(maps)
        return final, parts
    return final


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size",
        "dilation",
        "height",
        "compute_dtype",
        "variant",
        "uncertainty_maps",
        "seq_chunk",
    ),
)
def fusion_interpolate_jit(
    weights,
    frame1,
    frame2,
    kernel_size=5,
    dilation=1,
    height=None,
    filters=None,
    compute_dtype=None,
    variant=0,
    uncertainty_maps=3,
    seq_chunk=0,
):
    return fusion_interpolate(
        weights,
        frame1,
        frame2,
        kernel_size,
        dilation,
        height,
        filters=filters,
        compute_dtype=compute_dtype,
        variant=variant,
        uncertainty_maps=uncertainty_maps,
        seq_chunk=seq_chunk,
    )


@jax.jit
def phase_interpolate_jit(phase_vars, frame1, frame2, filters=None):
    return phase_interpolate(phase_vars, frame1, frame2, filters=filters)


class FusionStreamCarry(NamedTuple):
    """Device-resident state carried between `fusion_stream_step` calls.

    `frame/lab/dec` describe the NEWEST frame (reused as frame-1 of the next
    pair, so each frame is color-converted and pyramid-decomposed exactly
    once per stream).  The remaining fields are the PENDING pair's tensors:
    its baseline pass-3 and FusionNet blend are deferred one step so the
    pass-3 U-Net batches with the next pair's main AdaCoF pass."""

    frame: jnp.ndarray  # (B, H, W, 3) RGB
    lab: jnp.ndarray  # (B, H, W, 3) Lab
    dec: Decomp  # decomposition of the Lab channel batch (B*3 leading)
    mids: jnp.ndarray  # (2B, H, W, 3) baseline passes 1+2 of the pending pair
    ada_pred: jnp.ndarray  # (B, H, W, 3)
    phase_pred: jnp.ndarray  # (B, H, W, 3)
    other: jnp.ndarray  # (B, H, W, 6) lab1 || lab2 of the pending pair
    maps: Optional[jnp.ndarray]  # (B, H, W, 3) or None (no-maps ablation)


def fusion_stream_init(
    frame0: jnp.ndarray, filters, uncertainty_maps: int = 3
) -> FusionStreamCarry:
    """Prime a streaming-fusion carry with the first frame of a video.

    The first `fusion_stream_step` output finishes this dummy pending pair
    and must be discarded by the caller."""
    b, h, w, _ = frame0.shape
    assert h % 8 == 0 and w % 8 == 0, "stream frames must be on the /8 grid"
    lab0 = rgb_to_lab(frame0)
    dec0 = decompose(_to_chan_batch(lab0), filters)
    z = jnp.zeros_like(frame0)
    return FusionStreamCarry(
        frame=frame0,
        lab=lab0,
        dec=dec0,
        mids=jnp.concatenate([z, z], axis=0),
        ada_pred=z,
        phase_pred=z,
        other=jnp.zeros((b, h, w, 6), frame0.dtype),
        maps=(jnp.zeros((b, h, w, 3), frame0.dtype) if uncertainty_maps else None),
    )


def fusion_stream_step(
    weights: FusionWeights,
    carry: FusionStreamCarry,
    frame_next: jnp.ndarray,
    kernel_size: int = 5,
    dilation: int = 1,
    filters=None,
    compute_dtype=None,
    variant: int = 0,
    uncertainty_maps: int = 3,
) -> Tuple[FusionStreamCarry, jnp.ndarray]:
    """One step of streaming fusion over a video: consume the next frame,
    emit the fused middle frame of the PREVIOUS pair (one-step latency).

    Identical math to per-pair `fusion_interpolate`, restructured for a
    frame stream (the serving shape of interpolate_video.py:84-114):

    * the shared frame between consecutive pairs is color-converted and
      pyramid-decomposed ONCE (carry.dec) — halves the decompose stage;
    * the pending pair's baseline pass-3 U-Net runs BATCHED with the next
      pair's main AdaCoF pass (both independent), so each step runs two
      batch-2 AdaCoF units instead of batch-1 + batch-2 + batch-1.

    Single-device serving path (no spatial_mesh; use fusion_interpolate for
    sharded execution)."""
    f2, lab2, dec2 = carry.frame, carry.lab, carry.dec
    b, h, w, _ = f2.shape
    assert frame_next.shape == f2.shape
    if filters is None:
        filters = make_filters(h, w, max_pyr_height(h, w))

    lab3 = rgb_to_lab(frame_next)
    dec3 = decompose(_to_chan_batch(lab3), filters)

    # main AdaCoF of pair (f2, f3) batched with pass-3 of the pending pair
    adacof = AdaCoFNet(
        kernel_size=kernel_size,
        dilation=dilation,
        dtype=compute_dtype,
        with_stats=uncertainty_maps != 0,
        # the pass-3 half batched behind the main pair only consumes
        # .blended — don't run the flow-stats/uncertainty tail for it
        stats_batch=b if uncertainty_maps else None,
    )
    pm1, pm2 = jnp.split(carry.mids, 2, axis=0)
    out2 = adacof.apply(
        weights.adacof,
        jnp.concatenate([f2, pm1], axis=0),
        jnp.concatenate([frame_next, pm2], axis=0),
    )
    ada_pred, base_prev = jnp.split(out2.blended, 2, axis=0)
    if uncertainty_maps:
        flow_var_map = out2.uncertainty[..., 0]

    # PhaseNet: cached dec2 + fresh dec3
    dec_pred = _phase_net_from_vals(
        weights.phase_net,
        dec_ops.concat_frames([dec2, dec3]),
        compute_dtype=compute_dtype,
    )
    phase_pred = jnp.clip(
        lab_to_rgb(_from_chan_batch(reconstruct(dec_pred, filters))), 0.0, 1.0
    )

    if uncertainty_maps:
        ada_unc, phase_unc = fusion_uncertainty(ada_pred, phase_pred, filters)
        maps = jnp.stack([ada_unc, phase_unc, flow_var_map], axis=-1)
    else:
        maps = None

    # baseline passes 1+2 of the new pair (pass 3 deferred to the next step)
    adacof_lite = AdaCoFNet(
        kernel_size=kernel_size,
        dilation=dilation,
        dtype=compute_dtype,
        with_stats=False,
    )
    mids = adacof_lite.apply(
        weights.adacof,
        jnp.concatenate([f2, phase_pred], axis=0),
        jnp.concatenate([phase_pred, frame_next], axis=0),
    ).blended

    # finish the PENDING pair: FusionNet on its carried tensors + fresh base
    fusion = FusionNet(dtype=compute_dtype, uncertainty_maps=uncertainty_maps)
    fused_prev = fusion.apply(
        weights.fusion_net,
        base_prev,
        carry.ada_pred,
        carry.phase_pred,
        carry.other,
        carry.maps,
        variant,
    )

    new_carry = FusionStreamCarry(
        frame=frame_next,
        lab=lab3,
        dec=dec3,
        mids=mids,
        ada_pred=ada_pred,
        phase_pred=phase_pred,
        other=jnp.concatenate([lab2, lab3], axis=-1),
        maps=maps,
    )
    return new_carry, fused_prev


def fusion_stream_scan(
    weights: FusionWeights,
    carry: FusionStreamCarry,
    frames: jnp.ndarray,
    kernel_size: int = 5,
    dilation: int = 1,
    filters=None,
    compute_dtype=None,
    variant: int = 0,
    uncertainty_maps: int = 3,
) -> Tuple[FusionStreamCarry, jnp.ndarray]:
    """`lax.scan` of `fusion_stream_step` over a (T, B, H, W, 3) frame
    window INSIDE one jit — the round-3 streaming path paid a full
    host-side jit boundary per frame, which forced every carried pyramid
    band to materialize in a fixed layout each step and measured 0.55 vs
    1.07 fps at 1080p; scanned, the carry is a device-internal loop
    variable (double-buffered by XLA, no host sync, no allocator stall)
    and only window edges cross the boundary (1/T of the old cost).

    Returns (final carry, (T, B, H, W, 3) fused outputs) with the same
    one-step-latency semantics as `fusion_stream_step`: output t finishes
    the pair pending BEFORE frame t was consumed, so the first output of a
    freshly-primed stream is garbage and the caller feeds one extra flush
    frame at the end (see pipeline.video._double_frame_rate_stream).

    Replaces the per-pair Python loop of the reference's
    interpolate_video.py:84-114 as the serving fast path."""
    if filters is None:
        b, h, w = frames.shape[1:4]
        filters = make_filters(h, w, max_pyr_height(h, w))

    def body(c, f):
        return fusion_stream_step(
            weights,
            c,
            f,
            kernel_size=kernel_size,
            dilation=dilation,
            filters=filters,
            compute_dtype=compute_dtype,
            variant=variant,
            uncertainty_maps=uncertainty_maps,
        )

    return jax.lax.scan(body, carry, frames)


def baseline_interpolate(
    weights: FusionWeights,
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    kernel_size: int = 5,
    dilation: int = 1,
    filters=None,
) -> jnp.ndarray:
    """The reference's --baseline output (evaluate.py writes it as the 4th
    method, interpolate.py:150-158): the spectral-split composite of the
    PhaseNet prediction (low half-spectrum) and the AdaCoF prediction (high
    half-spectrum)."""
    b, h, w, _ = frame1.shape
    if filters is None:
        filters = make_filters(h, w, max_pyr_height(h, w))
    ada = AdaCoFNet(
        kernel_size=kernel_size, dilation=dilation, with_stats=False
    ).apply(weights.adacof, frame1, frame2)
    phase_pred = phase_interpolate(
        weights.phase_net, frame1, frame2, filters=filters
    )
    return spectral_baseline(phase_pred, jnp.clip(ada.blended, 0.0, 1.0))


def spectral_baseline(
    frame_lowsrc: jnp.ndarray, frame_highsrc: jnp.ndarray, height: Optional[int] = None
) -> jnp.ndarray:
    """--output_baseline composite (interpolate_twoframe.py:286-322): low half
    of the spectrum from one prediction (PhaseNet), high half from the other
    (AdaCoF), recombined through the pyramid.  RGB NHWC in/out."""
    b, h, w, _ = frame_lowsrc.shape
    filters = make_filters(h, w, height or max_pyr_height(h, w))
    lab_lo = _to_chan_batch(rgb_to_lab(frame_lowsrc))
    lab_hi = _to_chan_batch(rgb_to_lab(frame_highsrc))
    v_lo = decompose(lab_lo, filters)
    v_hi = decompose(lab_hi, filters)
    split = len(v_lo.phase) // 2
    mixed = Decomp(
        high=v_hi.high,
        low=v_lo.low,
        phase=tuple(v_lo.phase[:split]) + tuple(v_hi.phase[split:]),
        amplitude=tuple(v_lo.amplitude[:split]) + tuple(v_hi.amplitude[split:]),
    )
    lab = reconstruct(mixed, filters)
    return jnp.clip(lab_to_rgb(_from_chan_batch(lab)), 0.0, 1.0)
