"""Complex steerable pyramid (Simoncelli/Freeman), TPU-native.

The reference consumes an *external, unvendored* package
(`steerable.SCFpyr_PyTorch`, imported at /root/reference/src/train/pyramid.py:7)
for its core signal decomposition.  This module re-derives that math from the
original construction (Portilla & Simoncelli) as pure JAX functions:

- FFT-domain decomposition with a radial raised-cosine high/low split,
  `nbands` oriented angular masks per level, and frequency-domain
  downsampling by `scale_factor` (sqrt(2) half-octave levels in this repo).
- All filter masks are precomputed as static numpy constants per input shape
  (XLA static-shape world: one compiled program per resolution bucket), so a
  decompose/reconstruct is nothing but fft2 -> mask multiplies -> ifft2 that
  XLA fuses freely.

Conventions (shape contract mirrors /root/reference/src/train/pyramid.py:48-78):
- `decompose(img)` takes (N, H, W) float32 and returns `Decomp` with
  - high:  (N, H, W)      real highpass residual
  - low:   (N, hL, wL)    real lowpass residual
  - phase: tuple over levels, level 0 = FINEST, each (N, nbands, h_l, w_l)
  - amplitude: same shapes as phase
  phase = angle(z) (== imag(log z) at pyramid.py:64), amplitude = abs(z).
- `reconstruct(decomp)` inverts it (tight-frame reconstruction).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class Decomp(NamedTuple):
    """Pyramid decomposition pytree (the reference's DecompValues,
    /root/reference/src/train/utils.py:10-16, re-laid-out as (N, nbands, h, w))."""

    high: jnp.ndarray
    low: jnp.ndarray
    phase: Tuple[jnp.ndarray, ...]  # level 0 = finest
    amplitude: Tuple[jnp.ndarray, ...]


import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PyramidFilters:
    """Filter bank for one (H, W, height, nbands, scale) bucket.

    Registered as a pytree so masks travel as *traced array arguments* (HBM
    data) rather than giant HLO constants — at 1080p x 17 levels the masks
    total ~100MB, which must not be inlined into the compiled program (the
    remote-compile path rejects such payloads, and constants bloat every
    executable).  Mask arrays are real float32; the unit complex factors
    (+-i)^(nbands-1) are applied as scalars outside the FFTs."""

    # static metadata
    height: int = dataclasses.field(metadata=dict(static=True))
    nbands: int = dataclasses.field(metadata=dict(static=True))
    scale_factor: float = dataclasses.field(metadata=dict(static=True))
    in_shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    crops: Tuple[Tuple[int, int, int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    level_shapes: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    low_shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    # array leaves (all real float32)
    hi0: object = dataclasses.field(metadata=dict(static=False), default=None)
    lo0: object = dataclasses.field(metadata=dict(static=False), default=None)
    band_masks: Tuple = dataclasses.field(metadata=dict(static=False), default=())
    synth_masks: Tuple = dataclasses.field(metadata=dict(static=False), default=())
    lo_masks: Tuple = dataclasses.field(metadata=dict(static=False), default=())


def max_pyr_height(h: int, w: int) -> int:
    """Resolution-dependent pyramid height: ceil((log2(min(H,W))-3)*2)+2.

    Matches calc_pyr_height at /root/reference/src/train/utils.py:168-171
    (12 for 256x256, 14 for 512x512, 15 for 720p)."""
    return int(np.ceil((np.log2(min(h, w)) - 3) * 2) + 2)


def _prepare_grid(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Normalized log-radius and angle grids over the fftshifted frequency plane."""
    y = (np.arange(h) - h // 2) / (h / 2)
    x = (np.arange(w) - w // 2) / (w / 2)
    xv, yv = np.meshgrid(x, y)
    angle = np.arctan2(yv, xv)
    rad = np.sqrt(xv**2 + yv**2)
    # avoid log(0) at DC: reuse the neighbour's radius
    rad[h // 2, w // 2] = rad[h // 2, max(w // 2 - 1, 0)]
    log_rad = np.log2(rad)
    return log_rad, angle


def _hi_mask(log_rad: np.ndarray, pos: float) -> np.ndarray:
    """Radial raised-cosine highpass: sqrt of an rcos 0->1 transition over
    log_rad in [pos, pos+1] (rcosFn(1, pos) then sqrt)."""
    t = np.clip(log_rad - pos, 0.0, 1.0)
    return np.sin(0.5 * np.pi * t).astype(np.float32)


def _lo_mask(log_rad: np.ndarray, pos: float) -> np.ndarray:
    t = np.clip(log_rad - pos, 0.0, 1.0)
    return np.cos(0.5 * np.pi * t).astype(np.float32)


def _angle_const(nbands: int) -> float:
    order = nbands - 1
    return (
        (2.0 ** (2 * order))
        * (math.factorial(order) ** 2)
        / (nbands * math.factorial(2 * order))
    )


def _angle_masks(angle: np.ndarray, nbands: int) -> np.ndarray:
    """ANALYSIS angular masks: oriented half-plane cos^(nbands-1),
    2*sqrt(const) normalized (the analytic-signal side of the frame)."""
    order = nbands - 1
    const = _angle_const(nbands)
    masks = []
    for b in range(nbands):
        shifted = angle - np.pi * b / nbands
        wrapped = np.mod(shifted + np.pi, 2 * np.pi) - np.pi
        m = (
            2.0
            * np.sqrt(const)
            * (np.cos(wrapped) ** order)
            * (np.abs(wrapped) < np.pi / 2)
        )
        masks.append(m.astype(np.float32))
    return np.stack(masks, axis=0)


def _angle_masks_synth(angle: np.ndarray, nbands: int) -> np.ndarray:
    """SYNTHESIS angular masks: sqrt(const) * cos^(nbands-1) over the FULL
    plane (signed, no half-plane cutoff, no factor 2).  Together with the
    final real() the analysis/synthesis pair sums to an exact partition of
    unity: sum_b a_b(t)*s_b(t) + mirror = 2, halved by Re{.}."""
    order = nbands - 1
    const = _angle_const(nbands)
    masks = []
    for b in range(nbands):
        shifted = angle - np.pi * b / nbands
        m = np.sqrt(const) * (np.cos(shifted) ** order)
        masks.append(m.astype(np.float32))
    return np.stack(masks, axis=0)


def _crop_indices(dims: Tuple[int, int], scale_factor: float):
    """Centered frequency-domain crop implementing downsampling by scale_factor.

    Generalizes the factor-2 index rule of the canonical implementation:
    new = ceil((dims-0.5)/s); start = ceil((dims+0.5)/2) - ceil((new+0.5)/2)."""
    d = np.asarray(dims, dtype=np.float64)
    new = np.ceil((d - 0.5) / scale_factor).astype(int)
    start = (np.ceil((d + 0.5) / 2) - np.ceil((new + 0.5) / 2)).astype(int)
    end = start + new
    return (int(start[0]), int(end[0]), int(start[1]), int(end[1])), (
        int(new[0]),
        int(new[1]),
    )


@functools.lru_cache(maxsize=32)
def make_filters(
    h: int, w: int, height: int, nbands: int = 4, scale_factor: float = math.sqrt(2)
) -> PyramidFilters:
    """Build the static filter bank for input shape (h, w).

    `height` counts ALL levels including the high/low residuals, so there are
    `height - 2` oriented band levels (the reference's convention)."""
    nlevels = height - 2
    if nlevels < 1:
        raise ValueError(f"height must be >= 3, got {height}")
    log_rad, angle = _prepare_grid(h, w)
    # Transition START position.  The canonical rcosFn(width=1, position=-0.5)
    # of matlabPyrTools (inherited by the unvendored steerable package) puts
    # the half-power point AT -0.5, i.e. the transition spans log_rad
    # [-1, 0] (pi/2 .. pi) — so the start is -1.0.  (A previous revision used
    # -0.5 here, leaving the whole bank a half-octave high vs. the package
    # the published phase_net.pt was trained against; caught by the
    # tests/test_pyramid_oracle.py transcription of the original table-lookup
    # construction.)
    pos = -1.0
    hi0 = _hi_mask(log_rad, pos)
    lo0 = _lo_mask(log_rad, pos)

    band_masks = []
    synth_masks = []
    lo_masks = []
    crops = []
    level_shapes = []
    cur_log_rad, cur_angle = log_rad, angle
    cur_dims = (h, w)
    for _ in range(nlevels):
        pos = pos - math.log2(scale_factor)
        him = _hi_mask(cur_log_rad, pos)
        ang = _angle_masks(cur_angle, nbands)
        ang_s = _angle_masks_synth(cur_angle, nbands)
        # stored real; the unit complex factors (-i)^(n-1) (analysis) and
        # (+i)^(n-1) (synthesis) are scalars applied outside the FFT.
        band_masks.append((ang * him[None]).astype(np.float32))
        synth_masks.append((ang_s * him[None]).astype(np.float32))
        level_shapes.append(cur_dims)

        (r0, r1, c0, c1), new_dims = _crop_indices(cur_dims, scale_factor)
        if min(new_dims) < 2:
            raise ValueError(
                f"pyramid too deep for {h}x{w}: level shape would be {new_dims}"
            )
        crops.append((r0, r1, c0, c1))
        cur_log_rad = cur_log_rad[r0:r1, c0:c1]
        cur_angle = cur_angle[r0:r1, c0:c1]
        cur_dims = new_dims
        lo_masks.append(_lo_mask(cur_log_rad, pos))

    return PyramidFilters(
        height=height,
        nbands=nbands,
        scale_factor=scale_factor,
        in_shape=(h, w),
        crops=tuple(crops),
        level_shapes=tuple(level_shapes),
        low_shape=cur_dims,
        hi0=hi0,
        lo0=lo0,
        band_masks=tuple(band_masks),
        synth_masks=tuple(synth_masks),
        lo_masks=tuple(lo_masks),
    )


def _cfact(nbands: int) -> complex:
    return (0.0 - 1.0j) ** (nbands - 1)


def _cfact_synth(nbands: int) -> complex:
    return (0.0 + 1.0j) ** (nbands - 1)


def _fft2s(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1))


def _ifft2s(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.ifft2(jnp.fft.ifftshift(x, axes=(-2, -1)))


# An rfft2-based real-input variant (rfft2 + Hermitian column mirror, and
# irfft2 of the Hermitian projection for real outputs) was implemented and
# verified exact, but measured ~30% SLOWER than the plain complex transforms
# on the target chip — the mirror's flip/roll/concat passes outweigh the
# saved half-transform at the platform's ~110 GB/s effective HBM bandwidth —
# so it was removed rather than kept as dead code.


def finest_recon_mask(filters: PyramidFilters) -> jnp.ndarray:
    """Combined frequency mask M0 such that, for a REAL image x,

        reconstruct(keep_finest_levels(decompose(x), 1), use_low=False)
            == real(ifft2s(fft2s(x) * M0))

    i.e. the "finest band + highpass residual" reconstruction collapses to a
    single spectral multiply: M0 = hi0^2 + lo0^2 * sum_b a_b * s_b (analysis x
    synthesis angular masks; the unit complex factors (-i)^(n-1), (+i)^(n-1)
    cancel).  Exactness relies on fft2s(x) being Hermitian (x real), which
    makes fft(high) == dft * hi0.  Computed in-graph from the traced filter
    leaves so it never becomes a giant HLO constant."""
    band0 = jnp.sum(
        jnp.asarray(filters.band_masks[0]) * jnp.asarray(filters.synth_masks[0]),
        axis=0,
    )
    hi0 = jnp.asarray(filters.hi0)
    lo0 = jnp.asarray(filters.lo0)
    return hi0 * hi0 + lo0 * lo0 * band0


def coarse_window(filters: PyramidFilters, start: int):
    """Static full-resolution frequency window of pyramid grid `start`
    (the composition of crops[0..start-1]): returns (r0, c0, (h, w))."""
    r0 = c0 = 0
    for lvl in range(start):
        a, _, c, _ = filters.crops[lvl]
        r0 += a
        c0 += c
    return r0, c0, filters.level_shapes[start] if start < len(
        filters.level_shapes
    ) else filters.low_shape


def coarse_window_mask(filters: PyramidFilters, start: int) -> jnp.ndarray:
    """The combined lowpass mask accumulated between the full-res grid and
    grid `start`: lo0 restricted to the window times the product of
    lo_masks[0..start-1], each restricted to grid `start`'s sub-window.
    Shape = level_shapes[start].  Computed in-graph from traced leaves."""
    r0, c0, (hk, wk) = coarse_window(filters, start)
    lo0 = jnp.asarray(filters.lo0)
    mask = lo0[r0 : r0 + hk, c0 : c0 + wk]
    # grid j+1 = result of crops[j]; window of grid `start` inside grid j+1
    # accumulates the remaining crop starts
    for j in range(start):
        rj = cj = 0
        for lvl in range(j + 1, start):
            a, _, c, _ = filters.crops[lvl]
            rj += a
            cj += c
        lm = jnp.asarray(filters.lo_masks[j])
        mask = mask * lm[rj : rj + hk, cj : cj + wk]
    return mask


def fft2s_window(img: jnp.ndarray, full_shape, r0: int, c0: int, hk: int, wk: int):
    """fft2s(img)[..., r0:r0+hk, c0:c0+wk] computed cheaply: full FFT along W,
    crop columns, then the H-axis FFT runs on the narrow array only (the two
    axis transforms are independent, so cropping between them is exact)."""
    x = jnp.fft.fftshift(jnp.fft.fft(img.astype(jnp.complex64), axis=-1), axes=-1)
    x = x[..., :, c0 : c0 + wk]
    x = jnp.fft.fftshift(jnp.fft.fft(x, axis=-2), axes=-2)
    return x[..., r0 : r0 + hk, :]


def decompose_coarse(
    img: jnp.ndarray, filters: PyramidFilters, start: int
) -> Decomp:
    """Coarse-tail decomposition: phase/amplitude for levels >= `start` plus
    the lowpass, with the fine levels' entries zero-shaped out (their
    phase/amplitude come back as ()-placeholders of zeros with the right
    shapes).  Bit-equivalent on the produced levels to
    decompose(img, active_levels=range(start, L)) but never materializes the
    full-plane DFT: the spectrum is evaluated only on grid `start`'s window
    (one full-width FFT + a narrow-column FFT)."""
    nlevels = filters.height - 2
    n = img.shape[0]
    r0, c0, (hk, wk) = coarse_window(filters, start)
    dk = fft2s_window(img, filters.in_shape, r0, c0, hk, wk)
    lodft = dk * coarse_window_mask(filters, start)

    cf = _cfact(filters.nbands)
    phases, amps = [], []
    for lvl in range(nlevels):
        if lvl < start:
            shape = (n, filters.nbands) + filters.level_shapes[lvl]
            amps.append(jnp.zeros(shape, jnp.float32))
            phases.append(jnp.zeros(shape, jnp.float32))
            continue
        band = _ifft2s(lodft[:, None, :, :] * filters.band_masks[lvl][None]) * cf
        amps.append(jnp.abs(band))
        phases.append(jnp.arctan2(jnp.imag(band), jnp.real(band)))
        a, _, c, _ = filters.crops[lvl]
        hl, wl = (
            filters.level_shapes[lvl + 1]
            if lvl + 1 < nlevels
            else filters.low_shape
        )
        lodft = lodft[:, a : a + hl, c : c + wl] * filters.lo_masks[lvl]

    low = jnp.real(_ifft2s(lodft))
    high = jnp.zeros((n,) + filters.in_shape, jnp.float32)
    return Decomp(high=high, low=low, phase=tuple(phases), amplitude=tuple(amps))


def reconstruct_coarse(
    vals: Decomp, filters: PyramidFilters, start: int, use_low: bool = True
) -> jnp.ndarray:
    """reconstruct(vals, active_levels=range(start, L), use_high=False) but
    the fine inactive prefix collapses to a single embed + combined-mask
    multiply, and the final full-res spectrum (zero outside grid `start`'s
    window) is inverse-transformed with narrow axis FFTs."""
    nlevels = filters.height - 2
    n = vals.low.shape[0]
    if use_low:
        lodft = _fft2s(vals.low.astype(jnp.float32))
    else:
        lodft = jnp.zeros((n,) + filters.low_shape, jnp.complex64)
    for lvl in reversed(range(start, nlevels)):
        a, _, c, _ = filters.crops[lvl]
        hl, wl = filters.level_shapes[lvl]
        up = jnp.zeros((n, hl, wl), dtype=jnp.complex64)
        up = up.at[:, a : a + lodft.shape[1], c : c + lodft.shape[2]].set(
            lodft * filters.lo_masks[lvl]
        )
        band = vals.amplitude[lvl] * jnp.exp(1j * vals.phase[lvl].astype(jnp.float32))
        band_dft = _fft2s(band) * _cfact_synth(filters.nbands)
        lodft = up + jnp.sum(band_dft * filters.synth_masks[lvl][None], axis=1)

    # collapse the inactive fine prefix: combined mask + windowed inverse FFT
    r0, c0, (hk, wk) = coarse_window(filters, start)
    h, w = filters.in_shape
    dk = lodft * coarse_window_mask(filters, start)
    # inverse of fft2s_window: pad rows to full H, ifft along H, pad cols, ifft W
    xr = jnp.zeros((n, h, wk), jnp.complex64)
    xr = xr.at[:, r0 : r0 + hk, :].set(dk)
    xr = jnp.fft.ifft(jnp.fft.ifftshift(xr, axes=-2), axis=-2)
    xc = jnp.zeros((n, h, w), jnp.complex64)
    xc = xc.at[:, :, c0 : c0 + wk].set(xr)
    return jnp.real(jnp.fft.ifft(jnp.fft.ifftshift(xc, axes=-1), axis=-1))


def decompose(
    img: jnp.ndarray, filters: PyramidFilters, active_levels=None
) -> Decomp:
    """(N, H, W) float -> Decomp.  Pure; jit/vmap/grad-safe.

    `active_levels` (static sequence) skips the band IFFT + abs/angle work of
    levels the caller will zero anyway (their phase/amplitude come back as
    zeros).  The lowpass chain always runs, so low/high and the active bands
    are bit-identical to a full decompose — used by the uncertainty-map
    section, which only consumes the finest band and the 6 coarsest."""
    if img.shape[-2:] != filters.in_shape:
        raise ValueError(f"image {img.shape} vs filters {filters.in_shape}")
    nlevels = filters.height - 2
    active = set(range(nlevels)) if active_levels is None else set(active_levels)
    n = img.shape[0]
    # NOTE: the rfft2-based real-input path (_fft2s_real/_ifft2s_real below)
    # is exact but measured SLOWER on the target chip (the Hermitian
    # mirror's flip+roll+concat costs more than the saved half-transform at
    # ~110 GB/s effective HBM bandwidth), so the full complex FFT stays.
    dft = _fft2s(img.astype(jnp.float32))
    high = jnp.real(_ifft2s(dft * filters.hi0))
    lodft = dft * filters.lo0

    cf = _cfact(filters.nbands)
    phases, amps = [], []
    for lvl in range(nlevels):
        if lvl in active:
            band_dft = lodft[:, None, :, :] * filters.band_masks[lvl][None]
            # unit complex factor is linear: ifft(cf*X) == cf*ifft(X)
            band = _ifft2s(band_dft) * cf
            # abs/angle paired on the same complex value; angle == imag(log z)
            amps.append(jnp.abs(band))
            phases.append(jnp.arctan2(jnp.imag(band), jnp.real(band)))
        else:
            shape = (n, filters.nbands) + filters.level_shapes[lvl]
            amps.append(jnp.zeros(shape, jnp.float32))
            phases.append(jnp.zeros(shape, jnp.float32))
        r0, r1, c0, c1 = filters.crops[lvl]
        lodft = lodft[:, r0:r1, c0:c1] * filters.lo_masks[lvl]

    low = jnp.real(_ifft2s(lodft))
    return Decomp(high=high, low=low, phase=tuple(phases), amplitude=tuple(amps))


def reconstruct(
    vals: Decomp,
    filters: PyramidFilters,
    active_levels=None,
    use_high: bool = True,
    use_low: bool = True,
) -> jnp.ndarray:
    """Decomp -> (N, H, W) float.  Inverse of `decompose` (tight frame).

    `active_levels` (static sequence of level indices) skips the FFT work of
    band levels known to be zero — the band-limited uncertainty maps
    (keep_finest/keep_coarsest selections) reconstruct ~3x cheaper this way.
    `use_high`/`use_low` likewise skip the residual paths."""
    nlevels = filters.height - 2
    active = set(range(nlevels)) if active_levels is None else set(active_levels)
    n = vals.high.shape[0]

    if use_low:
        lodft = _fft2s(vals.low.astype(jnp.float32))
    else:
        lodft = jnp.zeros((n,) + filters.low_shape, jnp.complex64)
    for lvl in reversed(range(nlevels)):
        # upsample lowpass: re-embed into the level's grid, through the lo mask
        r0, r1, c0, c1 = filters.crops[lvl]
        hl, wl = filters.level_shapes[lvl]
        up = jnp.zeros((n, hl, wl), dtype=jnp.complex64)
        up = up.at[:, r0:r1, c0:c1].set(lodft * filters.lo_masks[lvl])

        if lvl in active:
            band = vals.amplitude[lvl] * jnp.exp(
                1j * vals.phase[lvl].astype(jnp.float32)
            )
            band_dft = _fft2s(band) * _cfact_synth(filters.nbands)
            orient = jnp.sum(band_dft * filters.synth_masks[lvl][None], axis=1)
            lodft = up + orient
        else:
            lodft = up

    dft = lodft * filters.lo0
    if use_high:
        hidft = _fft2s(vals.high.astype(jnp.float32))
        dft = dft + hidft * filters.hi0
    return jnp.real(_ifft2s(dft))
