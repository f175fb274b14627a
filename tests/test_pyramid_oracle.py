"""Independent numerical oracle for the complex steerable pyramid.

ops/pyramid.py re-derives the unvendored `steerable.SCFpyr_PyTorch` core
(consumed by the reference at /root/reference/src/train/pyramid.py:7,48-78)
with ANALYTIC raised-cosine masks.  This file transcribes the canonical
Portilla–Simoncelli construction in its ORIGINAL form — rcosFn lookup-table
+ pointOp linear interpolation, per-level in-loop mask computation, complex
(-i)^(nbands-1) factor applied inside the band DFT — as deliberately slow
numpy, and asserts per-band complex-coefficient equality against
`decompose` for both the factor-2 and the sqrt(2) half-octave case.

The only intended numeric difference is the table interpolation itself
(256-sample cos^2 table, error ~1e-5), hence the 1e-4 gate.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fmvfi_tpu.ops.pyramid import Decomp, decompose, make_filters, reconstruct


# ------------------------------------------------ canonical construction


def rcos_fn(width=1.0, position=0.0):
    """matlab rcosFn: raised-cosine lookup table (X, Y), Y: 0 -> 1."""
    sz = 256
    X = np.pi * np.arange(-sz - 1, 2) / (2 * sz)
    Y = np.cos(X) ** 2
    Y[0] = Y[1]
    Y[sz + 2] = Y[sz + 1]
    X = position + (2 * width / np.pi) * (X + np.pi / 4)
    return X, Y


def point_op(im, Y, X):
    """matlab pointOp: linear interpolation of the lookup table, clamped."""
    out = np.interp(im.flatten(), X, Y, left=Y[0], right=Y[-1])
    return out.reshape(im.shape)


def build_scf_pyr(image, height, nbands, scale_factor):
    """Canonical buildSCFpyr in numpy.  Returns [hi, [per-level list of
    complex band arrays], ..., lo] mirroring the package's coeff layout."""
    h, w = image.shape
    y = (np.arange(h) - h // 2) / (h / 2)
    x = (np.arange(w) - w // 2) / (w / 2)
    xv, yv = np.meshgrid(x, y)
    angle = np.arctan2(yv, xv)
    rad = np.sqrt(xv**2 + yv**2)
    rad[h // 2, w // 2] = rad[h // 2, w // 2 - 1]
    log_rad = np.log2(rad)

    Xrcos, Yrcos = rcos_fn(1.0, -0.5)
    Yrcos = np.sqrt(Yrcos)
    YIrcos = np.sqrt(1.0 - Yrcos**2)

    dft = np.fft.fftshift(np.fft.fft2(image))
    hi0mask = point_op(log_rad, Yrcos, Xrcos)
    lo0mask = point_op(log_rad, YIrcos, Xrcos)
    hi = np.real(np.fft.ifft2(np.fft.ifftshift(dft * hi0mask)))
    lodft = dft * lo0mask

    order = nbands - 1
    const = (
        (2.0 ** (2 * order))
        * (np.math.factorial(order) ** 2)
        / (nbands * np.math.factorial(2 * order))
        if hasattr(np, "math")
        else None
    )
    import math

    const = (
        (2.0 ** (2 * order))
        * (math.factorial(order) ** 2)
        / (nbands * math.factorial(2 * order))
    )

    levels = []
    for _ in range(height - 2):
        Xrcos = Xrcos - np.log2(scale_factor)
        himask = point_op(log_rad, Yrcos, Xrcos)
        bands = []
        for b in range(nbands):
            alfa = np.mod(np.pi + angle - np.pi * b / nbands, 2 * np.pi) - np.pi
            anglemask = (
                2.0
                * np.sqrt(const)
                * (np.cos(angle - np.pi * b / nbands) ** order)
                * (np.abs(alfa) < np.pi / 2)
            )
            banddft = (
                ((0 - 1j) ** (nbands - 1)) * lodft * anglemask * himask
            )
            bands.append(np.fft.ifft2(np.fft.ifftshift(banddft)))
        levels.append(bands)

        dims = np.array(lodft.shape)
        new = np.ceil((dims - 0.5) / scale_factor).astype(int)
        lostart = (np.ceil((dims + 0.5) / 2) - np.ceil((new + 0.5) / 2)).astype(
            int
        )
        loend = lostart + new
        log_rad = log_rad[lostart[0] : loend[0], lostart[1] : loend[1]]
        angle = angle[lostart[0] : loend[0], lostart[1] : loend[1]]
        lodft = lodft[lostart[0] : loend[0], lostart[1] : loend[1]]
        lomask = point_op(log_rad, np.abs(np.sqrt(1.0 - Yrcos**2)), Xrcos)
        lodft = lodft * lomask

    lo = np.real(np.fft.ifft2(np.fft.ifftshift(lodft)))
    return hi, levels, lo


# ------------------------------------------------------------- the tests


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (h, w)).astype(np.float64)
    # band-limit slightly so single-precision FFT noise stays far below gate
    return base + 0.25 * np.roll(base, (1, 3), (0, 1))


@pytest.mark.parametrize(
    "h,w,height,scale",
    [
        (64, 64, 5, 2.0),
        (64, 64, 7, np.sqrt(2)),
        (96, 160, 6, 2.0),
        (96, 160, 9, np.sqrt(2)),
    ],
)
def test_decompose_matches_canonical_scfpyr(h, w, height, scale):
    img = _img(h, w, seed=h + height)
    hi_o, levels_o, lo_o = build_scf_pyr(img, height, 4, scale)

    filters = make_filters(h, w, height, nbands=4, scale_factor=scale)
    d = decompose(jnp.asarray(img[None], jnp.float32), filters)

    scale_ref = np.abs(img).max()
    np.testing.assert_allclose(
        np.asarray(d.high[0]), hi_o, atol=1e-4 * scale_ref
    )
    np.testing.assert_allclose(np.asarray(d.low[0]), lo_o, atol=1e-4 * scale_ref)
    for lvl, bands in enumerate(levels_o):
        amp = np.asarray(d.amplitude[lvl][0])
        ph = np.asarray(d.phase[lvl][0])
        ours = amp * np.exp(1j * ph)
        for b in range(4):
            band_scale = max(np.abs(bands[b]).max(), 1e-6)
            np.testing.assert_allclose(
                ours[b],
                bands[b],
                atol=2e-4 * band_scale,
                err_msg=f"level {lvl} band {b} (scale={scale})",
            )


def test_reconstruct_inverts_canonical_coefficients():
    """Feed ORACLE-produced coefficients through our `reconstruct`: the
    synthesis bank must invert the canonical analysis to the same tight-frame
    residual the roundtrip of our own analysis achieves."""
    h = w = 64
    height = 7
    scale = np.sqrt(2)
    img = _img(h, w, seed=3)
    hi_o, levels_o, lo_o = build_scf_pyr(img, height, 4, scale)

    phases = []
    amps = []
    for bands in levels_o:
        z = np.stack(bands)[None]
        amps.append(jnp.asarray(np.abs(z), jnp.float32))
        phases.append(jnp.asarray(np.angle(z), jnp.float32))
    vals = Decomp(
        high=jnp.asarray(hi_o[None], jnp.float32),
        low=jnp.asarray(lo_o[None], jnp.float32),
        phase=tuple(phases),
        amplitude=tuple(amps),
    )
    filters = make_filters(h, w, height, nbands=4, scale_factor=scale)
    back = np.asarray(reconstruct(vals, filters)[0])

    own = np.asarray(
        reconstruct(decompose(jnp.asarray(img[None], jnp.float32), filters), filters)[0]
    )
    # oracle-coefficient reconstruction == own-coefficient reconstruction
    np.testing.assert_allclose(back, own, atol=2e-4 * np.abs(img).max())
