import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmvfi_tpu.ops import pyramid
from fmvfi_tpu.ops.pyramid import Decomp, decompose, make_filters, reconstruct


def _rand_img(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish natural-image-like content: random + blur via fft low-pass
    x = rng.uniform(0, 1, size=(n, h, w)).astype(np.float32)
    return x


def test_max_pyr_height():
    assert pyramid.max_pyr_height(256, 256) == 12
    assert pyramid.max_pyr_height(512, 512) == 14
    assert pyramid.max_pyr_height(720, 1280) == 15


def test_level_shapes_sqrt2():
    f = make_filters(256, 256, height=12)
    assert f.level_shapes[0] == (256, 256)
    # sqrt(2) downsampling: 256 -> 181 -> 128 -> 91 ...
    assert f.level_shapes[1] == (181, 181)
    assert f.level_shapes[2] == (128, 128)
    assert len(f.level_shapes) == 10
    assert min(f.low_shape) >= 2


def _natural_img(n, h, w, seed=0):
    """1/f-spectrum image: the frequency-domain steerable pyramid loses a bit
    of corner-frequency energy at every crop (a known property of the
    canonical construction, not a bug here), so white noise is an unfairly
    adversarial roundtrip input."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        white = rng.uniform(0, 1, size=(h, w))
        F = np.fft.fft2(white)
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.fftfreq(w)[None, :]
        r = np.sqrt(fx**2 + fy**2)
        r[0, 0] = 1
        img = np.real(np.fft.ifft2(F / (r * np.sqrt(h * w))))
        img = (img - img.min()) / (img.max() - img.min())
        out.append(img)
    return np.stack(out).astype(np.float32)


@pytest.mark.parametrize(
    "h,w,height",
    [(64, 64, 6),
     pytest.param(256, 256, 12, marks=pytest.mark.slow),
     (128, 192, 10)],
)
def test_roundtrip(h, w, height):
    f = make_filters(h, w, height=height)
    img = _natural_img(2, h, w)
    vals = decompose(jnp.asarray(img), f)
    back = np.asarray(reconstruct(vals, f))
    rel = np.linalg.norm(back - img) / np.linalg.norm(img)
    assert rel < 0.05, f"relative L2 {rel}"
    # PSNR-style bound: the canonical pyramid reconstructs natural content
    # around ~35dB; anything below ~30dB means broken masks.
    rmse = np.sqrt(np.mean((back - img) ** 2))
    psnr = -20 * np.log10(rmse + 1e-12)
    assert psnr > 30.0, f"roundtrip PSNR {psnr}"


def test_roundtrip_white_noise_bounded():
    f = make_filters(64, 64, height=6)
    img = _rand_img(2, 64, 64)
    vals = decompose(jnp.asarray(img), f)
    back = np.asarray(reconstruct(vals, f))
    rel = np.linalg.norm(back - img) / np.linalg.norm(img)
    assert rel < 0.08, f"relative L2 {rel}"


def test_shapes_contract():
    f = make_filters(64, 64, height=6, nbands=4)
    img = _rand_img(3, 64, 64)
    vals = decompose(jnp.asarray(img), f)
    assert vals.high.shape == (3, 64, 64)
    assert len(vals.phase) == 4
    for lvl, (hl, wl) in enumerate(f.level_shapes):
        assert vals.phase[lvl].shape == (3, 4, hl, wl)
        assert vals.amplitude[lvl].shape == (3, 4, hl, wl)
    assert vals.low.shape == (3,) + f.low_shape
    # amplitudes non-negative, phases in [-pi, pi]
    for p, a in zip(vals.phase, vals.amplitude):
        assert np.asarray(a).min() >= 0
        assert np.abs(np.asarray(p)).max() <= np.pi + 1e-5


def test_decomp_is_pytree():
    f = make_filters(64, 64, height=6)
    img = _rand_img(1, 64, 64)
    vals = decompose(jnp.asarray(img), f)
    leaves = jax.tree_util.tree_leaves(vals)
    assert len(leaves) == 2 + 2 * 4  # high, low, 4 phase, 4 amplitude


def test_jit_and_grad():
    f = make_filters(64, 64, height=6)
    img = jnp.asarray(_rand_img(1, 64, 64))

    @jax.jit
    def loss(x):
        vals = decompose(x, f)
        return jnp.sum(reconstruct(vals, f) ** 2)

    g = jax.grad(loss)(img)
    assert g.shape == img.shape
    assert np.isfinite(np.asarray(g)).all()


def test_shift_moves_phase_not_amplitude():
    """Phase-shift property: a small spatial translation changes band phases
    but barely changes band amplitudes (the core assumption of PhaseNet)."""
    h = w = 128
    f = make_filters(h, w, height=8)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img0 = np.sin(2 * np.pi * xx / 16).astype(np.float32)[None]
    img1 = np.sin(2 * np.pi * (xx - 2) / 16).astype(np.float32)[None]
    v0 = decompose(jnp.asarray(img0), f)
    v1 = decompose(jnp.asarray(img1), f)
    # pick the level that captures the sinusoid (largest mean amplitude)
    means = [float(np.asarray(a).mean()) for a in v0.amplitude]
    lvl = int(np.argmax(means))
    hl, wl = f.level_shapes[lvl]
    mh, mw = hl // 4, wl // 4  # proportional interior crop
    a0 = np.asarray(v0.amplitude[lvl])[0, :, mh:-mh, mw:-mw]
    a1 = np.asarray(v1.amplitude[lvl])[0, :, mh:-mh, mw:-mw]
    p0 = np.asarray(v0.phase[lvl])[0, :, mh:-mh, mw:-mw]
    p1 = np.asarray(v1.phase[lvl])[0, :, mh:-mh, mw:-mw]
    # amplitude-weighted statistics (phase is meaningless where amp ~ 0)
    wgt = a0 / a0.sum()
    amp_rel = (np.abs(a1 - a0) * wgt).sum() / ((a0 * wgt).sum() + 1e-8)
    phase_delta = np.abs(np.arctan2(np.sin(p1 - p0), np.cos(p1 - p0)))
    phase_moved = (phase_delta * wgt).sum()
    assert amp_rel < 0.05, f"lvl {lvl}: amplitude moved {amp_rel}"
    assert phase_moved > 0.2, f"lvl {lvl}: phase only moved {phase_moved}"


def test_partial_decompose_matches_active_levels():
    f = make_filters(64, 64, height=7)
    img = jnp.asarray(_natural_img(1, 64, 64))
    full = decompose(img, f)
    part = decompose(img, f, active_levels=(0, 3, 4))
    np.testing.assert_allclose(np.asarray(part.high), np.asarray(full.high))
    np.testing.assert_allclose(np.asarray(part.low), np.asarray(full.low))
    for lvl in range(5):
        if lvl in (0, 3, 4):
            np.testing.assert_allclose(
                np.asarray(part.phase[lvl]), np.asarray(full.phase[lvl])
            )
        else:
            assert float(np.abs(np.asarray(part.phase[lvl])).max()) == 0.0
