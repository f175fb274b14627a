"""The frequency-domain uncertainty fast path must match the generic
decompose/reconstruct formulation (the round-1 pipeline section, itself
verified against the reference semantics of fusion_net/trainer.py:122-146)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmvfi_tpu.ops import decomp as dec_ops
from fmvfi_tpu.ops.filters import gaussian_blur, median_filter_fast
from fmvfi_tpu.ops.pyramid import (
    decompose,
    decompose_coarse,
    finest_recon_mask,
    make_filters,
    max_pyr_height,
    reconstruct,
    reconstruct_coarse,
)
from fmvfi_tpu.pipeline.interpolate import (
    _from_chan_batch,
    _to_chan_batch,
    fusion_uncertainty,
)


def _reference_uncertainty(ada_pred, phase_pred, filters):
    """Round-1 formulation via the generic pyramid ops."""
    rgb_batch = jnp.concatenate(
        [_to_chan_batch(ada_pred), _to_chan_batch(phase_pred)], 0
    )
    vals = decompose(rgb_batch, filters)
    vals_ada, vals_ph = dec_ops.split_frames(vals, 2)

    h_both = reconstruct(
        dec_ops.keep_finest_levels(vals, 1), filters, active_levels=(0,), use_low=False
    )
    h_ada, h_ph = jnp.split(h_both, 2, axis=0)
    h_diff = jnp.abs(
        _from_chan_batch(h_ada).mean(-1) - _from_chan_batch(h_ph).mean(-1)
    )
    phase_unc = gaussian_blur(jnp.clip(h_diff * 100.0, 0.0, 1.0), 5.0)

    nlev = len(vals.phase)
    vals_diff = dec_ops.keep_coarsest_levels(
        dec_ops.abs_difference(vals_ph, vals_ada), 6
    )
    freq_diff = (
        _from_chan_batch(
            reconstruct(
                vals_diff,
                filters,
                active_levels=tuple(range(max(nlev - 6, 0), nlev)),
                use_high=False,
            )
        ).mean(-1)
        * 30.0
    )
    freq_med = median_filter_fast(freq_diff, size=50)
    ada_unc = jnp.clip(jnp.abs(freq_diff - freq_med) * 5.0, 0.0, 1.0)
    return ada_unc, phase_unc


@pytest.mark.parametrize("hw", [(128, 128), (96, 160)])
def test_fusion_uncertainty_matches_generic_path(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    ada = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32))
    ph = jnp.asarray(ada + 0.1 * rng.normal(size=(2, h, w, 3)).astype(np.float32))
    filters = make_filters(h, w, max_pyr_height(h, w))

    a_ref, p_ref = jax.jit(lambda a, b: _reference_uncertainty(a, b, filters))(ada, ph)
    a_new, p_new = jax.jit(lambda a, b: fusion_uncertainty(a, b, filters))(ada, ph)

    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref), atol=2e-5)
    # the ada map passes through the HISTOGRAM median filter, whose bin
    # edges amplify last-ulp float differences (fft vs rfft paths) into
    # sparse one-sub-bin jumps; require near-exactness almost everywhere
    # and bound the sparse bin-edge outliers
    d = np.abs(np.asarray(a_new) - np.asarray(a_ref))
    assert np.mean(d > 1e-3) < 5e-3, f"too many mismatched pixels ({np.mean(d>1e-3):.4f})"
    assert d.max() < 0.06, f"outlier beyond one median sub-bin: {d.max():.4f}"


def test_decompose_coarse_matches_decompose():
    h, w = 128, 96
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    filters = make_filters(h, w, max_pyr_height(h, w))
    nlev = filters.height - 2
    start = max(nlev - 6, 0)

    full = decompose(x, filters)
    coarse = decompose_coarse(x, filters, start)
    np.testing.assert_allclose(
        np.asarray(coarse.low), np.asarray(full.low), atol=1e-4
    )
    for lvl in range(start, nlev):
        np.testing.assert_allclose(
            np.asarray(coarse.amplitude[lvl]),
            np.asarray(full.amplitude[lvl]),
            atol=1e-4,
        )
        # compare band phases where amplitude is non-negligible
        mask = np.asarray(full.amplitude[lvl]) > 1e-3
        dp = np.asarray(coarse.phase[lvl]) - np.asarray(full.phase[lvl])
        dp = np.arctan2(np.sin(dp), np.cos(dp))
        assert np.max(np.abs(dp[mask]), initial=0.0) < 1e-3


@pytest.mark.slow
def test_reconstruct_coarse_matches_reconstruct():
    h, w = 128, 96
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, h, w)).astype(np.float32))
    filters = make_filters(h, w, max_pyr_height(h, w))
    nlev = filters.height - 2
    start = max(nlev - 6, 0)

    vals = dec_ops.keep_coarsest_levels(decompose(x, filters), 6)
    ref = reconstruct(
        vals, filters, active_levels=tuple(range(start, nlev)), use_high=False
    )
    fast = reconstruct_coarse(vals, filters, start)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)


def test_finest_recon_mask_matches_partial_reconstruct():
    h, w = 128, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, h, w)).astype(np.float32))
    filters = make_filters(h, w, max_pyr_height(h, w))
    from fmvfi_tpu.ops.pyramid import _fft2s, _ifft2s

    vals = decompose(x, filters, active_levels=(0,))
    ref = reconstruct(
        dec_ops.keep_finest_levels(vals, 1), filters, active_levels=(0,), use_low=False
    )
    fast = jnp.real(_ifft2s(_fft2s(x) * finest_recon_mask(filters)))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)
