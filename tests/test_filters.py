"""Filter ops vs scipy oracles."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter as sp_gauss
from scipy.ndimage import median_filter as sp_median

import jax.numpy as jnp

from fmvfi_tpu.ops.filters import gaussian_blur, median_filter, median_filter_fast


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 2, (96, 128)).astype(np.float32)
    return sp_gauss(base, 2.0).astype(np.float32)  # smooth-ish field


def test_gaussian_matches_scipy(img):
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 5.0))
    ref = sp_gauss(img, 5.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_median_matches_scipy(img):
    ours = np.asarray(median_filter(jnp.asarray(img), size=30))
    ref = sp_median(img, size=30)
    err = np.abs(ours - ref).max()
    assert err < (img.max() - img.min()) / 256, err


@pytest.mark.slow
def test_median_fast_close_to_exact(img):
    fast = np.asarray(median_filter_fast(jnp.asarray(img), size=30, downsample=2))
    ref = sp_median(img, size=30)
    # throughput variant: small deviation allowed, must track the exact map
    assert np.abs(fast - ref).mean() < 0.02 * (img.max() - img.min())


@pytest.mark.slow
def test_median_batched(img):
    flipped = img[::-1].copy()
    batch = jnp.stack([jnp.asarray(img), jnp.asarray(flipped)])
    out = np.asarray(median_filter(batch, size=10))
    assert out.shape == batch.shape
