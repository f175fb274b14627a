"""AOT export artifacts (utils/export.py): the serialized StableHLO +
weights .npz must reproduce the live pipeline bit-for-bit and be loadable
without the package (reference counterpart: none — its only deployment
path is running the scripts in-tree, src/fusion_net/interpolate_twoframe.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.models.adacof import AdaCoFNet
from fmvfi_tpu.models.fusion_net import FusionNet
from fmvfi_tpu.utils.convert import phase_net_from_torch
from fmvfi_tpu.pipeline.interpolate import (
    FusionWeights,
    adacof_interpolate,
    fusion_interpolate,
    phase_interpolate,
)
from fmvfi_tpu.utils.export import export_pipeline, load_exported, save_exported

H = W = 64


@pytest.fixture(scope="module")
def weights():
    z = jnp.zeros((1, H, W, 3))
    k = jax.random.key(0)
    fusion = FusionNet()
    return FusionWeights(
        phase_net=phase_net_from_torch(
            "/root/reference/src/phase_net/phase_net.pt"
        ),
        adacof=AdaCoFNet(kernel_size=5, dilation=1).init(k, z, z),
        fusion_net=fusion.init(
            k, z, z, z, jnp.zeros((1, H, W, 6)), jnp.zeros((1, H, W, 3)), 0
        ),
    )


@pytest.fixture(scope="module")
def frames():
    r = np.random.default_rng(3)
    return (
        jnp.asarray(r.random((1, H, W, 3), dtype=np.float32)),
        jnp.asarray(r.random((1, H, W, 3), dtype=np.float32)),
    )


@pytest.mark.parametrize(
    "method",
    ["adacof", "phase", pytest.param("fusion", marks=pytest.mark.slow)],
)
def test_export_roundtrip_matches_live(tmp_path, weights, frames, method):
    f1, f2 = frames
    blob = export_pipeline(weights, H, W, method)
    path = os.path.join(tmp_path, f"{method}.fmx.npz")
    save_exported(path, blob)

    fn = load_exported(path)
    assert fn.meta["method"] == method and fn.meta["h"] == H
    got = np.asarray(fn(f1, f2))

    if method == "adacof":
        want = adacof_interpolate(weights.adacof, f1, f2)
    elif method == "phase":
        want = phase_interpolate(weights.phase_net, f1, f2)
    else:
        want = fusion_interpolate(weights, f1, f2)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)
    assert got.shape == (1, H, W, 3)


@pytest.mark.slow
def test_export_fusion_off_grid(weights):
    """Off-/8 sizes export too: fusion_interpolate reflect-pads internally,
    so the export must build its filter bank at the PADDED resolution (the
    same rule as pipeline/video._interp_fn — a filter bank at the native
    size crashes at trace time)."""
    h, w = 60, 44
    r = np.random.default_rng(9)
    f1 = jnp.asarray(r.random((1, h, w, 3), dtype=np.float32))
    f2 = jnp.asarray(r.random((1, h, w, 3), dtype=np.float32))
    fn = load_exported(export_pipeline(weights, h, w, "fusion"))
    got = np.asarray(fn(f1, f2))
    want = fusion_interpolate(weights, f1, f2)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)
    assert got.shape == (1, h, w, 3)


def test_export_bytes_loadable_without_path(weights, frames):
    f1, f2 = frames
    blob = export_pipeline(weights, H, W, "adacof")
    fn = load_exported(blob)  # raw bytes, no file
    out = np.asarray(fn(f1, f2))
    assert np.isfinite(out).all()


def test_export_multi_platform(weights, frames):
    """A (cpu, tpu) artifact can be built on a CPU host (AOT lowering needs
    no device) and still calls correctly on the build host."""
    f1, f2 = frames
    blob = export_pipeline(
        weights, H, W, "phase", platforms=("cpu", "tpu")
    )
    fn = load_exported(blob)
    assert sorted(fn.meta["platforms"]) == ["cpu", "tpu"]
    want = phase_interpolate(weights.phase_net, f1, f2)
    np.testing.assert_allclose(
        np.asarray(fn(f1, f2)), np.asarray(want), atol=2e-5
    )
