"""Pallas AdaCoF kernel vs the exact jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.ops.adacof import adacof_warp
from fmvfi_tpu.ops.adacof_pallas import adacof_warp_fast, adacof_warp_pallas


def _case(rng, H, W, F, d, off_scale, B=1):
    Hin = H + (F - 1) * d
    Win = W + (F - 1) * d
    x = jnp.asarray(rng.uniform(0, 1, (B, Hin, Win, 3)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, H, W, F * F)).astype(np.float32))
    a = jnp.asarray(
        (rng.uniform(-1, 1, (B, H, W, F * F)) * off_scale).astype(np.float32)
    )
    b = jnp.asarray(
        (rng.uniform(-1, 1, (B, H, W, F * F)) * off_scale).astype(np.float32)
    )
    return x, w, a, b


@pytest.mark.parametrize("F,d,off", [(5, 1, 8.0), (3, 2, 4.0), (5, 1, 0.4)])
def test_pallas_matches_reference(F, d, off):
    rng = np.random.default_rng(0)
    x, w, a, b = _case(rng, 64, 256, F, d, off)
    ref = adacof_warp(x, w, a, b, d)
    out = adacof_warp_pallas(x, w, a, b, d, max_offset=31, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_nonaligned_shapes():
    rng = np.random.default_rng(1)
    # H=50 not a tile multiple, W=200 not a lane multiple
    x, w, a, b = _case(rng, 50, 200, 5, 1, 6.0)
    ref = adacof_warp(x, w, a, b, 1)
    out = adacof_warp_pallas(x, w, a, b, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_clamps_large_offsets():
    """|offset| > max_offset is the documented fast-path deviation: the kernel
    behaves as if offsets were clamped to +-R."""
    rng = np.random.default_rng(2)
    x, w, a, b = _case(rng, 32, 128, 3, 1, 50.0)
    R = 15
    ref = adacof_warp(x, w, jnp.clip(a, -R, R), jnp.clip(b, -R, R), 1)
    out = adacof_warp_pallas(x, w, a, b, 1, max_offset=R, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_custom_vjp_gradients_match_jnp():
    rng = np.random.default_rng(3)
    x, w, a, b = _case(rng, 16, 128, 3, 1, 3.0)
    g = jnp.asarray(rng.normal(size=(1, 16, 128, 3)).astype(np.float32))

    def loss_fast(w_, a_, b_):
        # interpret-mode pallas under custom_vjp: patch via direct call
        return jnp.sum(adacof_warp_pallas(x, w_, a_, b_, 1, interpret=True) * g)

    def loss_ref(w_, a_, b_):
        return jnp.sum(adacof_warp(x, w_, a_, b_, 1) * g)

    # the vjp rule delegates to the jnp path; verify equivalence of values
    v1 = loss_fast(w, a, b)
    v2 = loss_ref(w, a, b)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(w, a, b)
    for t in g_ref:
        assert np.isfinite(np.asarray(t)).all()


@pytest.mark.parametrize("F,d,off", [(5, 1, 6.0), (3, 2, 3.0)])
def test_pallas_backward_matches_jnp_grads(F, d, off):
    """The fused backward kernel's (dW, dalpha, dbeta) must match jnp
    autodiff (which itself reproduces the reference's three backward CUDA
    kernels — ops/adacof.py docstring) to fp32 tolerance."""
    rng = np.random.default_rng(7)
    x, w, a, b = _case(rng, 32, 128, F, d, off)
    g = jnp.asarray(rng.normal(size=(1, 32, 128, 3)).astype(np.float32))

    def f(w_, a_, b_):
        return adacof_warp(x, w_, a_, b_, d)

    _, vjp = jax.vjp(f, w, a, b)
    dw_ref, da_ref, db_ref = vjp(g)

    from fmvfi_tpu.ops.adacof_pallas import adacof_warp_pallas_bwd

    dw, da, db = adacof_warp_pallas_bwd(
        x, w, a, b, g, d, max_offset=31, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=2e-4)


def test_saturation_gradient_is_zero():
    """Regression for the round-3 training runaway: dalpha/dbeta must be the
    TRUE gradient of the clamped forward — ZERO where |offset| >= max_offset.
    The earlier contract (gradient evaluated at the clamped point) made
    saturation self-reinforcing: once any offset crossed the clamp during the
    28-px-motion demo training, the optimizer kept pushing it outward through
    a forward that no longer responded, and the loss blew up inf within ~80
    steps (deterministically; see tools/debug_trainstep.py)."""
    from fmvfi_tpu.ops.adacof_pallas import adacof_warp_pallas_bwd, _saturation_mask

    rng = np.random.default_rng(11)
    R = 15
    x, w, a, b = _case(rng, 32, 128, 5, 1, 2 * R)  # ~half the offsets saturate
    g = jnp.asarray(rng.normal(size=(1, 32, 128, 3)).astype(np.float32))

    # oracle: jnp autodiff THROUGH the clip (true gradient of the fast path)
    def f(w_, a_, b_):
        return adacof_warp(x, w_, jnp.clip(a_, -R, R), jnp.clip(b_, -R, R), 1)

    _, vjp = jax.vjp(f, w, a, b)
    dw_ref, da_ref, db_ref = vjp(g)

    dw, da, db = adacof_warp_pallas_bwd(x, w, a, b, g, 1, max_offset=R, interpret=True)
    da, db = _saturation_mask(da, db, a, b, R)
    sat = np.abs(np.asarray(a)) >= R
    assert sat.any() and (~sat).any()
    assert (np.asarray(da)[sat] == 0).all()
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=2e-4)


def test_pallas_large_kernel_parity():
    """The reference publishes a large-kernel AdaCoF config too
    (src/adacof/checkpoint/kernelsize_11; its config.txt records ks 9 —
    both far above the default 5).  F=11 keeps 2R+2+(F-1)d within the
    128-lane gather window at the default max_offset, so the Pallas fast
    path must stay exact, not fall back."""
    rng = np.random.default_rng(3)
    x, w, a, b = _case(rng, 16, 128, 11, 1, 6.0)
    ref = adacof_warp(x, w, a, b, 1)
    out = adacof_warp_pallas(x, w, a, b, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_adacofnet_large_kernel_trains():
    """Model-level ks=11/dilation=2 (the published large-kernel regime):
    forward shape, bounded output, and finite gradients through the
    fast-warp custom VJP."""
    import jax.tree_util as tu

    from fmvfi_tpu.models.adacof import AdaCoFNet

    m = AdaCoFNet(kernel_size=11, dilation=2)
    key = jax.random.key(0)
    z1 = jax.random.uniform(key, (1, 64, 64, 3))
    z2 = jnp.roll(z1, 2, axis=2)
    v = m.init(key, z1, z2)
    out = jax.jit(lambda v, a, b: m.apply(v, a, b).blended)(v, z1, z2)
    assert out.shape == (1, 64, 64, 3)
    assert float(jnp.min(out)) > -0.5 and float(jnp.max(out)) < 1.5

    def loss(p):
        return jnp.mean((m.apply({"params": p}, z1, z2).blended - z1) ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(t)).all() for t in tu.tree_leaves(g))
