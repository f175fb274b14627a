"""AdaCoF model: warp op vs brute-force numpy, U-Net wiring, flow stats."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.models.adacof import AdaCoFNet, KernelEstimation, smoothness_penalties
from fmvfi_tpu.ops.adacof import adacof_warp, flow_stats, pad_replicate


def _brute_force(x, w, a, b, d):
    """Direct loop transcription of the kernel contract (NHWC)."""
    B, Hin, Win, C = x.shape
    _, H, W, F2 = w.shape
    F = int(math.isqrt(F2))
    out = np.zeros((B, H, W, C), np.float32)
    for bi in range(B):
        for i in range(H):
            for j in range(W):
                for t in range(F2):
                    k, l = t // F, t % F
                    alpha, beta = a[bi, i, j, t], b[bi, i, j, t]
                    A, Bf = int(alpha), int(beta)  # trunc toward zero
                    fi, fj = alpha - A, beta - Bf
                    i0 = min(max(i + k * d + A, 0), Hin - 1)
                    i1 = min(max(i + k * d + A + 1, 0), Hin - 1)
                    j0 = min(max(j + l * d + Bf, 0), Win - 1)
                    j1 = min(max(j + l * d + Bf + 1, 0), Win - 1)
                    s = (
                        x[bi, i0, j0] * (1 - fi) * (1 - fj)
                        + x[bi, i1, j0] * fi * (1 - fj)
                        + x[bi, i0, j1] * (1 - fi) * fj
                        + x[bi, i1, j1] * fi * fj
                    )
                    out[bi, i, j] += w[bi, i, j, t] * s
    return out


@pytest.mark.parametrize("d", [1, 2])
def test_warp_matches_brute_force(d):
    rng = np.random.default_rng(0)
    F = 3
    H = W = 8
    Hin = H + (F - 1) * d
    x = rng.uniform(0, 1, (2, Hin, Hin, 3)).astype(np.float32)
    w = rng.uniform(0, 1, (2, H, W, F * F)).astype(np.float32)
    a = rng.uniform(-4, 4, (2, H, W, F * F)).astype(np.float32)
    b = rng.uniform(-4, 4, (2, H, W, F * F)).astype(np.float32)
    ours = np.asarray(adacof_warp(jnp.asarray(x), jnp.asarray(w), jnp.asarray(a), jnp.asarray(b), d))
    ref = _brute_force(x, w, a, b, d)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_gradients_match_cuda_formulas():
    """Autodiff grads == the reference's analytic backward kernels
    (adacof.py:67-258): dW = sample, dalpha/dbeta = W * bilinear derivative."""
    rng = np.random.default_rng(1)
    F, H, d = 2, 5, 1
    Hin = H + (F - 1) * d
    x = rng.uniform(0, 1, (1, Hin, Hin, 3)).astype(np.float32)
    w = rng.uniform(0, 1, (1, H, H, F * F)).astype(np.float32)
    a = rng.uniform(-2, 2, (1, H, H, F * F)).astype(np.float32)
    b = rng.uniform(-2, 2, (1, H, H, F * F)).astype(np.float32)
    g = rng.normal(size=(1, H, H, 3)).astype(np.float32)

    def loss(w_, a_, b_):
        return jnp.sum(adacof_warp(jnp.asarray(x), w_, a_, b_, d) * jnp.asarray(g))

    gw, ga, gb = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(w), jnp.asarray(a), jnp.asarray(b)
    )

    # analytic formulas (sum over channels of gradLoss * ...):
    def corners(i, j, t):
        k, l = t // F, t % F
        A, Bf = int(a[0, i, j, t]), int(b[0, i, j, t])
        fi, fj = a[0, i, j, t] - A, b[0, i, j, t] - Bf
        i0 = min(max(i + k * d + A, 0), Hin - 1)
        i1 = min(max(i + k * d + A + 1, 0), Hin - 1)
        j0 = min(max(j + l * d + Bf, 0), Win - 1) if (Win := Hin) else 0
        j1 = min(max(j + l * d + Bf + 1, 0), Hin - 1)
        return i0, i1, j0, j1, fi, fj

    for _ in range(20):
        i, j, t = rng.integers(H), rng.integers(H), rng.integers(F * F)
        i0, i1, j0, j1, fi, fj = corners(i, j, t)
        x00, x10, x01, x11 = x[0, i0, j0], x[0, i1, j0], x[0, i0, j1], x[0, i1, j1]
        sample = (
            x00 * (1 - fi) * (1 - fj)
            + x10 * fi * (1 - fj)
            + x01 * (1 - fi) * fj
            + x11 * fi * fj
        )
        dW = float(np.sum(g[0, i, j] * sample))
        dA = float(
            np.sum(g[0, i, j] * (-x00 * (1 - fj) + x10 * (1 - fj) - x01 * fj + x11 * fj))
        ) * w[0, i, j, t]
        dB = float(
            np.sum(g[0, i, j] * (-x00 * (1 - fi) - x10 * fi + x01 * (1 - fi) + x11 * fi))
        ) * w[0, i, j, t]
        assert abs(float(gw[0, i, j, t]) - dW) < 1e-4
        assert abs(float(ga[0, i, j, t]) - dA) < 1e-4
        assert abs(float(gb[0, i, j, t]) - dB) < 1e-4


def test_adacof_net_shapes_and_uncertainty():
    model = AdaCoFNet(kernel_size=5, dilation=1)
    f0 = jnp.ones((1, 64, 96, 3)) * 0.3
    f2 = jnp.ones((1, 64, 96, 3)) * 0.7
    variables = model.init(jax.random.key(0), f0, f2)
    out = model.apply(variables, f0, f2)
    assert out.blended.shape == (1, 64, 96, 3)
    assert out.warped0.shape == (1, 64, 96, 3)
    assert out.uncertainty.shape == (1, 64, 96, 1)
    u = np.asarray(out.uncertainty)
    assert u.min() >= 0 and u.max() <= 1
    assert np.isfinite(np.asarray(out.blended)).all()


def test_adacof_net_nonmultiple32_padding():
    model = AdaCoFNet(kernel_size=5, dilation=1)
    f0 = jnp.ones((1, 50, 70, 3)) * 0.5
    f2 = jnp.ones((1, 50, 70, 3)) * 0.5
    variables = model.init(jax.random.key(0), f0, f2)
    out = model.apply(variables, f0, f2)
    assert out.blended.shape == (1, 50, 70, 3)


def test_flow_stats_and_penalties():
    rng = np.random.default_rng(2)
    # NHWC variant (ops.adacof)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(1, 4, 4, 9)).astype(np.float32)), axis=-1)
    a = jnp.asarray(rng.normal(size=(1, 4, 4, 9)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 4, 4, 9)).astype(np.float32))
    mean, var = flow_stats(w, a, b)
    assert mean.shape == (1, 4, 4, 2) and var.shape == (1, 4, 4, 2)
    assert float(jnp.min(var)) >= 0
    # tap-major variant must agree with the NHWC one
    from fmvfi_tpu.models.adacof import flow_stats_tm

    tm = lambda f: jnp.transpose(f, (3, 0, 1, 2))
    mean2, var2 = flow_stats_tm(tm(w), tm(a), tm(b))
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var), atol=1e-6)
    occ = jnp.ones((1, 4, 4, 1)) * 0.5
    gs, go = smoothness_penalties(tm(w), tm(a), tm(b), tm(w), tm(a), tm(b), occ)
    assert np.isfinite(float(gs)) and np.isfinite(float(go))


def test_head_final_matches_nhwc_reference():
    """The tap-major head tail (conv2 -> transpose -> 2x upsample -> 9-shift
    tensordot conv) must equal the plain NHWC conv->upsample->conv pipeline."""
    import torch
    import torch.nn.functional as F

    from fmvfi_tpu.models.adacof import _HeadFinal

    rng = np.random.default_rng(5)
    ks = 9
    x = rng.normal(size=(1, 12, 16, 64)).astype(np.float32)
    head = _HeadFinal(ks)
    variables = head.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(head.apply(variables, jnp.asarray(x)))  # (ks, B, 2h, 2w)

    p = variables["params"]
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    w2 = torch.from_numpy(np.asarray(p["conv2"]["kernel"]).transpose(3, 2, 0, 1).copy())
    b2 = torch.from_numpy(np.asarray(p["conv2"]["bias"]).copy())
    y = F.relu(F.conv2d(xt, w2, b2, padding=1))
    y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
    w3 = torch.from_numpy(np.asarray(p["conv3_kernel"]).transpose(3, 2, 0, 1).copy())
    b3 = torch.from_numpy(np.asarray(p["conv3_bias"]).copy())
    ref = F.conv2d(y, w3, b3, padding=1).numpy()  # (B, ks, 2h, 2w)
    np.testing.assert_allclose(
        np.moveaxis(out, 0, 1), ref, atol=5e-4
    )
