"""Numerical parity of our flax/NHWC layers against torch (CPU) functional
oracles — this is what makes torch-checkpoint conversion trustworthy.

These oracles are built from torch.nn.functional primitives with random
weights; they encode the layer semantics the reference relies on (reflect-pad
convs, eval-mode BatchNorm, both bilinear corner conventions, pooling)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp
import flax.linen as nn

from fmvfi_tpu.ops.resize import avg_pool2, max_pool2, resize_bilinear, upsample2x


def _np(x):
    return np.asarray(x)


def _to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def _to_nchw(a):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(a, -1, 1)))


@pytest.mark.parametrize("k,pad_mode", [(1, None), (3, "reflect"), (5, "reflect")])
def test_conv_reflect_parity(k, pad_mode):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 14, 6)).astype(np.float32)
    w = rng.normal(size=(8, 6, k, k)).astype(np.float32) * 0.2
    b = rng.normal(size=(8,)).astype(np.float32)

    xt = _to_nchw(x)
    pad = k // 2
    if pad:
        xt = F.pad(xt, (pad, pad, pad, pad), mode="reflect")
    ref = _to_nhwc(F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b)))

    xj = jnp.asarray(x)
    if pad:
        xj = jnp.pad(xj, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    conv = nn.Conv(8, (k, k), padding="VALID")
    variables = {
        "params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    }
    ours = _np(conv.apply(variables, xj))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_batchnorm_eval_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    gamma = rng.normal(size=(16,)).astype(np.float32)
    beta = rng.normal(size=(16,)).astype(np.float32)
    mean = rng.normal(size=(16,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(16,)).astype(np.float32)

    ref = _to_nhwc(
        F.batch_norm(
            _to_nchw(x),
            torch.from_numpy(mean),
            torch.from_numpy(var),
            torch.from_numpy(gamma),
            torch.from_numpy(beta),
            training=False,
            eps=1e-5,
        )
    )
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    ours = _np(bn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("out_hw", [(16, 16), (11, 13), (7, 9)])
def test_bilinear_parity(align, out_hw):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ref = _to_nhwc(
        F.interpolate(_to_nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    )
    ours = _np(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_upsample2x_parity():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 6, 5, 4)).astype(np.float32)
    for align in (False, True):
        ref = _to_nhwc(
            F.interpolate(_to_nchw(x), scale_factor=2, mode="bilinear", align_corners=align)
        )
        ours = _np(upsample2x(jnp.asarray(x), align_corners=align))
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pool_parity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    ref_avg = _to_nhwc(F.avg_pool2d(_to_nchw(x), 2, 2))
    ref_max = _to_nhwc(F.max_pool2d(_to_nchw(x), 2, 2))
    np.testing.assert_allclose(_np(avg_pool2(jnp.asarray(x))), ref_avg, atol=1e-6)
    np.testing.assert_allclose(_np(max_pool2(jnp.asarray(x))), ref_max, atol=1e-6)


def test_elu_tanh_sigmoid_parity():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(_np(nn.elu(jnp.asarray(x))), F.elu(xt).numpy(), atol=1e-6)
    np.testing.assert_allclose(_np(jnp.tanh(jnp.asarray(x))), torch.tanh(xt).numpy(), atol=1e-6)
    np.testing.assert_allclose(_np(nn.sigmoid(jnp.asarray(x))), torch.sigmoid(xt).numpy(), atol=1e-6)
