"""Image quality metrics in jnp (the reference computes these via `piq` on
GPU torch, /root/reference/src/evaluation/evaluate_image.py:21-30).

Provided: PSNR, SSIM (standard 11x11 gaussian-window formulation), SSD,
L1-sum, mean difference, variance-of-difference.  LPIPS requires pretrained
VGG weights that cannot be downloaded in this environment; `lpips` here is a
documented substitution: gradient-domain structural distance (see docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def ssd(a, b):
    return jnp.sum((a - b) ** 2)


def l1(a, b):
    return jnp.sum(jnp.abs(a - b))


def mean_diff(a, b):
    return jnp.mean(a - b)


def var_diff(a, b):
    return jnp.var(a - b)


@functools.lru_cache(maxsize=4)
def _ssim_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-0.5 * (x / sigma) ** 2)
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over NHWC images (gaussian window, K1=0.01, K2=0.03 —
    the standard Wang et al. formulation piq implements)."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    w = jnp.asarray(_ssim_window(size, sigma))[:, :, None, None]  # HWIO, per-chan

    c = a.shape[-1]
    kern = jnp.tile(w, (1, 1, 1, 1))

    def filt(x):
        # depthwise valid conv
        return jax.lax.conv_general_dilated(
            x,
            jnp.tile(kern, (1, 1, 1, c)),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a = filt(a)
    mu_b = filt(b)
    mu_a2, mu_b2, mu_ab = mu_a**2, mu_b**2, mu_a * mu_b
    sig_a = filt(a * a) - mu_a2
    sig_b = filt(b * b) - mu_b2
    sig_ab = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s)


def gradient_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS substitution (documented): mean L2 distance between local
    luminance-gradient structures.  Correlates with perceptual sharpness
    differences; NOT the trained LPIPS metric (whose VGG weights cannot be
    fetched in this offline environment)."""
    def grads(x):
        y = x.mean(-1)
        return jnp.stack(
            [y[:, 1:, :-1] - y[:, :-1, :-1], y[:, :-1, 1:] - y[:, :-1, :-1]], -1
        )

    if a.ndim == 3:
        a, b = a[None], b[None]
    return jnp.sqrt(jnp.mean((grads(a) - grads(b)) ** 2))


def make_vgg_lpips(vgg_checkpoint: str):
    """VGG16-feature LPIPS (gated on a user-supplied torchvision vgg16
    checkpoint — no network egress here).  Implements the LPIPS construction
    of Zhang et al. that piq.LPIPS wraps (evaluate_image.py:21-28): images to
    [-1,1]-style normalized VGG space, features unit-normalized across
    channels at relu{1_2,2_2,3_3,4_3,5_3}, squared differences spatially
    averaged and summed over layers.  DOCUMENTED DEVIATION: the published
    LPIPS applies *learned* per-channel linear weights before averaging; those
    weights ship with the lpips package (also not fetchable), so this uses the
    paper's unit-weight baseline variant.  Returns f(pred, target) -> scalar
    for (H, W, 3) images."""
    from ..train.vgg import LPIPS_TAPS, VGGFeatures, vgg16_params_from_torch

    variables = vgg16_params_from_torch(vgg_checkpoint, full=True)
    model = VGGFeatures(full=True, taps=LPIPS_TAPS)

    def lpips_fn(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fp = model.apply(variables, pred[None])
        ft = model.apply(variables, target[None])
        total = 0.0
        for a, b in zip(fp, ft):
            na = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            nb = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=-1))
        return total

    return lpips_fn


def all_metrics(pred: jnp.ndarray, target: jnp.ndarray, lpips_fn=None) -> dict:
    """The reference harness's per-image metric vector
    (evaluate_image.py:21-28): [SSIM, LPIPS, PSNR, SSD, L1, mean, var].
    `lpips_fn` (from make_vgg_lpips) adds the real VGG-feature LPIPS when a
    vgg16 checkpoint is configured; lpips_sub stays as the offline fallback."""
    out = {
        "ssim": ssim(pred, target),
        "lpips_sub": gradient_distance(pred, target),
        "psnr": psnr(pred, target),
        "ssd": ssd(pred, target),
        "l1": l1(pred, target),
        "mean_diff": mean_diff(pred, target),
        "var_diff": var_diff(pred, target),
    }
    if lpips_fn is not None:
        out["lpips_vgg"] = lpips_fn(pred, target)
    return out
