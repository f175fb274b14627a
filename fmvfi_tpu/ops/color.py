"""On-device RGB <-> CIELAB color transforms.

The reference does these on CPU via scikit-image per batch
(`/root/reference/src/train/transform.py:6-49`), a host round-trip on every
training step.  Here they are pure jnp matrix + cube-root math (sRGB D65,
identical formulas to skimage.color), so they fuse into the surrounding XLA
graph and never leave the device.

Normalization convention (matching transform.py):
  L   -> L / 100
  a,b -> (v + 128) / 255
applied on top of the standard CIELAB values, so all channels are ~[0, 1].

Layout: channel-last (..., 3). Callers reshape as needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65), rows = X,Y,Z; identical to skimage.color.rgb2xyz.
_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)

# D65 reference white (skimage's xyz_ref_white for illuminant D65, observer 2).
_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)

_EPS = 0.008856451679035631  # (6/29)**3
_KAPPA = 903.2962962962963  # (29/3)**3


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    # small positive floor keeps the 1/2.4 power differentiable at 0
    safe = jnp.maximum(c, 1e-12)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * safe ** (1.0 / 2.4) - 0.055)


def _mat3(v: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """(..., 3) @ m.T as explicit FMA math.

    A jnp.dot would route this through the MXU, where fp32 inputs default to
    bfloat16 passes — unacceptable precision for a 3x3 color matrix and zero
    benefit.  Elementwise VPU math is exact and fuses with the gamma curves."""
    c0, c1, c2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [m[r, 0] * c0 + m[r, 1] * c1 + m[r, 2] * c2 for r in range(3)], axis=-1
    )


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    safe = jnp.maximum(t, 1e-12)
    return jnp.where(t > _EPS, jnp.cbrt(safe), (_KAPPA * t + 16.0) / 116.0)


def _lab_f_inv(f: jnp.ndarray) -> jnp.ndarray:
    f3 = f**3
    return jnp.where(f3 > _EPS, f3, (116.0 * f - 16.0) / _KAPPA)


def rgb_to_lab(rgb: jnp.ndarray, *, normalized: bool = True) -> jnp.ndarray:
    """sRGB in [0,1] -> (normalized) CIELAB.  Shape (..., 3).

    With normalized=True (default) applies the reference scaling
    (L/100, (ab+128)/255); with False returns raw Lab.
    """
    lin = _srgb_to_linear(rgb)
    xyz = _mat3(lin, _RGB2XYZ)
    f = _lab_f(xyz / _WHITE)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    lab = jnp.stack([L, a, b], axis=-1)
    if normalized:
        lab = jnp.stack([L / 100.0, (a + 128.0) / 255.0, (b + 128.0) / 255.0], axis=-1)
    return lab


def lab_to_rgb(lab: jnp.ndarray, *, normalized: bool = True) -> jnp.ndarray:
    """(normalized) CIELAB -> sRGB in [0,1].  Shape (..., 3)."""
    if normalized:
        L = lab[..., 0] * 100.0
        a = lab[..., 1] * 255.0 - 128.0
        b = lab[..., 2] * 255.0 - 128.0
    else:
        L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1) * _WHITE
    lin = _mat3(xyz, _XYZ2RGB)
    return _linear_to_srgb(lin)
