"""Bilinear resizing and pooling with explicit corner semantics.

The reference mixes torch Upsample(align_corners=False) (PhaseNet level
upsampling, FusionNet decoder) and align_corners=True (AdaCoF U-Net heads,
/root/reference/src/adacof/models/adacofnet.py:31,44).  To reproduce converted
checkpoints exactly we implement both as separable gather+lerp — static
weights, so XLA turns each axis pass into a tiny dense contraction.

Layout: NHWC (B, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(n_in: int, n_out: int, align_corners: bool):
    """Static source indices and lerp weights for one axis."""
    if n_in == n_out:
        return None
    dst = np.arange(n_out, dtype=np.float64)
    if align_corners:
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = dst * (n_in - 1) / (n_out - 1)
    else:
        src = (dst + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0.0, None)
    i0 = np.floor(src).astype(np.int32)
    i0 = np.clip(i0, 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (src - i0).astype(np.float32)
    return i0, i1, w



def _resize_axis(x: jnp.ndarray, axis: int, n_out: int, align_corners: bool,
                 block: int = 128):
    """Resize one axis as a BLOCKED banded contraction.

    Interpolation IS a matrix, and on TPU a dense matmul on the MXU beats the
    gather lowering XLA produces for jnp.take by a wide margin — but the full
    (n_in, n_out) matrix is 2-banded, so a dense contraction wastes
    ~n_out/block of the FLOPs (at 1080p PhaseNet levels that was ~2 TFLOP per
    resize).  Each `block`-column stripe of outputs only reads the
    [i0[first], i1[last]] input band, so we contract per-stripe slabs against
    small (slab, block) matrices: same math, ~n_out/block fewer FLOPs."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    i0, i1, w = _axis_weights(n_in, n_out, align_corners)
    # fp32 inputs keep full precision (TPU matmuls default to bf16 passes,
    # which would break torch-checkpoint parity); bf16 runs at MXU rate
    prec = "highest" if x.dtype == jnp.float32 else None

    outs = []
    for o0 in range(0, n_out, block):
        o1 = min(n_out, o0 + block)
        lo = int(i0[o0])
        hi = int(i1[o1 - 1]) + 1  # static band bounds, indices are monotone
        rows = jnp.arange(lo, hi, dtype=jnp.int32)[:, None]
        i0j = jnp.asarray(i0[o0:o1])[None, :]
        i1j = jnp.asarray(i1[o0:o1])[None, :]
        wj = jnp.asarray(w[o0:o1])[None, :]
        m = jnp.where(rows == i0j, 1.0 - wj, 0.0) + jnp.where(rows == i1j, wj, 0.0)
        xs = jax.lax.slice_in_dim(x, lo, hi, axis=axis)
        outs.append(
            jnp.tensordot(xs, m.astype(x.dtype), axes=[[axis], [0]], precision=prec)
        )
    # tensordot moves the contracted axis to the end; restore position
    out = jnp.concatenate(outs, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(
    x: jnp.ndarray, out_hw, *, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or (..., H, W, C)) to (out_h, out_w)."""
    out_h, out_w = out_hw
    x = _resize_axis(x, x.ndim - 3, out_h, align_corners)
    x = _resize_axis(x, x.ndim - 2, out_w, align_corners)
    return x


def upsample2x(x: jnp.ndarray, *, align_corners: bool) -> jnp.ndarray:
    return resize_bilinear(
        x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=align_corners
    )


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pooling over NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pooling over NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
