"""AdaCoF deformable warping: per-pixel FxF kernels with learned 2-D offsets.

Semantics re-derived from the reference's CuPy CUDA kernel quadruple
(/root/reference/src/adacof/cupy_module/adacof.py:6-258):

  out[b, i, j, c] = sum_{k,l} W[b,i,j,kF+l] * bilinear(x[b, i + k*d + a, j + l*d + b, c])

with  a = offset_i[b,i,j,kF+l],  b = offset_j[...],  and the CUDA kernel's
exact corner rule: integer part via C `(int)` cast (truncation toward zero,
NOT floor — adacof.py:27-28), the two taps at (A, A+1) each clamped to the
image bounds independently, and fractional weights (alpha - A) taken BEFORE
clamping.  Input arrives pre-padded: H_in = H + (F-1)*d (adacof.py:326).

Differentiation: plain JAX autodiff reproduces the reference's three backward
CUDA kernels exactly —
  dW      = the bilinear sample            (kernel_AdaCoF_updateGradWeight)
  dalpha  = W * d(sample)/d(frac_i)        (kernel_AdaCoF_updateGradAlpha)
  dbeta   = W * d(sample)/d(frac_j)        (kernel_AdaCoF_updateGradBeta)
because trunc() has zero tangent, so d(alpha - trunc(alpha))/dalpha = 1 and the
integer tap positions are (correctly) non-differentiable.  The reference
*allocates but never computes* the input gradient (adacof.py:382); autodiff
additionally yields the true scatter-add input gradient.  Pass
`stop_input_grad=True` to reproduce the reference's zero-input-grad training
dynamics.

Layout: NHWC.  The F*F tap loop is a lax.scan (compiles once, O(1) code size);
each tap is 4 clamped gathers along a flattened spatial axis — XLA lowers these
to efficient TPU dynamic-gathers, and the surrounding multiply-accumulate
fuses.  A Pallas kernel for the forward pass lives in `adacof_pallas.py`.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _trunc_int(x: jnp.ndarray):
    """C-style (int) cast: truncation toward zero."""
    t = jnp.trunc(x)
    return t


@partial(jax.jit, static_argnames=("dilation", "stop_input_grad"))
def adacof_warp(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset_i: jnp.ndarray,
    offset_j: jnp.ndarray,
    dilation: int = 1,
    stop_input_grad: bool = False,
) -> jnp.ndarray:
    """Apply adaptive collaboration-of-flows warping.

    Args:
      x:        (B, H_in, W_in, C) pre-padded input, H_in = H + (F-1)*dilation.
      weight:   (B, H, W, F*F) softmaxed kernel weights.
      offset_i: (B, H, W, F*F) vertical offsets (alpha).
      offset_j: (B, H, W, F*F) horizontal offsets (beta).
      dilation: tap spacing d.
    Returns:
      (B, H, W, C).
    """
    B, H_in, W_in, C = x.shape
    _, H, W, F2 = weight.shape
    F = int(math.isqrt(F2))
    assert F * F == F2, f"weight last dim {F2} is not a square"
    assert H_in - ((F - 1) * dilation + 1) == H - 1, (x.shape, weight.shape)
    assert W_in - ((F - 1) * dilation + 1) == W - 1, (x.shape, weight.shape)

    if stop_input_grad:
        x = jax.lax.stop_gradient(x)

    xf = x.reshape(B, H_in * W_in, C)
    ii = jnp.arange(H, dtype=jnp.int32)[None, :, None]  # (1, H, 1)
    jj = jnp.arange(W, dtype=jnp.int32)[None, None, :]  # (1, 1, W)

    # static per-tap base displacements k*d, l*d
    kk = jnp.asarray(
        [k * dilation for k in range(F) for _ in range(F)], dtype=jnp.int32
    )
    ll = jnp.asarray(
        [l * dilation for _ in range(F) for l in range(F)], dtype=jnp.int32
    )

    # scan over taps: carry the accumulator, slices of (F2, ...) stacked inputs
    wt = jnp.moveaxis(weight, -1, 0)  # (F2, B, H, W)
    at = jnp.moveaxis(offset_i, -1, 0)
    bt = jnp.moveaxis(offset_j, -1, 0)

    def tap(acc, inputs):
        w, alpha, beta, kd, ld = inputs
        A = _trunc_int(alpha)
        Bf = _trunc_int(beta)
        fi = alpha - A  # d(fi)/d(alpha) == 1 under autodiff (trunc has zero tangent)
        fj = beta - Bf
        i0 = ii + kd + A.astype(jnp.int32)
        j0 = jj + ld + Bf.astype(jnp.int32)
        i0c = jnp.clip(i0, 0, H_in - 1)
        i1c = jnp.clip(i0 + 1, 0, H_in - 1)
        j0c = jnp.clip(j0, 0, W_in - 1)
        j1c = jnp.clip(j0 + 1, 0, W_in - 1)

        def gather(iy, jx):
            idx = (iy * W_in + jx).reshape(B, H * W, 1)
            return jnp.take_along_axis(xf, idx, axis=1).reshape(B, H, W, C)

        sample = (
            gather(i0c, j0c) * ((1.0 - fi) * (1.0 - fj))[..., None]
            + gather(i1c, j0c) * (fi * (1.0 - fj))[..., None]
            + gather(i0c, j1c) * ((1.0 - fi) * fj)[..., None]
            + gather(i1c, j1c) * (fi * fj)[..., None]
        )
        return acc + w[..., None] * sample, None

    acc0 = jnp.zeros((B, H, W, C), dtype=x.dtype)
    acc, _ = jax.lax.scan(tap, acc0, (wt, at, bt, kk, ll))
    return acc


def pad_replicate(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """ReplicationPad2d equivalent on NHWC (adacofnet.py:168)."""
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="edge")


def flow_stats(weight: jnp.ndarray, offset_i: jnp.ndarray, offset_j: jnp.ndarray):
    """Weighted mean and variance of the per-pixel offset field.

    Mirrors fusion_adacofnet.py:201-208: mean_c = sum_t W_t * off_c_t,
    var_c = sum_t W_t * (mean_c - off_c_t)^2 for c in {i, j}.

    Returns (mean, var), each (B, H, W, 2) with components (i, j)."""
    mi = jnp.sum(weight * offset_i, axis=-1)
    mj = jnp.sum(weight * offset_j, axis=-1)
    vi = jnp.sum(weight * (mi[..., None] - offset_i) ** 2, axis=-1)
    vj = jnp.sum(weight * (mj[..., None] - offset_j) ** 2, axis=-1)
    return jnp.stack([mi, mj], axis=-1), jnp.stack([vi, vj], axis=-1)
