"""Pallas TPU kernel for AdaCoF deformable warping.

Why: the XLA gather formulation (ops/adacof.py) costs ~1.9s per 1080p warp on
v5e — XLA lowers per-pixel 2-D gathers to a serial path.  This kernel reaches
the hardware's actual gather capability:

- the HORIZONTAL axis uses Mosaic's native lane-gather
  (`jnp.take_along_axis(.., axis=1)` on (S, 128) tiles), with the <=
  (2R+2+Fd)-wide source window covered by exactly two adjacent 128-col tiles;
- the VERTICAL axis walks integer-offset candidates with per-(tap, block)
  dynamic bounds (min/max of the offset field), so smooth offset fields cost
  ~2-4 candidates instead of 2R;
- the image stays in HBM; each row-block DMAs its (tile_h + 2R + Fd)-row band
  into VMEM scratch once and reuses it across all F^2 taps (the whole 1080p
  image would not fit VMEM double-buffered).

Semantics match the reference CUDA kernel (cupy_module/adacof.py:6-65):
truncation-toward-zero corners, fractional weights from the *unclamped*
fraction, clamp-to-edge sampling — EXCEPT that integer offsets are clamped to
[-R, R] (`max_offset`, default 31).  Trained AdaCoF offset fields stay well
inside that (they are smoothness-regularized); the jnp path remains the exact
reference for parity checks and arbitrary offsets.

Backward: custom_vjp whose residual-free backward re-runs the jnp autodiff
path (training uses the exact gradients; this kernel is the inference/serving
fast path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adacof import adacof_warp as adacof_warp_jnp


def _trunc(x):
    return jnp.where(x >= 0, jnp.floor(x), -jnp.floor(-x))


def _kernel(
    w_ref, a_ref, b_ref, x_ref, o_ref, xband, sem, *, F, dilation, R, tile_h, w_out
):
    """One (channel-image, row-block, tap) program.

    x_ref lives in HBM; the row band this block can touch (bounded by R) is
    DMA'd into the `xband` VMEM scratch once per row-block (at tap 0) and
    reused across all F^2 taps — the whole image never occupies VMEM."""
    n = pl.program_id(0)
    rb = pl.program_id(1)
    t = pl.program_id(2)
    kd = (t // F) * dilation  # vertical tap base offset
    ld = jax.lax.rem(t, F) * dilation  # horizontal tap base offset
    row0 = rb * tile_h

    @pl.when(t == 0)
    def _():
        band_h = xband.shape[0]
        cp = pltpu.make_async_copy(
            x_ref.at[n, pl.ds(row0, band_h), :], xband, sem
        )
        cp.start()
        cp.wait()

    w = w_ref[0, 0]  # (tile_h, W)
    alpha = jnp.clip(a_ref[0, 0], -R, R)
    beta = jnp.clip(b_ref[0, 0], -R, R)
    A = _trunc(alpha)
    Bf = _trunc(beta)
    fi = alpha - A  # in (-1, 1); matches CUDA's alpha-(int)alpha
    fj = beta - Bf
    Ai = A.astype(jnp.int32) + R  # vertical candidate id in [0, 2R]
    Bi = Bf.astype(jnp.int32) + R  # horizontal offset bias in [0, 2R]

    # columns: source index (in padded x) for corner 0, per out pixel
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 1)
    src_j = col_ids + ld + Bi  # corner 0; corner 1 = src_j + 1

    pmin = jnp.min(Ai)
    pmax = jnp.max(Ai) + 1  # +1 candidate row for the vertical corner

    n_ctiles = w_out // 128
    acc0 = jnp.zeros((tile_h, w_out), jnp.float32)

    def body(p, acc):
        # vertical blend weight for candidate row p (covers both corners)
        vw = jnp.where(Ai == p, 1.0 - fi, 0.0) + jnp.where(Ai == p - 1, fi, 0.0)
        # band-relative source rows [kd + p, + tile_h): Mosaic needs 8-aligned
        # dynamic sublane starts, so load an aligned slab and realign with a
        # dynamic sublane roll.  NOTE: dynamic-shift pltpu.roll silently
        # corrupts data beyond 16 sublanes on v5e, so tile_h stays <= 8
        # (slab = 16 rows).
        s = kd + p
        start = (s // 8) * 8
        r = s - start
        cols = []
        for c in range(n_ctiles):
            slab_a = xband[pl.ds(start, tile_h + 8), pl.ds(c * 128, 256)]
            slab = pltpu.roll(slab_a, -r, axis=0)[0:tile_h]
            tile0 = slab[:, 0:128]
            tile1 = slab[:, 128:256]
            jloc = src_j[:, c * 128 : (c + 1) * 128] - c * 128  # in [0, 194]

            def hgather(idx):
                g0 = jnp.take_along_axis(tile0, jnp.clip(idx, 0, 127), axis=1)
                g1 = jnp.take_along_axis(tile1, jnp.clip(idx - 128, 0, 127), axis=1)
                return jnp.where(idx < 128, g0, g1)

            fj_c = fj[:, c * 128 : (c + 1) * 128]
            sample = (1.0 - fj_c) * hgather(jloc) + fj_c * hgather(jloc + 1)
            cols.append(sample)
        sample = jnp.concatenate(cols, axis=1)
        return acc + vw * sample

    acc = jax.lax.fori_loop(pmin, pmax + 1, body, acc0)
    contrib = w * acc

    @pl.when(t == 0)
    def _():
        o_ref[0] = contrib

    @pl.when(t != 0)
    def _():
        o_ref[0] = o_ref[0] + contrib


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("dilation", "max_offset", "tile_h", "interpret")
)
def _warp_pallas_planar(
    x_pad: jnp.ndarray,  # (N, Hp, Wp) replicate-padded channel images
    weight: jnp.ndarray,  # (F2, N, H, W)  (tap-major, pre-broadcast over chans)
    offset_i: jnp.ndarray,
    offset_j: jnp.ndarray,
    dilation: int,
    max_offset: int,
    tile_h: int,
    interpret: bool,
) -> jnp.ndarray:
    N, Hp, Wp = x_pad.shape
    F2, NB, H, W = weight.shape
    F = int(math.isqrt(F2))
    R = max_offset
    C = N // NB  # channels share one field set; index_map folds n -> batch
    grid = (N, H // tile_h, F2)

    kernel = functools.partial(
        _kernel, F=F, dilation=dilation, R=R, tile_h=tile_h, w_out=W
    )
    field_spec = pl.BlockSpec(
        (1, 1, tile_h, W),
        lambda n, rb, t: (t, n // C, rb, 0),
        memory_space=pltpu.VMEM,
    )
    # rows a block can touch: [rb*tile_h, rb*tile_h + band_h) in padded coords
    band_h = Hp - H + tile_h
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            field_spec,
            field_spec,
            field_spec,
            # image stays in HBM; the kernel DMAs row bands into scratch
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W), lambda n, rb, t: (n, rb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((band_h, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(weight, offset_i, offset_j, x_pad)


def adacof_warp_pallas(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset_i: jnp.ndarray,
    offset_j: jnp.ndarray,
    dilation: int = 1,
    max_offset: int = 31,
    tile_h: int = 8,
    interpret: bool = False,
    tap_major: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.adacof.adacof_warp (same pre-padded-input contract:
    x (B, H_in, W_in, C) with H_in = H + (F-1)*dilation), offsets clamped to
    +-max_offset.  With tap_major=True the fields are (F2, B, H, W) — the
    layout KernelEstimation produces — and no transposes happen at all."""
    Bn, H_in, W_in, C = x.shape
    if tap_major:
        F2, _, H, W = weight.shape
    else:
        _, H, W, F2 = weight.shape
    F = int(math.isqrt(F2))
    R = max_offset
    assert H_in - ((F - 1) * dilation + 1) == H - 1

    # pad to grid-friendly sizes
    Ht = _round_up(H, tile_h)
    Wt = _round_up(W, 128)
    # padded image: R extra on all sides (edge mode == the CUDA index clamp),
    # plus grid rounding; vertical needs one extra row for the +1 corner.
    # +8 rows of slack: the kernel loads (tile_h + 8)-row aligned slabs
    Hp = _round_up(Ht + (F - 1) * dilation + 2 * R + 2 + 8, 8)
    Wp = Wt + 256  # last col-tile reads a 256-wide slab

    # channel-planar (B*C, Hp, Wp)
    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(Bn * C, H_in, W_in)
    xp = jnp.pad(xp, [(0, 0), (R, Hp - H_in - R), (R, Wp - W_in - R)], mode="edge")

    def pad_fields(f):
        if tap_major:
            return jnp.pad(
                f, [(0, 0), (0, 0), (0, Ht - H), (0, Wt - W)], mode="edge"
            )
        f = jnp.pad(f, [(0, 0), (0, Ht - H), (0, Wt - W), (0, 0)], mode="edge")
        # tap-major (F2, B, Ht, Wt); channels share fields via the kernel's
        # index_map (n // C), so no repeat-materialization
        return jnp.transpose(f, (3, 0, 1, 2))

    wgt = pad_fields(weight)
    ai = pad_fields(offset_i)
    bj = pad_fields(offset_j)

    out = _warp_pallas_planar(
        xp, wgt, ai, bj, dilation, R, tile_h, interpret
    )  # (B*C, Ht, Wt)
    out = out[:, :H, :W].reshape(Bn, C, H, W)
    return jnp.transpose(out, (0, 2, 3, 1))


# ------------------------------------------------------------------ vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def adacof_warp_fast(x, weight, offset_i, offset_j, dilation=1, max_offset=31):
    """Pallas forward, exact-jnp backward (reference CUDA gradient math)."""
    return adacof_warp_pallas(
        x, weight, offset_i, offset_j, dilation, max_offset
    )


def _fwd(x, weight, offset_i, offset_j, dilation, max_offset):
    out = adacof_warp_pallas(x, weight, offset_i, offset_j, dilation, max_offset)
    return out, (x, weight, offset_i, offset_j)


def _bwd(dilation, max_offset, res, g):
    x, weight, offset_i, offset_j = res
    _, vjp = jax.vjp(
        lambda xx, ww, aa, bb: adacof_warp_jnp(xx, ww, aa, bb, dilation),
        x,
        weight,
        offset_i,
        offset_j,
    )
    return vjp(g)


adacof_warp_fast.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def adacof_warp_fast_tm(x, w_tm, a_tm, b_tm, dilation=1, max_offset=31):
    """Tap-major-field variant: fields (F2, B, H, W), zero transposes."""
    return adacof_warp_pallas(
        x, w_tm, a_tm, b_tm, dilation, max_offset, tap_major=True
    )


def _fwd_tm(x, w_tm, a_tm, b_tm, dilation, max_offset):
    out = adacof_warp_pallas(
        x, w_tm, a_tm, b_tm, dilation, max_offset, tap_major=True
    )
    return out, (x, w_tm, a_tm, b_tm)


def _bwd_tm(dilation, max_offset, res, g):
    x, w_tm, a_tm, b_tm = res
    to_nhwc = lambda f: jnp.transpose(f, (1, 2, 3, 0))
    _, vjp = jax.vjp(
        lambda xx, ww, aa, bb: adacof_warp_jnp(
            xx,
            jnp.transpose(ww, (1, 2, 3, 0)),
            jnp.transpose(aa, (1, 2, 3, 0)),
            jnp.transpose(bb, (1, 2, 3, 0)),
            dilation,
        ),
        x,
        w_tm,
        a_tm,
        b_tm,
    )
    return vjp(g)


adacof_warp_fast_tm.defvjp(_fwd_tm, _bwd_tm)
