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
fraction, clamp-to-edge sampling — EXCEPT that offsets are clamped to
[-R, R] (`max_offset`, default 48; the lane-gather window bounds R at
(126 - (F-1)*dilation)/2, asserted).  48 px covers every motion magnitude in
the training diet and eval suite (max 28 px/frame); the jnp path remains the
exact reference for parity checks and arbitrary offsets.

Backward: fused Pallas kernel computing dW/dalpha/dbeta in one pass, with the
TRUE gradient of the clamped forward — dalpha/dbeta are masked to zero where
|offset| >= max_offset.  An earlier revision returned the unclamped-point
gradient at saturation; with a diet demanding ~30 px motion that made
saturation a runaway instead of an absorbing state (the optimizer kept
pushing offsets outward through a forward that no longer responded) and
deterministically blew up training within ~80 steps once any offset crossed
the clamp.  The non-TPU fallback differentiates the CLIPPED jnp warp so
gradients are identical on every backend.
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
    max_offset: int = 48,
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
    assert 2 * R + 2 + (F - 1) * dilation <= 128, (
        f"max_offset {R} exceeds the 2-tile lane-gather window for "
        f"F={F}, dilation={dilation} (bound: {(126 - (F - 1) * dilation) // 2})"
    )
    # pltpu.roll silently corrupts data beyond 16 sublanes on v5e (see the
    # kernel body); slabs load (tile_h + 8) rows, so tile_h must stay <= 8
    assert 1 <= tile_h <= 8, (
        f"tile_h {tile_h}: slab height tile_h+8 would exceed the 16-sublane "
        "roll limit"
    )
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


# ------------------------------------------------------- backward kernels


def _bwd_kernel(
    g_ref,
    w_ref,
    a_ref,
    b_ref,
    x_ref,
    dw_ref,
    da_ref,
    db_ref,
    xband,
    gtile,
    sem,
    semg,
    *,
    F,
    dilation,
    R,
    tile_h,
    w_out,
    C,
):
    """One (batch, row-block, tap) program computing the three field
    gradients — the reference's kernel_AdaCoF_updateGrad{Weight,Alpha,Beta}
    (cupy_module/adacof.py:67-258) fused into ONE pass over the shared
    4-corner gather:

      dW[t]    = sum_c g_c * sample_c          (bilinear sample, as forward)
      dalpha[t]= sum_c g_c * W[t] * (row(A+1)-row(A) blend)   d(sample)/dfi
      dbeta[t] = sum_c g_c * W[t] * (col(B+1)-col(B) blend)   d(sample)/dfj

    x stays in HBM; the row band (all C channels) and the C grad tiles are
    DMA'd into VMEM scratch once per row-block (at tap 0) and reused by all
    F^2 taps."""
    n = pl.program_id(0)  # batch index (fields batch)
    rb = pl.program_id(1)
    t = pl.program_id(2)
    kd = (t // F) * dilation
    ld = jax.lax.rem(t, F) * dilation
    row0 = rb * tile_h

    @pl.when(t == 0)
    def _():
        band_h = xband.shape[1]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(n * C, C), pl.ds(row0, band_h), :], xband, sem
        )
        cp.start()
        cp.wait()
        cpg = pltpu.make_async_copy(
            g_ref.at[pl.ds(n * C, C), pl.ds(row0, tile_h), :], gtile, semg
        )
        cpg.start()
        cpg.wait()

    w = w_ref[0, 0]  # (tile_h, W)
    alpha = jnp.clip(a_ref[0, 0], -R, R)
    beta = jnp.clip(b_ref[0, 0], -R, R)
    A = _trunc(alpha)
    Bf = _trunc(beta)
    fi = alpha - A
    fj = beta - Bf
    Ai = A.astype(jnp.int32) + R
    Bi = Bf.astype(jnp.int32) + R

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 1)
    src_j = col_ids + ld + Bi

    pmin = jnp.min(Ai)
    pmax = jnp.max(Ai) + 1
    n_ctiles = w_out // 128

    z = jnp.zeros((tile_h, w_out), jnp.float32)
    acc0 = (z,) * (3 * C)

    def body(p, accs):
        vw = jnp.where(Ai == p, 1.0 - fi, 0.0) + jnp.where(Ai == p - 1, fi, 0.0)
        # d(vw)/dfi: -1 at the A row, +1 at the A+1 row
        dvw = jnp.where(Ai == p, -1.0, 0.0) + jnp.where(Ai == p - 1, 1.0, 0.0)
        s = kd + p
        start = (s // 8) * 8
        r = s - start
        out = list(accs)
        for c in range(C):
            cols_s = []
            cols_dj = []
            for ct in range(n_ctiles):
                slab_a = xband[c, pl.ds(start, tile_h + 8), pl.ds(ct * 128, 256)]
                slab = pltpu.roll(slab_a, -r, axis=0)[0:tile_h]
                tile0 = slab[:, 0:128]
                tile1 = slab[:, 128:256]
                jloc = src_j[:, ct * 128 : (ct + 1) * 128] - ct * 128

                def hgather(idx):
                    g0 = jnp.take_along_axis(tile0, jnp.clip(idx, 0, 127), axis=1)
                    g1 = jnp.take_along_axis(
                        tile1, jnp.clip(idx - 128, 0, 127), axis=1
                    )
                    return jnp.where(idx < 128, g0, g1)

                h0 = hgather(jloc)
                h1 = hgather(jloc + 1)
                fj_c = fj[:, ct * 128 : (ct + 1) * 128]
                cols_s.append((1.0 - fj_c) * h0 + fj_c * h1)
                cols_dj.append(h1 - h0)
            smp = jnp.concatenate(cols_s, axis=1)
            dj = jnp.concatenate(cols_dj, axis=1)
            out[3 * c + 0] = out[3 * c + 0] + vw * smp  # sample
            out[3 * c + 1] = out[3 * c + 1] + dvw * smp  # d/dfi
            out[3 * c + 2] = out[3 * c + 2] + vw * dj  # d/dfj
        return tuple(out)

    accs = jax.lax.fori_loop(pmin, pmax + 1, body, acc0)

    dw = jnp.zeros((tile_h, w_out), jnp.float32)
    da = jnp.zeros((tile_h, w_out), jnp.float32)
    db = jnp.zeros((tile_h, w_out), jnp.float32)
    for c in range(C):
        g = gtile[c]
        dw = dw + g * accs[3 * c + 0]
        da = da + g * accs[3 * c + 1]
        db = db + g * accs[3 * c + 2]
    dw_ref[0, 0] = dw
    da_ref[0, 0] = da * w
    db_ref[0, 0] = db * w


@functools.partial(
    jax.jit, static_argnames=("dilation", "max_offset", "tile_h", "interpret", "C")
)
def _warp_pallas_bwd_planar(
    x_pad: jnp.ndarray,  # (B*C, Hp, Wp)
    g_pad: jnp.ndarray,  # (B*C, Ht, Wt) output grads, channel-planar
    weight: jnp.ndarray,  # (F2, B, Ht, Wt)
    offset_i: jnp.ndarray,
    offset_j: jnp.ndarray,
    dilation: int,
    max_offset: int,
    tile_h: int,
    interpret: bool,
    C: int,
):
    N, Hp, Wp = x_pad.shape
    F2, NB, H, W = weight.shape
    F = int(math.isqrt(F2))
    R = max_offset
    grid = (NB, H // tile_h, F2)

    kernel = functools.partial(
        _bwd_kernel,
        F=F,
        dilation=dilation,
        R=R,
        tile_h=tile_h,
        w_out=W,
        C=C,
    )
    field_spec = pl.BlockSpec(
        (1, 1, tile_h, W),
        lambda n, rb, t: (t, n, rb, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, tile_h, W),
        lambda n, rb, t: (t, n, rb, 0),
        memory_space=pltpu.VMEM,
    )
    band_h = Hp - H + tile_h
    shape = jax.ShapeDtypeStruct((F2, NB, H, W), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # g (DMA'd per block)
            field_spec,
            field_spec,
            field_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),  # x
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((C, band_h, Wp), jnp.float32),
            pltpu.VMEM((C, tile_h, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(g_pad, weight, offset_i, offset_j, x_pad)


def adacof_warp_pallas_bwd(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset_i: jnp.ndarray,
    offset_j: jnp.ndarray,
    g: jnp.ndarray,
    dilation: int = 1,
    max_offset: int = 48,
    tile_h: int = 8,
    interpret: bool = False,
    tap_major: bool = False,
):
    """Field gradients (dW, dalpha, dbeta) of adacof_warp_pallas.

    Same padded-input contract as the forward; `g` is the output cotangent
    (B, H, W, C).  Returns gradients in the same layout as the fields
    (NHWC F2-last, or tap-major (F2, B, H, W) with tap_major=True).  The
    input gradient is NOT computed here (the reference CUDA module never
    implemented it either — adacof.py:382)."""
    Bn, H_in, W_in, Cc = x.shape
    if tap_major:
        F2, _, H, W = weight.shape
    else:
        _, H, W, F2 = weight.shape
    F = int(math.isqrt(F2))
    R = max_offset
    assert 2 * R + 2 + (F - 1) * dilation <= 128, (
        f"max_offset {R} exceeds the 2-tile lane-gather window for "
        f"F={F}, dilation={dilation} (bound: {(126 - (F - 1) * dilation) // 2})"
    )
    # pltpu.roll silently corrupts data beyond 16 sublanes on v5e (see the
    # kernel body); slabs load (tile_h + 8) rows, so tile_h must stay <= 8
    assert 1 <= tile_h <= 8, (
        f"tile_h {tile_h}: slab height tile_h+8 would exceed the 16-sublane "
        "roll limit"
    )

    Ht = _round_up(H, tile_h)
    Wt = _round_up(W, 128)
    Hp = _round_up(Ht + (F - 1) * dilation + 2 * R + 2 + 8, 8)
    Wp = Wt + 256

    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(Bn * Cc, H_in, W_in)
    xp = jnp.pad(xp, [(0, 0), (R, Hp - H_in - R), (R, Wp - W_in - R)], mode="edge")
    # grads: zero-pad (padded output rows/cols contribute nothing)
    gp = jnp.transpose(g, (0, 3, 1, 2)).reshape(Bn * Cc, H, W)
    gp = jnp.pad(gp, [(0, 0), (0, Ht - H), (0, Wt - W)])

    def pad_fields(f):
        if tap_major:
            return jnp.pad(
                f, [(0, 0), (0, 0), (0, Ht - H), (0, Wt - W)], mode="edge"
            )
        f = jnp.pad(f, [(0, 0), (0, Ht - H), (0, Wt - W), (0, 0)], mode="edge")
        return jnp.transpose(f, (3, 0, 1, 2))

    dw, da, db = _warp_pallas_bwd_planar(
        xp,
        gp,
        pad_fields(weight),
        pad_fields(offset_i),
        pad_fields(offset_j),
        dilation,
        R,
        tile_h,
        interpret,
        Cc,
    )
    dw = dw[:, :, :H, :W]
    da = da[:, :, :H, :W]
    db = db[:, :, :H, :W]
    if tap_major:
        return dw, da, db
    to_nhwc = lambda f: jnp.transpose(f, (1, 2, 3, 0))
    return to_nhwc(dw), to_nhwc(da), to_nhwc(db)


# ------------------------------------------------------------------ vjp


def _saturation_mask(da, db, offset_i, offset_j, max_offset):
    """True gradient of the clamped forward: zero dalpha/dbeta where the
    offset is at/beyond the clamp.  Without this, saturation is a runaway
    (the optimizer keeps pushing offsets outward through a forward that no
    longer responds) instead of an absorbing state."""
    R = float(max_offset)
    return (
        da * (jnp.abs(offset_i) < R).astype(da.dtype),
        db * (jnp.abs(offset_j) < R).astype(db.dtype),
    )


def _fwd_dispatch(x, weight, offset_i, offset_j, dilation, max_offset, tap_major):
    """Backend-dispatched CLIPPED forward: Pallas on TPU, jnp elsewhere —
    same dispatch as the backward, so adacof_warp_fast[/_tm] is callable
    (and its gradient contract exercisable) on every backend."""
    if jax.default_backend() == "tpu":
        return adacof_warp_pallas(
            x, weight, offset_i, offset_j, dilation, max_offset,
            tap_major=tap_major,
        )
    R = float(max_offset)
    if tap_major:
        to_nhwc = lambda f: jnp.transpose(f, (1, 2, 3, 0))
        weight, offset_i, offset_j = (
            to_nhwc(weight), to_nhwc(offset_i), to_nhwc(offset_j),
        )
    return adacof_warp_jnp(
        x, weight, jnp.clip(offset_i, -R, R), jnp.clip(offset_j, -R, R),
        dilation,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def adacof_warp_fast(x, weight, offset_i, offset_j, dilation=1, max_offset=48):
    """Pallas forward, fused-Pallas backward (reference CUDA gradient math).

    Gradient contract (identical on every backend):
      * d/dx is ZERO — the reference CUDA module allocates but never computes
        the input gradient (cupy_module/adacof.py:382), and every trainer in
        this framework warps either data frames or stop_gradient'ed frozen
        outputs.  Callers that need to differentiate through the warped image
        must use `adacof_warp_jnp` directly.
      * dW/dα/dβ are the TRUE gradients of the clamped forward: the reference
        semantics for |offset| < max_offset, ZERO at saturation (the clip's
        gradient).  The non-TPU fallback differentiates the clipped jnp warp,
        which gives the same thing.
    """
    return _fwd_dispatch(
        x, weight, offset_i, offset_j, dilation, max_offset, tap_major=False
    )


def _fwd(x, weight, offset_i, offset_j, dilation, max_offset):
    out = _fwd_dispatch(
        x, weight, offset_i, offset_j, dilation, max_offset, tap_major=False
    )
    return out, (x, weight, offset_i, offset_j)


def _bwd(dilation, max_offset, res, g):
    x, weight, offset_i, offset_j = res
    if jax.default_backend() == "tpu":
        # Pallas field gradients; dx = zeros — EXACTLY the reference's
        # training semantics (its CUDA module allocates but never computes
        # the input gradient, cupy_module/adacof.py:382).  No trainer in
        # this framework needs dx: the warped operands are either data
        # frames or stop_gradient'ed frozen-model outputs.
        dw, da, db = adacof_warp_pallas_bwd(
            x, weight, offset_i, offset_j, g, dilation, max_offset
        )
    else:
        R = float(max_offset)
        _, vjp = jax.vjp(
            lambda xx, ww, aa, bb: adacof_warp_jnp(
                xx, ww, jnp.clip(aa, -R, R), jnp.clip(bb, -R, R), dilation
            ),
            x,
            weight,
            offset_i,
            offset_j,
        )
        _dx, dw, da, db = vjp(g)
    da, db = _saturation_mask(da, db, offset_i, offset_j, max_offset)
    # dx = zeros on EVERY backend (see docstring): keeps gradients
    # backend-independent and matches the reference's training semantics.
    return jnp.zeros_like(x), dw, da, db


adacof_warp_fast.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def adacof_warp_fast_tm(x, w_tm, a_tm, b_tm, dilation=1, max_offset=48):
    """Tap-major-field variant: fields (F2, B, H, W), zero transposes.
    Same gradient contract as `adacof_warp_fast` (dx = zeros everywhere,
    dalpha/dbeta zero at offset saturation)."""
    return _fwd_dispatch(
        x, w_tm, a_tm, b_tm, dilation, max_offset, tap_major=True
    )


def _fwd_tm(x, w_tm, a_tm, b_tm, dilation, max_offset):
    out = _fwd_dispatch(
        x, w_tm, a_tm, b_tm, dilation, max_offset, tap_major=True
    )
    return out, (x, w_tm, a_tm, b_tm)


def _bwd_tm(dilation, max_offset, res, g):
    x, w_tm, a_tm, b_tm = res
    if jax.default_backend() == "tpu":
        dw, da, db = adacof_warp_pallas_bwd(
            x, w_tm, a_tm, b_tm, g, dilation, max_offset, tap_major=True
        )
    else:
        R = float(max_offset)
        _, vjp = jax.vjp(
            lambda xx, ww, aa, bb: adacof_warp_jnp(
                xx,
                jnp.transpose(ww, (1, 2, 3, 0)),
                jnp.clip(jnp.transpose(aa, (1, 2, 3, 0)), -R, R),
                jnp.clip(jnp.transpose(bb, (1, 2, 3, 0)), -R, R),
                dilation,
            ),
            x,
            w_tm,
            a_tm,
            b_tm,
        )
        _dx, dw, da, db = vjp(g)
    da, db = _saturation_mask(da, db, a_tm, b_tm, max_offset)
    # same backend-independent dx = zeros contract as adacof_warp_fast
    return jnp.zeros_like(x), dw, da, db


adacof_warp_fast_tm.defvjp(_fwd_tm, _bwd_tm)
