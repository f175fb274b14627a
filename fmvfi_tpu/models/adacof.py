"""AdaCoF: kernel-estimation U-Net + deformable warp wrapper.

Re-design of /root/reference/src/adacof/models/adacofnet.py and the fusion
variant /root/reference/src/fusion_net/fusion_adacofnet.py as flax.linen NHWC
modules.  The CuPy CUDA warp becomes `ops.adacof.adacof_warp`.

KernelEstimation (adacofnet.py:12-153): 5-level conv U-Net
(6->32->64->128->256->512, AvgPool down, bilinear-up(align_corners=True) +
conv, additive skips), 7 heads at half resolution upsampled 2x:
Weight1/2 (F^2, softmax), Alpha1/2, Beta1/2 (F^2, linear), Occlusion (1,
sigmoid).

AdaCoFNet.forward (fusion_adacofnet.py:172-240): reflect-pad inputs to /32,
fixed per-channel mean shift (utility.py:86), estimate kernels, replicate-pad
by (F-1)*d/2, warp both frames, occlusion-blend, and compute the flow
mean/variance maps + uncertainty mask (fusion_adacofnet.py:201-213).

NOT reproduced: the reference's w-padding crop bug
(fusion_adacofnet.py:225 assigns tensorAdaCoF1 = tensorAdaCoF2) — we crop
correctly.  The bug never triggers at /32-aligned eval resolutions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.adacof import adacof_warp, pad_replicate
from ..ops.resize import avg_pool2, upsample2x

# fixed RGB mean shift (utility.py:87)
_RGB_MEAN = (0.4631, 0.4352, 0.3990)


def module_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x - jnp.asarray(_RGB_MEAN, dtype=x.dtype)


class _Basic(nn.Module):
    c_out: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(self.c_out, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class _Upsample(nn.Module):
    c: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = upsample2x(x, align_corners=True)
        x = nn.Conv(self.c, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


def _conv3x3_tap_major(x_tm: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """3x3 SAME conv over tap-major (K, B, H, W) data as 9 shifted (K_in, K_out)
    tensordots — identical math to an NHWC conv, but the K=F^2(=25) axis never
    sits on the 128-lane dimension where it would pad 5x at full resolution."""
    k, b, h, w = x_tm.shape
    xp = jnp.pad(x_tm, [(0, 0), (0, 0), (1, 1), (1, 1)])
    out = None
    for dy in range(3):
        for dx in range(3):
            m = kernel[dy, dx]  # (K_in, K_out) from HWIO
            sl = xp[:, :, dy : dy + h, dx : dx + w]
            term = jnp.tensordot(m, sl, axes=[[0], [0]])  # (K_out, B, H, W)
            out = term if out is None else out + term
    return out + bias[:, None, None, None]


class _HeadFinal(nn.Module):
    """Shared tail of every head subnet: 64->ks conv at half res, transpose to
    tap-major, 2x upsample (align_corners=True), final 3x3 ks->ks conv in
    tap-major layout.  Bit-equivalent to conv->upsample->conv in NHWC
    (adacofnet.py:42-45), just layout-reordered for the TPU."""

    ks: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.ks, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x))
        x = jnp.transpose(x, (3, 0, 1, 2))  # (ks, B, h, w) at HALF res
        x = _resize_last2(x, x.shape[2] * 2, x.shape[3] * 2)
        kernel = self.param(
            "conv3_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.ks, self.ks),
            jnp.float32,
        )
        bias = self.param("conv3_bias", nn.initializers.zeros, (self.ks,), jnp.float32)
        dt = self.dtype or jnp.float32
        out = _conv3x3_tap_major(x.astype(dt), kernel.astype(dt), bias.astype(dt))
        return out.astype(jnp.float32)


def _resize_last2(x, h_out, w_out):
    """Bilinear (align_corners=True) over the last two axes of (K, B, h, w)."""
    from ..ops.resize import _resize_axis

    x = _resize_axis(x, x.ndim - 2, h_out, True)
    return _resize_axis(x, x.ndim - 1, w_out, True)


class _SubnetOffset(nn.Module):
    ks: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv0")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        return _HeadFinal(self.ks, self.dtype, name="final")(x)  # tap-major


class _SubnetWeight(nn.Module):
    ks: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv0")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        x = _HeadFinal(self.ks, self.dtype, name="final")(x)  # tap-major
        return nn.softmax(x, axis=0)  # over taps (leading axis)


class _SubnetOcclusion(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv0")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x))
        x = upsample2x(x, align_corners=True)
        return nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="conv3")(x).astype(jnp.float32))


class _ConvParams(nn.Module):
    """Declares an nn.Conv-compatible {kernel, bias} pair (same names, shapes
    and initializers) WITHOUT applying the conv — the parent fuses the
    weights of several heads into one wide conv at trace time, keeping the
    parameter tree (and thus every checkpoint/converter) unchanged."""

    shape: Tuple[int, ...]  # HWIO

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _HeadFinalParams(nn.Module):
    """Param holder matching _HeadFinal's tree: final/conv2 + conv3_*."""

    ks: int

    @nn.compact
    def __call__(self):
        c2 = _ConvParams((3, 3, 64, self.ks), name="conv2")()
        k3 = self.param(
            "conv3_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.ks, self.ks),
            jnp.float32,
        )
        b3 = self.param("conv3_bias", nn.initializers.zeros, (self.ks,), jnp.float32)
        return c2, (k3, b3)


class _HeadParams(nn.Module):
    """Param holder matching _SubnetWeight/_SubnetOffset's tree."""

    ks: int

    @nn.compact
    def __call__(self):
        c0 = _ConvParams((3, 3, 64, 64), name="conv0")()
        c1 = _ConvParams((3, 3, 64, 64), name="conv1")()
        c2, c3 = _HeadFinalParams(self.ks, name="final")()
        return c0, c1, c2, c3


class _OcclusionParams(nn.Module):
    """Param holder matching _SubnetOcclusion's tree."""

    @nn.compact
    def __call__(self):
        c0 = _ConvParams((3, 3, 64, 64), name="conv0")()
        c1 = _ConvParams((3, 3, 64, 64), name="conv1")()
        c2 = _ConvParams((3, 3, 64, 64), name="conv2")()
        c3 = _ConvParams((3, 3, 64, 1), name="conv3")()
        return c0, c1, c2, c3


def _conv_same(x, kernel, bias, dt):
    out = jax.lax.conv_general_dilated(
        x.astype(dt),
        kernel.astype(dt),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(dt)


def _block_diag_kernel(kernels, dt):
    """Stack per-head HWIO kernels into one block-diagonal wide kernel.
    A dense conv with exact-zero off-blocks computes bit-identically to the
    per-head convs (zero products cannot perturb the accumulation) but runs
    at wide-matmul MXU rates instead of the pathological narrow-conv path
    (measured 76 TF/s vs 0.5 TF/s at 1080p half-res on v5e)."""
    cin = sum(k.shape[2] for k in kernels)
    cout = sum(k.shape[3] for k in kernels)
    big = jnp.zeros((3, 3, cin, cout), dt)
    i = o = 0
    for k in kernels:
        big = big.at[:, :, i : i + k.shape[2], o : o + k.shape[3]].set(k.astype(dt))
        i += k.shape[2]
        o += k.shape[3]
    return big


class KernelEstimation(nn.Module):
    kernel_size: int
    dtype: object = None  # e.g. jnp.bfloat16 for MXU-rate inference

    @nn.compact
    def __call__(self, f0: jnp.ndarray, f2: jnp.ndarray):
        ks = self.kernel_size**2
        dt = self.dtype
        ct = dt or jnp.float32
        x = jnp.concatenate([f0, f2], axis=-1)
        if dt is not None:
            x = x.astype(dt)

        c1 = _Basic(32, dt, name="conv1")(x)
        c2 = _Basic(64, dt, name="conv2")(avg_pool2(c1))
        c3 = _Basic(128, dt, name="conv3")(avg_pool2(c2))
        c4 = _Basic(256, dt, name="conv4")(avg_pool2(c3))
        c5 = _Basic(512, dt, name="conv5")(avg_pool2(c4))

        d5 = _Basic(512, dt, name="deconv5")(avg_pool2(c5))
        u5 = _Upsample(512, dt, name="upsample5")(d5) + c5
        d4 = _Basic(256, dt, name="deconv4")(u5)
        u4 = _Upsample(256, dt, name="upsample4")(d4) + c4
        d3 = _Basic(128, dt, name="deconv3")(u4)
        u3 = _Upsample(128, dt, name="upsample3")(d3) + c3
        d2 = _Basic(64, dt, name="deconv2")(u3)
        u2 = _Upsample(64, dt, name="upsample2")(d2) + c2

        # --- heads, fused across the 7 subnets (6 W/a/b + occlusion) ---
        # The per-head 64->64 convs are the U-Net's dominant cost when run
        # separately (narrow convs at large spatial dims hit a pathological
        # XLA TPU path); concatenated/block-diagonal they are bit-identical
        # and run at wide-matmul rates.  Parameter tree matches the original
        # per-subnet modules exactly (see _ConvParams).
        head_names = ("weight1", "alpha1", "beta1", "weight2", "alpha2", "beta2")
        heads = [_HeadParams(ks, name=n)() for n in head_names]
        occ_p = _OcclusionParams(name="occlusion")()

        # conv0: all 7 share the same input -> one wide 64->448 conv
        k0 = jnp.concatenate([h[0][0] for h in heads] + [occ_p[0][0]], axis=-1)
        b0 = jnp.concatenate([h[0][1] for h in heads] + [occ_p[0][1]])
        h0 = nn.relu(_conv_same(u2, k0, b0, ct))
        # conv1: per-head 64->64 -> block-diagonal 448->448
        K1 = _block_diag_kernel([h[1][0] for h in heads] + [occ_p[1][0]], ct)
        b1v = jnp.concatenate([h[1][1] for h in heads] + [occ_p[1][1]])
        h1 = nn.relu(_conv_same(h0, K1, b1v, ct))
        # conv2: heads 64->ks, occlusion 64->64 -> block-diagonal 448->(6ks+64)
        K2 = _block_diag_kernel([h[2][0] for h in heads] + [occ_p[2][0]], ct)
        b2v = jnp.concatenate([h[2][1] for h in heads] + [occ_p[2][1]])
        h2 = nn.relu(_conv_same(h1, K2, b2v, ct))

        # head tails: ONE tap-major transpose + upsample for all 6 heads,
        # then a block-diagonal tap-major 3x3 conv (bit-equal to per-head)
        fields = h2[..., : 6 * ks]
        occ_feat = h2[..., 6 * ks :]
        tm = jnp.transpose(fields, (3, 0, 1, 2))  # (6ks, B, h, w) at HALF res
        tm = _resize_last2(tm, tm.shape[2] * 2, tm.shape[3] * 2)
        K3 = _block_diag_kernel([h[3][0] for h in heads], ct)
        b3v = jnp.concatenate([h[3][1] for h in heads])
        out_tm = _conv3x3_tap_major(tm.astype(ct), K3, b3v.astype(ct)).astype(
            jnp.float32
        )
        w1, a1, b1, w2, a2, b2 = [
            out_tm[i * ks : (i + 1) * ks] for i in range(6)
        ]
        w1 = nn.softmax(w1, axis=0)
        w2 = nn.softmax(w2, axis=0)

        # occlusion tail: upsample + 3x3 conv -> sigmoid (sigmoid in fp32)
        of = upsample2x(occ_feat, align_corners=True)
        occ = nn.sigmoid(
            _conv_same(of, occ_p[3][0], occ_p[3][1], ct).astype(jnp.float32)
        )
        return w1, a1, b1, w2, a2, b2, occ


class AdaCoFOutputs(NamedTuple):
    warped0: jnp.ndarray  # frame0 warped toward the middle (B,H,W,3)
    warped2: jnp.ndarray  # frame2 warped toward the middle
    blended: jnp.ndarray  # occlusion-blended prediction
    uncertainty: jnp.ndarray  # flow-variance mask (B,H,W,1), in [0,1]
    occlusion: jnp.ndarray  # (B,H,W,1)
    mean_flow: Tuple[jnp.ndarray, jnp.ndarray]  # per frame (B,H,W,2)
    var_flow: Tuple[jnp.ndarray, jnp.ndarray]
    heads: Tuple[jnp.ndarray, ...]  # raw (w1,a1,b1,w2,a2,b2), TAP-MAJOR
    # (F^2, B, H, W) at padded res — the layout the warp kernel consumes
    occ_raw: jnp.ndarray  # occlusion at padded res (for smoothness penalty)


class AdaCoFNet(nn.Module):
    """Full AdaCoF model: pads, estimates kernels, warps, blends.

    use_pallas: None = auto (Pallas warp kernel on TPU, XLA-gather elsewhere);
    True/False forces.  The Pallas path clamps offsets to +-max_offset
    (default 48, beyond any motion in the training diet / eval suite) with
    the true clip gradient (zero at saturation) — see ops/adacof_pallas.py.
    The halo-exchange sharded warp uses the SAME clamp; when a spatial
    shard is too short to host that halo it falls back to the exact SPMD
    gather instead of silently tightening the clamp."""

    kernel_size: int = 5
    dilation: int = 1
    max_offset: int = 48  # fast-path offset clamp (single-device AND sharded)
    use_pallas: bool | None = None
    dtype: object = None  # compute dtype for the kernel-estimation U-Net
    with_stats: bool = True  # flow mean/var + uncertainty (skip for the
    # baseline composite passes that only consume .blended)
    stats_batch: int | None = None  # compute the stats tail only for the
    # first N batch entries (the streaming path batches a stats-free pass
    # behind the main pair; None = whole batch)
    spatial_mesh: object = None  # 2-D (data x spatial) Mesh: route the warp
    # through the halo-exchange shard_map (parallel/spatial.py) so each
    # device runs the fast single-device kernel on its H-shard instead of
    # the SPMD-partitioned gather
    batch_axis: str = "data"
    spatial_axis: str = "spatial"

    def _sharded_max_offset(self, h: int, b2: int) -> int:
        """Offset clamp for the halo-exchange warp, or 0 if the halo path
        can't reproduce the single-device fast path exactly (fall back to
        the exact SPMD gather warp).

        The returned clamp is always the single-device fast-path clamp
        min(max_offset, lane-fit): a shard too short to host that halo
        falls back to the gather rather than silently tightening the clamp
        (which would make sharded outputs/gradients diverge from the
        single-device model for large motion)."""
        n_sp = self.spatial_mesh.shape[self.spatial_axis]
        n_b = self.spatial_mesh.shape[self.batch_axis]
        if h % n_sp or b2 % n_b:
            return 0
        kp = ((self.kernel_size - 1) * self.dilation) // 2
        fit = (126 - (self.kernel_size - 1) * self.dilation) // 2
        r = min(self.max_offset, fit)
        if fit < 24 or h // n_sp - kp - 1 < r:
            return 0
        return r

    def _warp(self, x, w_tm, a_tm, b_tm):
        """Warp with TAP-MAJOR fields (K, B, H, W)."""
        use = self.use_pallas
        if use is None:
            use = jax.default_backend() == "tpu"
        if use:
            # the Pallas lane-gather window requires
            # 2*max_offset + 2 + (F-1)*dilation <= 128; shrink the offset
            # clamp to fit large kernel/dilation configs, and fall back to
            # the XLA-gather warp when the fit leaves too little range
            fit = (126 - (self.kernel_size - 1) * self.dilation) // 2
            if fit >= 24:
                from ..ops.adacof_pallas import adacof_warp_fast_tm

                return adacof_warp_fast_tm(
                    x, w_tm, a_tm, b_tm, self.dilation,
                    max_offset=min(self.max_offset, fit),
                )
            # else: fall through to the exact unclamped XLA path
        to_nhwc = lambda f: jnp.transpose(f, (1, 2, 3, 0))
        return adacof_warp(x, to_nhwc(w_tm), to_nhwc(a_tm), to_nhwc(b_tm), self.dilation)

    @nn.compact
    def __call__(self, frame0: jnp.ndarray, frame2: jnp.ndarray) -> AdaCoFOutputs:
        b, h0, w0, c = frame0.shape
        assert frame2.shape == frame0.shape, "frame sizes do not match"

        pad_h = (32 - h0 % 32) % 32
        pad_w = (32 - w0 % 32) % 32
        if pad_h or pad_w:
            pad = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
            frame0 = jnp.pad(frame0, pad, mode="reflect")
            frame2 = jnp.pad(frame2, pad, mode="reflect")

        w1, a1, b1, w2, a2, b2, occ = KernelEstimation(
            self.kernel_size, self.dtype, name="get_kernel"
        )(module_normalize(frame0), module_normalize(frame2))

        kp = ((self.kernel_size - 1) * self.dilation) // 2
        # ONE warp launch for both frames: frames stacked on the batch axis,
        # fields on the tap-major batch axis — same math, half the kernel
        # dispatches and twice the grid for DMA/compute overlap
        w_cat = jnp.concatenate([w1, w2], axis=1)
        a_cat = jnp.concatenate([a1, a2], axis=1)
        b_cat = jnp.concatenate([b1, b2], axis=1)
        r_sh = (
            self._sharded_max_offset(frame0.shape[1], 2 * frame0.shape[0])
            if self.spatial_mesh is not None
            else 0
        )
        if r_sh:
            from ..parallel.spatial import adacof_warp_tm_sharded

            wboth = adacof_warp_tm_sharded(
                jnp.concatenate([frame0, frame2], axis=0),
                w_cat, a_cat, b_cat, self.dilation, self.spatial_mesh,
                self.batch_axis, self.spatial_axis, max_offset=r_sh,
            )
        else:
            xs = jnp.concatenate(
                [pad_replicate(frame0, kp), pad_replicate(frame2, kp)], axis=0
            )
            wboth = self._warp(xs, w_cat, a_cat, b_cat)
        warped0, warped2 = jnp.split(wboth, 2, axis=0)
        blended = occ * warped0 + (1.0 - occ) * warped2

        if self.with_stats:
            sl = (slice(None), slice(None, self.stats_batch))
            mean1, var1 = flow_stats_tm(w1[sl], a1[sl], b1[sl])
            mean2, var2 = flow_stats_tm(w2[sl], a2[sl], b2[sl])
            # UncertaintyMask (fusion_adacofnet.py:211-213): max of summed
            # variance components, clipped to [0, 20], scaled to [0,1]; detached.
            unc = jnp.maximum(var1.sum(-1), var2.sum(-1))
            unc = jnp.clip(unc, 0.0, 20.0) / 20.0
            unc = jax.lax.stop_gradient(unc)[..., None]
        else:
            z2 = jnp.zeros(frame0.shape[:3] + (2,), frame0.dtype)
            mean1 = mean2 = var1 = var2 = z2
            unc = jnp.zeros(frame0.shape[:3] + (1,), frame0.dtype)

        def crop(x):
            return x[:, :h0, :w0]

        return AdaCoFOutputs(
            warped0=crop(warped0),
            warped2=crop(warped2),
            blended=crop(blended),
            uncertainty=crop(unc),
            occlusion=crop(occ),
            mean_flow=(crop(mean1), crop(mean2)),
            var_flow=(crop(var1), crop(var2)),
            heads=(w1, a1, b1, w2, a2, b2),
            occ_raw=occ,
        )


def flow_stats_tm(weight, offset_i, offset_j):
    """flow_stats for tap-major (K, B, H, W) fields -> (B, H, W, 2) each."""
    mi = jnp.sum(weight * offset_i, axis=0)
    mj = jnp.sum(weight * offset_j, axis=0)
    vi = jnp.sum(weight * (mi[None] - offset_i) ** 2, axis=0)
    vj = jnp.sum(weight * (mj[None] - offset_j) ** 2, axis=0)
    return jnp.stack([mi, mj], axis=-1), jnp.stack([vi, vj], axis=-1)


def smoothness_penalties(w1, a1, b1, w2, a2, b2, occ, eps: float = 1e-3):
    """Training regularizers g_Spatial / g_Occlusion (adacofnet.py:202-217):
    Charbonnier of finite differences of the weighted-mean offset fields and
    of the occlusion map."""

    def charb(d):
        return jnp.mean(jnp.sqrt(d**2 + eps**2))

    def grad_penalty(m):  # m: (B,H,W) weighted-mean offset field
        return charb(m[:, :, :-1] - m[:, :, 1:]) + charb(
            m[:, :-1, :] - m[:, 1:, :]
        )

    # NOTE: mean (not sum) over taps, matching adacofnet.py:203-206.
    # Fields are tap-major (K, B, H, W).
    m1_i = jnp.mean(w1 * a1, axis=0)
    m1_j = jnp.mean(w1 * b1, axis=0)
    m2_i = jnp.mean(w2 * a2, axis=0)
    m2_j = jnp.mean(w2 * b2, axis=0)
    g_spatial = (
        grad_penalty(m1_i) + grad_penalty(m1_j) + grad_penalty(m2_i) + grad_penalty(m2_j)
    )
    o = occ[..., 0]
    g_occ = charb(o[:, :, :-1] - o[:, :, 1:]) + charb(o[:, :-1, :] - o[:, 1:, :])
    return g_spatial, g_occ
