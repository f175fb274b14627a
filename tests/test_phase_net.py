"""PhaseNet model tests: converted published weights + a full torch functional
oracle of the forward pass (built from F.* primitives, eval-mode BN)."""

import math
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fmvfi_tpu.models.phase_net import (
    NormState,
    PhaseNetCore,
    normalize_inputs,
    predictions_to_decomp,
)
from fmvfi_tpu.utils.convert import phase_net_from_torch

CKPT = "/root/reference/src/phase_net/phase_net.pt"
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT), reason="no reference ckpt")


def _level_sizes(h, n):
    sizes = [h]
    for _ in range(n - 1):
        sizes.append(int(np.ceil((sizes[-1] - 0.5) / np.sqrt(2))))
    return sizes[::-1]  # coarse-first


def _rand_inputs(rng, b3, h0, nlev, nbands=4, num_img=2):
    sizes = _level_sizes(h0, nlev)
    low = rng.uniform(0, 1, (b3, sizes[0] // 2, sizes[0] // 2, num_img)).astype(
        np.float32
    )
    phases = [
        rng.uniform(-math.pi, math.pi, (b3, s, s, nbands * num_img)).astype(np.float32)
        for s in sizes
    ]
    amps = [
        rng.uniform(0, 2, (b3, s, s, nbands * num_img)).astype(np.float32)
        for s in sizes
    ]
    return low, phases, amps


def _torch_block(sd, i, x):
    """Oracle: one PhaseNet block via torch functional ops, NCHW."""
    pre = f"layers.{i}"
    w1 = sd[f"{pre}.feature_map.0.weight"]
    k = w1.shape[-1]
    pad = k // 2

    def rpad(z):
        return F.pad(z, (pad, pad, pad, pad), mode="reflect") if pad else z

    x = F.conv2d(rpad(x), w1, sd[f"{pre}.feature_map.0.bias"])
    x = F.batch_norm(
        x,
        sd[f"{pre}.feature_map.1.running_mean"],
        sd[f"{pre}.feature_map.1.running_var"],
        sd[f"{pre}.feature_map.1.weight"],
        sd[f"{pre}.feature_map.1.bias"],
        training=False,
        eps=1e-5,
    )
    x = F.elu(x)
    x = F.conv2d(rpad(x), sd[f"{pre}.feature_map.3.weight"], sd[f"{pre}.feature_map.3.bias"])
    feat = F.elu(x)
    pred = torch.tanh(
        F.conv2d(feat, sd[f"{pre}.prediction_map.0.weight"], sd[f"{pre}.prediction_map.0.bias"])
    )
    return feat, pred


def _torch_core_forward(sd, low, phases, amps, nbands=4):
    """Oracle: the whole coarse-to-fine forward (num_img=2), NCHW lists."""
    feat, pred = _torch_block(sd, 0, low)
    alpha = (pred[:, 0] + 1) / 2
    low_pred = (alpha * low[:, 0] + (1 - alpha) * low[:, 1]).unsqueeze(1)
    phase_preds, amp_preds = [], []
    for idx in range(len(phases)):
        size = phases[idx].shape[2:]
        feat_r = F.interpolate(feat, size=size, mode="bilinear", align_corners=False)
        pred_r = F.interpolate(pred, size=size, mode="bilinear", align_corners=False)
        x = torch.cat([feat_r, phases[idx], amps[idx], pred_r], dim=1)
        i = min(idx + 1, 7)
        feat, pred = _torch_block(sd, i, x)
        beta = (pred[:, nbands : 2 * nbands] + 1) / 2
        amp = beta * amps[idx][:, nbands : 2 * nbands] + (1 - beta) * amps[idx][:, :nbands]
        phase_preds.append(pred[:, :nbands])
        amp_preds.append(amp)
    return low_pred, phase_preds, amp_preds


@needs_ckpt
def test_converted_weights_match_module_structure():
    variables = phase_net_from_torch(CKPT)
    core = PhaseNetCore(num_img=2)
    rng = np.random.default_rng(0)
    # >= 8 levels so every shared block is traced during init (flax only
    # materializes called modules)
    low, phases, amps = _rand_inputs(rng, 3, 64, 8)
    init_vars = core.init(
        jax.random.key(0),
        jnp.asarray(low),
        [jnp.asarray(p) for p in phases],
        [jnp.asarray(a) for a in amps],
    )
    init_shapes = jax.tree.map(lambda a: a.shape, init_vars["params"])
    conv_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    assert init_shapes == conv_shapes


@needs_ckpt
def test_full_forward_matches_torch_oracle():
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    variables = phase_net_from_torch(CKPT)
    core = PhaseNetCore(num_img=2)

    rng = np.random.default_rng(1)
    low, phases, amps = _rand_inputs(rng, 6, 41, 5)
    # normalize as the pipeline would
    lown, phasesn, ampsn, norm = normalize_inputs(
        jnp.asarray(low), [jnp.asarray(p) for p in phases], [jnp.asarray(a) for a in amps]
    )
    lo, pp, ap = core.apply(variables, lown, phasesn, ampsn)

    def to_t(a):  # NHWC -> NCHW torch
        return torch.from_numpy(np.moveaxis(np.asarray(a), -1, 1).copy())

    t_lo, t_pp, t_ap = _torch_core_forward(
        sd, to_t(lown), [to_t(p) for p in phasesn], [to_t(a) for a in ampsn]
    )
    np.testing.assert_allclose(
        np.asarray(lo)[..., 0], t_lo.numpy()[:, 0], atol=2e-4
    )
    for a, b in zip(pp, t_pp):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(a), -1, 1), b.numpy(), atol=2e-4
        )
    for a, b in zip(ap, t_ap):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(a), -1, 1), b.numpy(), atol=2e-4
        )


def test_predictions_to_decomp_roundtrip_norm():
    """denormalize inverts normalize for the predicted quantities."""
    rng = np.random.default_rng(2)
    low, phases, amps = _rand_inputs(rng, 3, 23, 3)
    lown, phasesn, ampsn, norm = normalize_inputs(
        jnp.asarray(low), [jnp.asarray(p) for p in phases], [jnp.asarray(a) for a in amps]
    )
    # feed the normalized inputs straight through as "predictions"
    high = jnp.zeros((3, 64, 64))
    dec = predictions_to_decomp(
        lown[..., :1],
        [p[..., :4] for p in phasesn],
        [a[..., :4] for a in ampsn],
        norm,
        high,
    )
    # fine-first level 0 == coarse-first level -1
    np.testing.assert_allclose(
        np.asarray(dec.phase[0]),
        np.moveaxis(phases[-1][..., :4], -1, 1),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dec.amplitude[0]),
        np.moveaxis(amps[-1][..., :4], -1, 1),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dec.low), low[..., 0], atol=1e-5
    )
