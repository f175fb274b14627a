"""FusionNet: converted published weights vs a torch functional oracle."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fmvfi_tpu.models.fusion_net import FusionNet
from fmvfi_tpu.utils.convert import fusion_net_from_torch

CKPT = "/root/reference/src/fusion_net/fusion_net.pt"
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT), reason="no reference ckpt")


def _torch_oracle(sd, x):
    """Encoder/decoder forward via torch functional ops (NCHW)."""

    def rconv(x, key, k):
        pad = k // 2
        if pad:
            x = F.pad(x, (pad, pad, pad, pad), mode="reflect")
        return F.conv2d(x, sd[f"{key}.weight"], sd[f"{key}.bias"])

    skips = []
    for i, k in enumerate([5, 5, 3]):
        x = F.relu(rconv(x, f"encoder_layers.{i}", k))
        skips.append(x)
        x = F.max_pool2d(x, 2, 2)
    x = rconv(x, "bottleneck_layer", 3)
    for i, (k, s) in enumerate(zip([5, 5, 1], skips[::-1])):
        x = F.interpolate(F.relu(x), scale_factor=2, mode="bilinear", align_corners=False)
        x = x + s
        x = rconv(x, f"decoder_layers.{i}", k)
    return torch.tanh(x)


@needs_ckpt
def test_fusion_net_matches_torch_oracle():
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    variables = fusion_net_from_torch(CKPT)
    model = FusionNet()

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
    ada = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
    phase = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
    other = rng.uniform(0, 1, (2, 32, 48, 6)).astype(np.float32)
    maps = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)

    ours = np.asarray(
        model.apply(
            variables,
            jnp.asarray(base),
            jnp.asarray(ada),
            jnp.asarray(phase),
            jnp.asarray(other),
            jnp.asarray(maps),
        )
    )

    x = np.concatenate([base, ada, phase, other, maps], axis=-1)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    res = _torch_oracle(sd, xt).numpy()
    expect = np.clip(np.moveaxis(base, -1, 1) + res, 0, 1)
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), expect, atol=2e-5)


@needs_ckpt
def test_fusion_net_init_structure_matches_conversion():
    variables = fusion_net_from_torch(CKPT)
    model = FusionNet()
    z3 = jnp.zeros((1, 16, 16, 3))
    init_vars = model.init(
        jax.random.key(0), z3, z3, z3, jnp.zeros((1, 16, 16, 6)), z3
    )
    a = jax.tree.map(lambda x: x.shape, init_vars["params"])
    b = jax.tree.map(lambda x: x.shape, variables["params"])
    assert a == b


def test_fusion_net_variant1_no_maps():
    model = FusionNet(uncertainty_maps=0)
    z3 = jnp.ones((1, 16, 16, 3)) * 0.5
    v = model.init(jax.random.key(0), z3, z3, z3, jnp.zeros((1, 16, 16, 6)), None, 1)
    out = model.apply(v, z3, z3, z3, jnp.zeros((1, 16, 16, 6)), None, 1)
    assert out.shape == (1, 16, 16, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
