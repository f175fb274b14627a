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


def test_fusion_net_variant2_gated_blend():
    """Variant 2 (gated-blend head): the final 1x1 conv emits 3 selection
    logits + 3 residual channels; output is the per-pixel softmax blend of
    {base, adacof, phase} plus a confidence-muted residual.  Key property:
    a saturated logit reproduces the selected component EXACTLY (the whole
    point of the variant — tracking a near-perfect component stops requiring
    the residual head to predict a difference image to 2.5e-3 RMSE)."""
    model = FusionNet()
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    ada = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    phase = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    other = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 6)).astype(np.float32))
    maps = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))

    v = model.init(jax.random.key(0), base, ada, phase, other, maps, 2)
    # head widened to 6 channels; every other layer matches variant 0
    assert v["params"]["dec2"]["kernel"].shape == (1, 1, 32, 6)
    v0 = model.init(jax.random.key(0), base, ada, phase, other, maps, 0)
    for name in v0["params"]:
        if name != "dec2":
            assert (
                jax.tree.map(lambda x: x.shape, v0["params"][name])
                == jax.tree.map(lambda x: x.shape, v["params"][name])
            )

    out = model.apply(v, base, ada, phase, other, maps, 2)
    assert out.shape == (2, 16, 16, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    # saturate the adacof logit: zero the head kernel, bias = [0, K, 0 | 0s]
    params = jax.tree.map(lambda x: x, v["params"])  # shallow copy
    params["dec2"] = {
        "kernel": jnp.zeros_like(v["params"]["dec2"]["kernel"]),
        "bias": jnp.array([0.0, 40.0, 0.0, 0.3, -0.7, 0.5], jnp.float32),
    }
    out = model.apply({"params": params}, base, ada, phase, other, maps, 2)
    # softmax weight on adacof = 1 - 2e-40; residual muted by (1 - max w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ada), atol=1e-6)


def test_fusion_net_variant2_zero_init_starts_at_component_mean():
    """The variant-2 head (dec2) is zero-initialized, so a freshly
    initialized (or cross-variant warm-started) net outputs EXACTLY the
    uniform component mean with a zero residual — training never has to
    first undo random logits/residuals amplified through warm-started
    decoder features."""
    model = FusionNet()
    rng = np.random.default_rng(7)
    base = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    ada = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    phase = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    other = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 6)).astype(np.float32))
    maps = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))

    v = model.init(jax.random.key(3), base, ada, phase, other, maps, 2)
    assert float(jnp.abs(v["params"]["dec2"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(v["params"]["dec2"]["bias"]).max()) == 0.0
    out = model.apply(v, base, ada, phase, other, maps, 2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray((base + ada + phase) / 3.0), atol=1e-6
    )
    # variants 0/1 keep the stock initializer (bit-compat with checkpoints)
    v0 = model.init(jax.random.key(3), base, ada, phase, other, maps, 0)
    assert float(jnp.abs(v0["params"]["dec2"]["kernel"]).max()) > 0.0


def test_merge_matching_params_cross_variant():
    """Warm-starting a variant-2 net from variant-0 weights keeps every
    layer except the widened dec2 head (utils.convert.merge_matching_params,
    used by tools/train_demo_stack.py --fusion_variant 2 --fusion_init)."""
    from fmvfi_tpu.utils.convert import merge_matching_params

    model = FusionNet()
    z3 = jnp.zeros((1, 16, 16, 3))
    a = (z3, z3, z3, jnp.zeros((1, 16, 16, 6)), z3)
    v0 = model.init(jax.random.key(0), *a, 0)
    v2 = model.init(jax.random.key(1), *a, 2)
    merged, fresh = merge_matching_params(v2["params"], v0["params"])
    assert fresh == ["['dec2']['bias']", "['dec2']['kernel']"]
    for name in v0["params"]:
        for leaf in v0["params"][name]:
            src = v2 if name == "dec2" else v0
            np.testing.assert_array_equal(
                np.asarray(merged[name][leaf]),
                np.asarray(src["params"][name][leaf]),
            )


def test_fusion_net_variant1_no_maps():
    model = FusionNet(uncertainty_maps=0)
    z3 = jnp.ones((1, 16, 16, 3)) * 0.5
    v = model.init(jax.random.key(0), z3, z3, z3, jnp.zeros((1, 16, 16, 6)), None, 1)
    out = model.apply(v, z3, z3, z3, jnp.zeros((1, 16, 16, 6)), None, 1)
    assert out.shape == (1, 16, 16, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
