"""Torch-checkpoint -> flax-variables converters.

The reference publishes trained weights for PhaseNet
(/root/reference/src/phase_net/phase_net.pt, state dict of the 8-block module)
and FusionNet (/root/reference/src/fusion_net/fusion_net*.pt).  These
converters map them onto our flax modules so evaluation is bit-comparable
without retraining.  AdaCoF's published ckpt.pth files are LFS-missing from
the reference mount, so `adacof_from_torch` exists for users who have them.

Layout notes:
- torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O).
- torch BatchNorm2d {weight, bias, running_mean, running_var} -> flax
  BatchNorm {scale, bias} + batch_stats {mean, var}.
- Data layout here is NHWC; channel orders are preserved, so no channel
  permutation is needed beyond the kernel transpose.

torch is only imported inside the functions (it's a CPU-only conversion
dependency, never part of the compute path).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32).transpose(2, 3, 1, 0)
    b = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return {"kernel": w, "bias": b}


def _bn(sd, key):
    params = {
        "scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{key}.running_mean"], dtype=np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], dtype=np.float32),
    }
    return params, stats


def _load_state_dict(path_or_sd) -> Dict[str, Any]:
    sd = path_or_sd
    if isinstance(sd, (str, bytes)) or hasattr(sd, "__fspath__"):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # AdaCoF saves {'epoch', 'state_dict'}
    return {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
        if hasattr(v, "numpy") or isinstance(v, np.ndarray)
    }


def phase_net_from_torch(path_or_sd) -> Dict[str, Any]:
    """phase_net.pt (PhaseNet/PhaseNetCore state dict: layers.{i}.feature_map
    .{0 conv,1 bn,3 conv} + prediction_map.0) -> variables for
    models.phase_net.PhaseNetCore."""
    sd = _load_state_dict(path_or_sd)
    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    params, stats = {}, {}
    for i in range(n_blocks):
        base = f"layers.{i}"
        bn_p, bn_s = _bn(sd, f"{base}.feature_map.1")
        params[f"block{i}"] = {
            "conv1": _conv(sd, f"{base}.feature_map.0"),
            "bn": bn_p,
            "conv2": _conv(sd, f"{base}.feature_map.3"),
            "pred": _conv(sd, f"{base}.prediction_map.0"),
        }
        stats[f"block{i}"] = {"bn": bn_s}
    return {"params": params, "batch_stats": stats}


def fusion_net_from_torch(path_or_sd) -> Dict[str, Any]:
    """fusion_net.pt -> variables for models.fusion_net.FusionNet.
    (The checkpoint's unused `net.*` Sequential keys are ignored.)"""
    sd = _load_state_dict(path_or_sd)
    params = {
        "enc0": _conv(sd, "encoder_layers.0"),
        "enc1": _conv(sd, "encoder_layers.1"),
        "enc2": _conv(sd, "encoder_layers.2"),
        "bottleneck": _conv(sd, "bottleneck_layer"),
        "dec0": _conv(sd, "decoder_layers.0"),
        "dec1": _conv(sd, "decoder_layers.1"),
        "dec2": _conv(sd, "decoder_layers.2"),
    }
    return {"params": params}


def adacof_from_torch(path_or_sd) -> Dict[str, Any]:
    """AdaCoF ckpt.pth ({'epoch', 'state_dict'} or raw state dict) ->
    variables for models.adacof.AdaCoFNet."""
    sd = _load_state_dict(path_or_sd)
    # strip an eventual 'module.' DataParallel prefix
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def basic(prefix):
        return {f"conv{i}": _conv(sd, f"{prefix}.{2 * i}") for i in range(3)}

    def upsample(prefix):
        return {"conv": _conv(sd, f"{prefix}.1")}

    def subnet(prefix):  # offset/weight subnets: convs at 0,2,4 then 7.
        # the tail (conv2 + final conv3) lives in the tap-major _HeadFinal
        c3 = _conv(sd, f"{prefix}.7")
        return {
            "conv0": _conv(sd, f"{prefix}.0"),
            "conv1": _conv(sd, f"{prefix}.2"),
            "final": {
                "conv2": _conv(sd, f"{prefix}.4"),
                "conv3_kernel": c3["kernel"],
                "conv3_bias": c3["bias"],
            },
        }

    g = "get_kernel"
    params = {
        "get_kernel": {
            "conv1": basic(f"{g}.moduleConv1"),
            "conv2": basic(f"{g}.moduleConv2"),
            "conv3": basic(f"{g}.moduleConv3"),
            "conv4": basic(f"{g}.moduleConv4"),
            "conv5": basic(f"{g}.moduleConv5"),
            "deconv5": basic(f"{g}.moduleDeconv5"),
            "deconv4": basic(f"{g}.moduleDeconv4"),
            "deconv3": basic(f"{g}.moduleDeconv3"),
            "deconv2": basic(f"{g}.moduleDeconv2"),
            "upsample5": upsample(f"{g}.moduleUpsample5"),
            "upsample4": upsample(f"{g}.moduleUpsample4"),
            "upsample3": upsample(f"{g}.moduleUpsample3"),
            "upsample2": upsample(f"{g}.moduleUpsample2"),
            "weight1": subnet(f"{g}.moduleWeight1"),
            "alpha1": subnet(f"{g}.moduleAlpha1"),
            "beta1": subnet(f"{g}.moduleBeta1"),
            "weight2": subnet(f"{g}.moduleWeight2"),
            "alpha2": subnet(f"{g}.moduleAlpha2"),
            "beta2": subnet(f"{g}.moduleBeta2"),
            # occlusion keeps the plain NHWC layout (single output channel)
            "occlusion": {
                "conv0": _conv(sd, f"{g}.moduleOcclusion.0"),
                "conv1": _conv(sd, f"{g}.moduleOcclusion.2"),
                "conv2": _conv(sd, f"{g}.moduleOcclusion.4"),
                "conv3": _conv(sd, f"{g}.moduleOcclusion.7"),
            },
        }
    }
    return {"params": params}


def load_fusion_weights(path: str, uncertainty_maps: int = 3,
                        variant=None):
    """Load FusionNet weights from fusion_net*.pt OR an fmvfi msgpack file.
    `variant` shapes the template head (variant 2's final 1x1 conv emits 6
    channels instead of 3); None (the default) auto-detects it from the
    msgpack content — necessary because promotion places whatever variant
    won the campaign at the default checkpoint path."""
    if path.endswith(".msgpack"):
        import jax
        import jax.numpy as jnp

        from ..models.fusion_net import FusionNet
        from .checkpoint import load_msgpack

        if variant is None:
            from flax import serialization

            with open(path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            from ..models.fusion_net import infer_variant

            variant = infer_variant(raw)
        z = jnp.zeros((1, 64, 64, 3))
        template = FusionNet(uncertainty_maps=uncertainty_maps).init(
            jax.random.key(0), z, z, z, jnp.zeros((1, 64, 64, 6)),
            jnp.zeros((1, 64, 64, uncertainty_maps)),
            variant,
        )
        return load_msgpack(path, template)
    return fusion_net_from_torch(path)


def merge_matching_params(new, old):
    """Cross-architecture warm start: return `new` with every leaf whose
    shape matches replaced by the corresponding `old` leaf.  Trees must have
    the same structure (same module names); only reshaped heads stay fresh —
    e.g. a variant-2 (gated-blend) FusionNet warm-started from a variant-0
    msgpack keeps everything except the widened dec2 1x1 conv, whose fresh
    near-zero init makes the blend start at the component mean with a muted
    residual.  Returns (merged, fresh_leaf_paths)."""
    import jax

    fresh = []

    def _pick(path, n, o):
        if hasattr(o, "shape") and getattr(o, "shape", None) == n.shape:
            return o
        fresh.append(jax.tree_util.keystr(path))
        return n

    merged = jax.tree_util.tree_map_with_path(_pick, new, old)
    return merged, fresh


def load_adacof_weights(path: str, kernel_size: int = 5, dilation: int = 1):
    """Load AdaCoF weights from a torch ckpt.pth OR an fmvfi msgpack file."""
    if path.endswith(".msgpack"):
        import jax
        import jax.numpy as jnp

        from ..models.adacof import AdaCoFNet
        from .checkpoint import load_msgpack

        z = jnp.zeros((1, 64, 64, 3))
        template = AdaCoFNet(kernel_size, dilation).init(jax.random.key(0), z, z)
        return load_msgpack(path, template)
    return adacof_from_torch(path)
