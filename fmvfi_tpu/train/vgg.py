"""VGG16 perceptual loss (conv4_3 feature MSE).

Re-design of /root/reference/src/adacof/losses/vgg.py:7-22, which relies on
torchvision's *downloaded* pretrained VGG16.  This environment has no network
egress, so the loss is constructed from a user-supplied torchvision VGG16
checkpoint (`vgg16-*.pth`); without one, construction raises with a clear
message (the spec-string loss factory surfaces the same).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv layers up to conv4_3 (torchvision features indices 0..21)
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512]
# full vgg16 conv trunk through conv5_3 (torchvision features 0..29)
_CFG_FULL = _CFG + ["M", 512, 512, 512]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

# relu indices (in conv counting) after which LPIPS taps features:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_TAPS = (1, 3, 6, 9, 12)


class VGGFeatures(nn.Module):
    """VGG16 trunk (NHWC).  Default: conv4_3+ReLU features (the perceptual
    loss of losses/vgg.py:16-22).  With taps=LPIPS_TAPS returns the 5
    standard LPIPS feature maps (after each block's last ReLU)."""

    full: bool = False
    taps: tuple = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = (x - _MEAN) / _STD
        i = 0
        tapped = []
        for v in _CFG_FULL if self.full else _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding="SAME", name=f"conv{i}")(x))
                i += 1
                if self.taps and (i - 1) in self.taps:
                    tapped.append(x)
        return tapped if self.taps else x


# torchvision features indices of the conv layers (full vgg16)
_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def vgg16_params_from_torch(path: str, full: bool = False) -> Dict[str, Any]:
    """Convert a torchvision vgg16 state dict (features.*.weight/bias) into
    VGGFeatures params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    conv_idx = _TORCH_CONV_IDX if full else _TORCH_CONV_IDX[:10]
    params = {}
    for i, li in enumerate(conv_idx):
        w = sd[f"features.{li}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{li}.bias"].numpy()
        params[f"conv{i}"] = {"kernel": w, "bias": b}
    return {"params": params}


class VGGLoss:
    """loss = MSE(vgg(sr), vgg(hr)) on conv4_3 features (vgg.py:16-22)."""

    def __init__(self, checkpoint_path: str):
        try:
            self.variables = vgg16_params_from_torch(checkpoint_path)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                "VGG perceptual loss needs a torchvision vgg16 checkpoint "
                "(no network egress to download one); pass its path"
            ) from e
        self.model = VGGFeatures()

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
        fs = self.model.apply(self.variables, sr)
        fh = jax.lax.stop_gradient(self.model.apply(self.variables, hr))
        return jnp.mean((fs - fh) ** 2)

