"""Training losses.

- PhaseNet loss (L1 image + circular phase distance), re-deriving
  /root/reference/src/train/loss.py:5-26.
- Charbonnier and the spec-string loss factory of
  /root/reference/src/adacof/losses/__init__.py:6-72 ('1*Charb+0.01*g_Spatial
  +0.005*g_Occlusion'): weighted terms parsed once, evaluated as pure jnp.
  VGG/GAN terms require pretrained torchvision weights that cannot be fetched
  in this offline environment; requesting them raises with a clear message.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from ..ops.pyramid import Decomp


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def charbonnier(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.001) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt((a - b) ** 2 + eps**2))


def circular_phase_loss(pred: Decomp, target: Decomp) -> jnp.ndarray:
    """sum over levels and orientation bands of mean |atan2(sin d, cos d)|
    (loss.py:10-17)."""
    total = 0.0
    for p, t in zip(pred.phase, target.phase):
        d = t - p
        delta = jnp.arctan2(jnp.sin(d), jnp.cos(d))
        # per-orientation mean, summed over the nbands axis (axis 1)
        total = total + jnp.sum(jnp.mean(jnp.abs(delta), axis=(0, 2, 3)))
    return total


def phase_net_loss(
    pred_img: jnp.ndarray,
    target_img: jnp.ndarray,
    pred_vals: Decomp,
    target_vals: Decomp,
    weighting_factor: float = 0.005,
):
    """total = L1(img) + w * circular phase loss (loss.py:20-22).
    Returns (total, dict of unweighted parts)."""
    l_1 = l1(pred_img, target_img)
    p_l = circular_phase_loss(pred_vals, target_vals)
    total = l_1 + weighting_factor * p_l
    return total, {"l1": l_1, "phase": p_l}


class LossSpec(NamedTuple):
    terms: Tuple[Tuple[float, str], ...]

    def __call__(self, values: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        total = 0.0
        for w, name in self.terms:
            if name not in values:
                raise KeyError(f"loss term '{name}' not provided (have {list(values)})")
            total = total + w * values[name]
        return total


_SIMPLE = {"Charb", "L1", "MSE", "g_Spatial", "g_Occlusion"}
GAN_TYPES = {"GAN", "WGAN", "WGAN_GP", "FI_GAN", "T_WGAN_GP"}


def gan_terms(spec: LossSpec) -> List[Tuple[float, str]]:
    """The adversarial terms of a spec (reference matches by substring 'GAN',
    losses/__init__.py:25)."""
    return [(w, n) for w, n in spec.terms if n in GAN_TYPES]


def has_term(spec: LossSpec, name: str) -> bool:
    return any(n == name for _, n in spec.terms)


def parse_loss_spec(spec: str) -> LossSpec:
    """'1*Charb+0.01*g_Spatial+0.005*g_Occlusion' -> LossSpec.
    (loss factory grammar of losses/__init__.py:14-42; VGG and the GAN family
    parse here and are wired up by make_adacof_trainer — VGG needs a
    user-supplied torchvision vgg16 checkpoint, see train/vgg.py)"""
    terms: List[Tuple[float, str]] = []
    for part in spec.split("+"):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"([0-9.eE+-]+)\s*\*\s*(\w+)", part)
        if not m:
            raise ValueError(f"bad loss term '{part}' (want 'weight*Name')")
        w, name = float(m.group(1)), m.group(2)
        if name not in _SIMPLE and name != "VGG" and name not in GAN_TYPES:
            raise ValueError(
                f"unknown loss '{name}' (supported: "
                f"{sorted(_SIMPLE) + ['VGG'] + sorted(GAN_TYPES)})"
            )
        terms.append((w, name))
    return LossSpec(tuple(terms))
