"""Uncertainty-map study tool.

Mirror of /root/reference/src/evaluation/uncertainty_maps.py:63-272, which
regenerates the three fusion uncertainty maps as grayscale PNGs for analysis:
AdaCoF flow-variance (:93-109), phase high-frequency difference (:218-241),
and the median-filtered artifact map (:255-272).  Here they come straight out
of the jitted pipeline (`fusion_interpolate(..., return_parts=True)`)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import jax.numpy as jnp

from ..pipeline.interpolate import FusionWeights, fusion_interpolate


def generate_uncertainty_maps(
    weights: FusionWeights,
    frame1: np.ndarray,
    frame2: np.ndarray,
    out_dir: str | None = None,
    prefix: str = "maps",
) -> Dict[str, np.ndarray]:
    """Returns {'ada_uncertainty', 'phase_uncertainty', 'flow_variance',
    'phase_pred', 'adacof_pred', 'baseline'} and optionally writes PNGs."""
    f1 = jnp.asarray(frame1[None] if frame1.ndim == 3 else frame1)
    f2 = jnp.asarray(frame2[None] if frame2.ndim == 3 else frame2)
    final, parts = fusion_interpolate(weights, f1, f2, return_parts=True)
    maps = np.asarray(parts["maps"])[0]  # (H, W, 3): [ada, phase, flow_var]
    out = {
        "ada_uncertainty": maps[..., 0],
        "phase_uncertainty": maps[..., 1],
        "flow_variance": maps[..., 2],
        "phase_pred": np.asarray(parts["phase"])[0],
        "adacof_pred": np.asarray(parts["adacof"])[0],
        "baseline": np.asarray(parts["baseline"])[0],
        "fused": np.asarray(final)[0],
    }
    if out_dir:
        import cv2

        os.makedirs(out_dir, exist_ok=True)
        for name, img in out.items():
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            if arr.ndim == 3:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(out_dir, f"{prefix}_{name}.png"), arr)
    return out
