"""Result visualization: prediction/diff panels and per-set metric bars.

Mirrors /root/reference/src/evaluation/visualizations.py (3x3 panels of
target / per-method predictions / jet abs-diff maps at :15-112; grouped
metric bar charts at :308-386; panel video stitching at :199-218)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def prediction_panel(
    target: np.ndarray,
    predictions: Dict[str, np.ndarray],
    out_path: Optional[str] = None,
):
    """Grid figure: row 1 target + predictions, row 2 jet |diff| maps."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(predictions)
    fig, axes = plt.subplots(2, n + 1, figsize=(3 * (n + 1), 6))
    axes = np.atleast_2d(axes)
    axes[0, 0].imshow(np.clip(target, 0, 1))
    axes[0, 0].set_title("target")
    axes[1, 0].axis("off")
    for j, (name, pred) in enumerate(predictions.items(), start=1):
        axes[0, j].imshow(np.clip(pred, 0, 1))
        axes[0, j].set_title(name)
        diff = np.abs(pred - target).mean(-1)
        im = axes[1, j].imshow(diff, cmap="jet", vmin=0, vmax=0.25)
        axes[1, j].set_title(f"|diff| {name}")
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
        return out_path
    return fig


def metric_bars(
    summary: Dict[str, Dict[str, Dict[str, float]]],
    metrics: Sequence[str] = ("psnr", "ssim"),
    out_path: Optional[str] = None,
):
    """Grouped bars: one subplot per metric, groups = test sets, bars =
    methods (draw_measurements equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sets = list(summary)
    methods = list(next(iter(summary.values())))
    fig, axes = plt.subplots(1, len(metrics), figsize=(6 * len(metrics), 4))
    if len(metrics) == 1:
        axes = [axes]
    x = np.arange(len(sets))
    width = 0.8 / max(len(methods), 1)
    for ax, metric in zip(axes, metrics):
        for mi, method in enumerate(methods):
            vals = [summary[s][method][metric] for s in sets]
            ax.bar(x + mi * width, vals, width, label=method)
        ax.set_xticks(x + width * (len(methods) - 1) / 2)
        ax.set_xticklabels(sets, rotation=30, ha="right")
        ax.set_title(metric)
        ax.legend()
    fig.tight_layout()
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
        return out_path
    return fig


def panels_to_video(panel_paths: Sequence[str], out_path: str, fps: int = 2) -> str:
    """Stitch saved panel PNGs into an .avi (images_to_video equivalent)."""
    import cv2

    first = cv2.imread(panel_paths[0])
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for p in panel_paths:
        img = cv2.imread(p)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        vw.write(img)
    vw.release()
    return out_path
