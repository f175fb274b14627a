"""Diagnose the 2-px displacement PSNR hole (RESULTS.md round 2): sweep the
per-frame translation step and score AdaCoF / phase / fusion / frame-average
on exact-GT synthetic translation triplets.

Usage:  python tools/sweep_displacement.py [--size 256] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--size", type=int, default=256)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--adacof", default="checkpoints/adacof_synth_demo.msgpack")
parser.add_argument("--fusion", default="checkpoints/fusion_synth_demo.msgpack")
parser.add_argument(
    "--steps", default="0.5,1,1.5,2,2.5,3,3.5,4,6,8,12",
    help="comma list of per-frame px steps (target displacement from frame1)",
)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fmvfi_tpu.eval.metrics import psnr
from fmvfi_tpu.eval.synth import translation_triplet
from fmvfi_tpu.pipeline.interpolate import (
    FusionWeights,
    adacof_interpolate,
    fusion_interpolate,
    phase_interpolate,
)
from fmvfi_tpu.utils.convert import (
    load_adacof_weights,
    load_fusion_weights,
    phase_net_from_torch,
)

s = args.size
weights = FusionWeights(
    phase_net=phase_net_from_torch("/root/reference/src/phase_net/phase_net.pt"),
    adacof=load_adacof_weights(args.adacof),
    fusion_net=load_fusion_weights(args.fusion),
)

j_ada = jax.jit(lambda w, a, b: adacof_interpolate(w, a, b))
j_phase = jax.jit(lambda w, a, b: phase_interpolate(w, a, b))
j_fusion = jax.jit(lambda w, a, b: fusion_interpolate(w, a, b))

print(f"{'step(px)':>9} {'adacof':>8} {'phase':>8} {'fusion':>8} {'favg':>8}")
for step in [float(x) for x in args.steps.split(",")]:
    rows = []
    for seed in (0, 1):
        # triplet dx = TOTAL displacement; per-frame step = dx/2
        f1, mid, f2 = translation_triplet(s, s, dx=2 * step, dy=0.0, seed=seed)
        a, m, b = (jnp.asarray(x)[None] for x in (f1, mid, f2))
        rows.append(
            [
                float(psnr(j_ada(weights.adacof, a, b), m)),
                float(psnr(j_phase(weights.phase_net, a, b), m)),
                float(psnr(j_fusion(weights, a, b), m)),
                float(psnr((a + b) / 2, m)),
            ]
        )
    r = np.mean(rows, axis=0)
    print(f"{step:>9.1f} {r[0]:>8.2f} {r[1]:>8.2f} {r[2]:>8.2f} {r[3]:>8.2f}")
