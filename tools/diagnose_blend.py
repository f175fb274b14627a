"""Diagnose the variant-2 gated-blend plateau (VERDICT r4 weak #5 / next #8).

For each (regime, dim) cell this prints, from ONE forward of the full fusion
pipeline (pipeline/interpolate.py::fusion_interpolate):

  - PSNR of fusion / adacof / phase / baseline composite vs ground truth,
  - the criterion quantity: delta = fusion - max(adacof, phase),
  - gate statistics from the dec2 head (captured intermediates): mean softmax
    weight per branch, fraction of pixels whose max weight exceeds 0.9/0.99
    (is the logit saturating?), mean |residual| after confidence muting,
  - two counterfactuals that split "gate picks wrong" from "gate too soft":
      blend_only : the convex combination WITHOUT the residual term
      hard_sel   : argmax-hardened selection (each pixel = its top branch)
    and the per-pixel oracle over {base, adacof, phase} (upper bound).

If hard_sel ~= component PSNR but fusion lags, the logits are too soft
(sharpening/temperature is the fix); if hard_sel also lags, the gate is
selecting the wrong branch (objective/feature fix); if the 256 cell is fine
and 512 is not, the gap is scale-induced (train-crop vs eval-scale).

Run (CPU is fine, it just takes minutes):
    env PYTHONPATH=/root/repo python tools/diagnose_blend.py \
        --adacof runs/demo_stack/adacof_best.msgpack \
        --fusion runs/demo_stack_r4d/fusion_best.msgpack --cpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--adacof", required=True)
parser.add_argument("--fusion", required=True)
parser.add_argument("--dims", type=int, nargs="+", default=[256, 512])
parser.add_argument("--out", default="")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fmvfi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from fmvfi_tpu.eval import synth
from fmvfi_tpu.models.fusion_net import FusionNet
from fmvfi_tpu.ops.color import rgb_to_lab
from fmvfi_tpu.pipeline.interpolate import FusionWeights, fusion_interpolate
from fmvfi_tpu.utils.convert import (
    load_adacof_weights,
    load_fusion_weights,
    phase_net_from_torch,
)

weights = FusionWeights(
    phase_net=phase_net_from_torch("/root/reference/src/phase_net/phase_net.pt"),
    adacof=load_adacof_weights(args.adacof),
    fusion_net=load_fusion_weights(args.fusion),
)


def triplets(s):
    out = {}
    v = synth.brightness_video(3, s, s, step=2.0, seed=9107)
    out["bright"] = v
    v = synth.translation_video(3, s, s, step=1.0, seed=9108)
    out["step1"] = v
    v = synth.photo_video(3, s, s, seed=9111)
    out["photo"] = v
    v = synth.translation_triplet(s, s, dx=4.0, dy=0.0, seed=9102)
    out["translation2"] = np.stack(v)
    return out


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return round(-10 * np.log10(max(mse, 1e-12)), 2)


@jax.jit
def forward(f1, f2):
    final, parts = fusion_interpolate(
        weights, f1, f2, return_parts=True, variant=2
    )
    return final, parts


report = {}
for dim in args.dims:
    for name, v in triplets(dim).items():
        f1 = jnp.asarray(v[0])[None]
        mid = v[1]
        f2 = jnp.asarray(v[2])[None]
        final, parts = forward(f1, f2)
        base = parts["baseline"]
        ada = parts["adacof"]
        ph = parts["phase"]
        other = jnp.concatenate([rgb_to_lab(f1), rgb_to_lab(f2)], axis=-1)
        maps = parts["maps"]
        model = FusionNet(uncertainty_maps=3)
        _, inter = model.apply(
            weights.fusion_net, base, ada, ph, other, maps, 2,
            capture_intermediates=True,
        )
        y = np.asarray(inter["intermediates"]["dec2"]["__call__"][0][0])
        wgt = np.asarray(jax.nn.softmax(jnp.asarray(y[..., :3]), axis=-1))
        maxw = wgt.max(-1)
        res = np.tanh(y[..., 3:]) * (1.0 - maxw[..., None])
        cands = np.stack(
            [np.asarray(base[0]), np.asarray(ada[0]), np.asarray(ph[0])], 0
        )
        blend_only = np.clip((wgt.transpose(2, 0, 1)[..., None] * cands).sum(0), 0, 1)
        hard = np.clip(
            np.take_along_axis(
                cands, wgt.argmax(-1)[None, ..., None], axis=0
            )[0], 0, 1,
        )
        err = (cands - np.asarray(mid)[None]) ** 2
        oracle_sel = err.mean(-1).argmin(0)
        oracle = np.take_along_axis(
            cands, oracle_sel[None, ..., None], axis=0
        )[0]
        cell = {
            "psnr": {
                "fusion": psnr(final[0], mid),
                "adacof": psnr(ada[0], mid),
                "phase": psnr(ph[0], mid),
                "base": psnr(base[0], mid),
                "blend_only": psnr(blend_only, mid),
                "hard_sel": psnr(hard, mid),
                "oracle_sel": psnr(oracle, mid),
            },
            "gate": {
                "mean_w": [round(float(x), 4) for x in wgt.mean((0, 1))],
                "frac_maxw_gt_0.9": round(float((maxw > 0.9).mean()), 4),
                "frac_maxw_gt_0.99": round(float((maxw > 0.99).mean()), 4),
                "mean_abs_res": round(float(np.abs(res).mean()), 5),
            },
        }
        best = max(cell["psnr"]["adacof"], cell["psnr"]["phase"])
        cell["delta_vs_best"] = round(cell["psnr"]["fusion"] - best, 2)
        report[f"{name}@{dim}"] = cell
        print(f"{name}@{dim}: {json.dumps(cell)}", flush=True)

if args.out:
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
