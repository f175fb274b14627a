"""Evaluate a trained demo stack (stage-A AdaCoF + stage-B FusionNet) on the
six-regime synthetic benchmark and decide promotion.

Dominance criterion (VERDICT r2 next-step #1): the fused output must score
>= max(phase, adacof) - 0.2 dB on >= 6/8 sets AND have the strictly best
mean PSNR.  --promote copies the weights into checkpoints/ only when the
criterion holds.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/eval_demo_stack.py --adacof runs/demo_stack/adacof_best.msgpack \
        --fusion runs/demo_stack/fusion_best.msgpack --out results_r3
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--adacof", required=True, help="AdaCoF weights (msgpack)")
parser.add_argument("--fusion", required=True, help="FusionNet weights (msgpack)")
parser.add_argument("--out", default="results_r3")
parser.add_argument("--dim", type=int, default=512)
parser.add_argument("--max_num", type=int, default=2)
parser.add_argument("--margin", type=float, default=0.2)
parser.add_argument("--promote", action="store_true",
                    help="copy into checkpoints/ if the criterion holds")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from fmvfi_tpu.eval.evaluate import evaluate_suite
from fmvfi_tpu.pipeline.interpolate import FusionWeights
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

summary = evaluate_suite(
    weights,
    args.out,
    methods=("fusion", "phase", "adacof"),
    dim=args.dim,
    max_num=args.max_num,
    overwrite=True,
)

rows, wins, means = [], 0, {"fusion": [], "phase": [], "adacof": []}
for name, by_method in summary.items():
    psnr = {m: by_method[m]["psnr"] for m in ("fusion", "phase", "adacof")}
    best_component = max(psnr["phase"], psnr["adacof"])
    ok = psnr["fusion"] >= best_component - args.margin
    wins += ok
    for m, v in psnr.items():
        means[m].append(v)
    rows.append((name, psnr, ok))

print(f"\n{'set':<16} {'fusion':>8} {'phase':>8} {'adacof':>8}  dominates?")
for name, psnr, ok in rows:
    print(f"{name:<16} {psnr['fusion']:>8.2f} {psnr['phase']:>8.2f} "
          f"{psnr['adacof']:>8.2f}  {'YES' if ok else 'no'}")
mean = {m: float(np.mean(v)) for m, v in means.items()}
strictly_best = mean["fusion"] > max(mean["phase"], mean["adacof"])
print(f"{'MEAN':<16} {mean['fusion']:>8.2f} {mean['phase']:>8.2f} "
      f"{mean['adacof']:>8.2f}  best={'fusion' if strictly_best else 'component'}")
# criterion stated for the 8-set suite (>= 6/8 within margin), scaled to n
n = len(rows)
passed = (wins >= (6 * n + 7) // 8) and strictly_best
print(f"\ndominance: {wins}/{n} sets within {args.margin} dB of the best "
      f"component; mean strictly best: {strictly_best} -> "
      f"{'PASS' if passed else 'FAIL'}")

with open(os.path.join(args.out, "dominance.json"), "w") as f:
    json.dump(
        {
            "sets": {name: psnr for name, psnr, _ in rows},
            "mean": mean,
            "wins": wins,
            "n_sets": n,
            "margin_db": args.margin,
            "pass": bool(passed),
            "adacof": args.adacof,
            "fusion": args.fusion,
        },
        f,
        indent=1,
    )

if args.promote:
    if not passed:
        print("NOT promoting (criterion failed)")
        sys.exit(1)
    shutil.copy(args.adacof, "checkpoints/adacof_synth_demo.msgpack")
    shutil.copy(args.fusion, "checkpoints/fusion_synth_demo.msgpack")
    print("promoted to checkpoints/{adacof,fusion}_synth_demo.msgpack")
