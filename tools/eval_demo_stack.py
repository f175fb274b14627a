"""Evaluate a trained demo stack (stage-A AdaCoF + stage-B FusionNet) on the
widened multi-seed synthetic benchmark and decide promotion.

Dominance criterion (VERDICT r2 next-step #1, widened r4 per VERDICT r3 #4):
the fused output must score >= max(phase, adacof) - 0.2 dB on >= 6/8 of the
regimes (scaled to the regime count) AND have the strictly best mean PSNR.
Each regime is scored on `--seeds` independent texture/motion draws of
`--n_frames`-frame sequences (default 3 x 10 triplets = 30 triplets per
regime; the r3 protocol's 2 triplets/regime made sub-dB margins noise) and
the photo (natural-statistics) set sits in the headline table.  --promote
copies the weights into checkpoints/ only when the criterion holds.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/eval_demo_stack.py --adacof runs/demo_stack/adacof_best.msgpack \
        --fusion runs/demo_stack_r4/fusion_best.msgpack --out results_r4
"""

import argparse
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--adacof", required=True, help="AdaCoF weights (msgpack)")
parser.add_argument("--fusion", required=True, help="FusionNet weights (msgpack)")
parser.add_argument("--out", default="results_r4")
parser.add_argument("--dim", type=int, default=512)
parser.add_argument("--n_frames", type=int, default=12,
                    help="frames per sequence (n_frames-2 triplets each)")
parser.add_argument("--seeds", type=int, default=3,
                    help="independent draws per regime")
parser.add_argument("--max_num", type=int, default=10,
                    help="triplets scored per (regime, seed)")
parser.add_argument("--margin", type=float, default=0.2)
parser.add_argument("--fusion_variant", type=int, default=0, choices=[0, 1, 2],
                    help="FusionNet head variant the weights were trained "
                    "with (2 = gated-blend head)")
parser.add_argument("--no_photo", action="store_true",
                    help="drop the natural-statistics photo set from the table")
parser.add_argument("--promote", action="store_true",
                    help="copy into checkpoints/ if the criterion holds")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from fmvfi_tpu.eval.evaluate import evaluate_suite, synthetic_sets
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

sets = synthetic_sets(
    args.dim,
    n_frames=args.n_frames,
    include_photo=not args.no_photo,
    seeds=tuple(range(args.seeds)),
)

summary = evaluate_suite(
    weights,
    args.out,
    sets=sets,
    methods=("fusion", "phase", "adacof"),
    dim=args.dim,
    max_num=args.max_num,
    variant=args.fusion_variant,
    # overwrite=False: the per-(set, method) caches are keyed on a FULL
    # digest of exactly the weights that method consumes, the eval-protocol
    # code version, and cache_token (every set-generation parameter not in
    # the set name — advisor r4: frame content depends on n_frames), so a
    # campaign eval recomputes only the new FusionNet's cells and reuses
    # the frozen adacof/phase cells (~2/3 of every widened sweep's chip time)
    cache_token=f"nf{args.n_frames}",
    overwrite=False,
    visualize=False,  # 27+ sets; panels are a separate, single-seed pass
)

METHODS = ("fusion", "phase", "adacof")

# group <regime>@s<k> keys (bare names if seeds == 1) by regime
by_regime = {}
for key, by_method in summary.items():
    regime = re.sub(r"@s\d+$", "", key)
    by_regime.setdefault(regime, []).append(
        {m: by_method[m]["psnr"] for m in METHODS}
    )

rows, wins, means = [], 0, {m: [] for m in METHODS}
for regime, draws in by_regime.items():
    stat = {
        m: (
            float(np.mean([d[m] for d in draws])),
            float(np.std([d[m] for d in draws])),
        )
        for m in METHODS
    }
    psnr = {m: stat[m][0] for m in METHODS}
    best_component = max(psnr["phase"], psnr["adacof"])
    ok = psnr["fusion"] >= best_component - args.margin
    wins += ok
    for m in METHODS:
        means[m].append(psnr[m])
    rows.append((regime, stat, ok))

print(f"\n{'set':<16} {'fusion':>14} {'phase':>14} {'adacof':>14}  dominates?")
for regime, stat, ok in rows:
    cells = "".join(
        f" {stat[m][0]:>8.2f}±{stat[m][1]:<4.2f}" for m in METHODS
    )
    print(f"{regime:<16}{cells}  {'YES' if ok else 'no'}")
mean = {m: float(np.mean(v)) for m, v in means.items()}
strictly_best = mean["fusion"] > max(mean["phase"], mean["adacof"])
print(f"{'MEAN':<16} {mean['fusion']:>13.2f} {mean['phase']:>14.2f} "
      f"{mean['adacof']:>14.2f}  best={'fusion' if strictly_best else 'component'}")
# criterion stated for the 8-set suite (>= 6/8 within margin), scaled to n
n = len(rows)
passed = (wins >= (6 * n + 7) // 8) and strictly_best
print(f"\ndominance: {wins}/{n} regimes within {args.margin} dB of the best "
      f"component (mean over {args.seeds} seeds x {args.max_num} triplets); "
      f"mean strictly best: {strictly_best} -> "
      f"{'PASS' if passed else 'FAIL'}")

with open(os.path.join(args.out, "dominance.json"), "w") as f:
    json.dump(
        {
            "sets": {
                regime: {
                    m: {"mean": stat[m][0], "std": stat[m][1]} for m in METHODS
                }
                for regime, stat, _ in rows
            },
            "mean": mean,
            "wins": wins,
            "n_sets": n,
            "seeds": args.seeds,
            "triplets_per_cell": args.max_num * args.seeds,
            "margin_db": args.margin,
            "pass": bool(passed),
            "adacof": args.adacof,
            "fusion": args.fusion,
            "fusion_variant": args.fusion_variant,
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
