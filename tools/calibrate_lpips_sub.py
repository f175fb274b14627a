"""Document how `lpips_sub` tracks perceptual quality (VERDICT r4 #6).

The reference's headline perceptual metric is learned-weight LPIPS
(piq.LPIPS, /root/reference/src/evaluation/evaluate_image.py:21-28): VGG16
ImageNet features + learned linear calibration weights.  NEITHER is
obtainable in this environment — zero egress, no torchvision, no cached
VGG/LPIPS checkpoint anywhere on the image (verified: `find / -name '*vgg*'`
turns up only keras source stubs) — so the suite ships `lpips_sub`, a
multi-scale gradient-distance surrogate (eval/metrics.py::gradient_distance),
plus an optional real-VGG path (`make_vgg_lpips`) that activates whenever a
vgg16 checkpoint IS available.

This tool commits the documented calibration the verdict asked for in that
(environmentally-forced) fallback case: across every cached per-triplet
result in an eval out_dir it reports

  - Spearman rank correlation of lpips_sub vs (1 - SSIM) and vs -PSNR over
    all triplets (does the surrogate order DISTORTION SEVERITY like the
    established perceptual/fidelity metrics do?),
  - per-set METHOD-ORDERING agreement: for each benchmark set, does
    lpips_sub rank {fusion, phase, adacof} the same way SSIM does?  (This is
    the decision the suite actually uses a perceptual metric for.)

Run: python tools/calibrate_lpips_sub.py --out_dir results_r4 \
         --json results_r5/lpips_calibration.json
"""

import argparse
import glob
import itertools
import json
import os
import re
import sys

import numpy as np
from scipy import stats

parser = argparse.ArgumentParser()
parser.add_argument("--out_dir", default="results_r4")
parser.add_argument("--json", default="")
args = parser.parse_args()

pat = re.compile(r"result_(?P<set>.+)_(?P<method>fusion|phase|adacof|baseline)"
                 r"_(?P<digest>[0-9a-f]+)\.npz$")

cells = {}
for path in sorted(glob.glob(os.path.join(args.out_dir, "result_*.npz"))):
    m = pat.search(os.path.basename(path))
    if not m:
        continue
    d = np.load(path)
    if "lpips_sub" not in d.files:
        continue
    cells.setdefault(m["set"], {})[m["method"]] = {
        k: np.asarray(d[k]) for k in ("lpips_sub", "ssim", "psnr")
    }

if not cells:
    sys.exit(f"no result_*.npz with lpips_sub under {args.out_dir}")

lp, dssim, npsnr = [], [], []
for set_methods in cells.values():
    for arrs in set_methods.values():
        lp.append(arrs["lpips_sub"])
        dssim.append(1.0 - arrs["ssim"])
        npsnr.append(-arrs["psnr"])
lp, dssim, npsnr = map(np.concatenate, (lp, dssim, npsnr))

rho_ssim = stats.spearmanr(lp, dssim)
rho_psnr = stats.spearmanr(lp, npsnr)

# method-ordering agreement per set: over every method pair, does lpips_sub
# agree with SSIM about which method is perceptually better on that set?
agree = total = 0
for name, set_methods in cells.items():
    methods = sorted(set_methods)
    for a, b in itertools.combinations(methods, 2):
        s = np.sign(set_methods[a]["ssim"].mean() - set_methods[b]["ssim"].mean())
        l = np.sign(set_methods[b]["lpips_sub"].mean() - set_methods[a]["lpips_sub"].mean())
        if s == 0 or l == 0:
            continue
        agree += s == l
        total += 1

report = {
    "out_dir": args.out_dir,
    "n_sets": len(cells),
    "n_triplet_scores": int(lp.size),
    "spearman_lpips_sub_vs_1minus_ssim": round(float(rho_ssim.statistic), 4),
    "spearman_lpips_sub_vs_neg_psnr": round(float(rho_psnr.statistic), 4),
    "p_ssim": float(rho_ssim.pvalue),
    "p_psnr": float(rho_psnr.pvalue),
    "method_pair_ordering_agreement_with_ssim": (
        round(agree / total, 4) if total else None
    ),
    "n_method_pairs": total,
    "note": (
        "lpips_sub is the offline surrogate for piq.LPIPS "
        "(evaluate_image.py:21-28); real VGG16+linear weights are not "
        "obtainable in this zero-egress image. make_vgg_lpips provides the "
        "real metric whenever a vgg16 checkpoint is present."
    ),
}
print(json.dumps(report, indent=1))
if args.json:
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.json}")
