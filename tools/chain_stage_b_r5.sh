#!/bin/bash
# Round-5 dominance campaign: finish the r4d gated-blend run through the
# photo-diet leg with the probe CALIBRATED TO THE CRITERION (VERDICT r4
# next-steps #2/#3):
#
#   - probes now carry per-regime delta vs the frozen best component and a
#     criterion score (mean shortfall below the 0.2 dB margin); checkpoint
#     selection maximizes criterion distance, not raw mean,
#   - a photo probe is in the 256^2 set (the r4 photo gap, -7.2 dB, was
#     invisible to the probe), and a 512^2 spot-probe on the binding
#     regimes (bright/step1/photo) runs every 2500 steps so legs are
#     steered at eval scale,
#   - evals land in results_r5 under the r5.1 protocol cache keys.
#
#   leg B: -> 18000 @ lr 3e-5  photo-mixed diet (photo_frac 0.25) + eval
#   leg C: -> 24000 @ lr 1e-5  polish, same diet + eval
#   leg D: -> 28000 @ lr 3e-6  polish + eval + promotion gate
#
# Continues runs/demo_stack_r4d (leg A done at step 12000, probe mean 33.96).
#
# Usage: nohup tools/chain_stage_b_r5.sh > runs/demo_stack_r4d/chain_r5.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4d
mkdir -p "$OUT" results_r5

ADA=runs/demo_stack/adacof_best.msgpack
COMMON=(--adacof_init "$ADA" --fusion_variant 2 --loss_psnr --distill 1.0
        --probe_every 500 --save_every 500 --spot_every 2500)

run_eval () {  # $1 = tag, extra args pass through
  tag=$1; shift
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
    --adacof "$ADA" --fusion "$OUT/fusion_best.msgpack" --fusion_variant 2 \
    --out results_r5 "$@" > "$OUT/eval_$tag.out" 2>&1 || true
  tail -25 "$OUT/eval_$tag.out" || true
}

echo "[r5] leg B: -> 18000 @ 3e-5 on the photo-mixed diet"
tools/supervise_stage.sh b 18000 "$OUT" --lr 3e-5 "${COMMON[@]}" --photo_frac 0.25
echo "[r5] widened eval after the photo leg"
run_eval legB

echo "[r5] leg C: -> 24000 @ 1e-5 polish (same diet)"
tools/supervise_stage.sh b 24000 "$OUT" --lr 1e-5 "${COMMON[@]}" --photo_frac 0.25
echo "[r5] widened eval after leg C"
run_eval legC

echo "[r5] leg D: -> 28000 @ 3e-6 polish"
tools/supervise_stage.sh b 28000 "$OUT" --lr 3e-6 "${COMMON[@]}" --photo_frac 0.25
echo "[r5] widened eval after leg D (+promotion if the criterion holds)"
run_eval legD --promote

echo "[r5] all done"
