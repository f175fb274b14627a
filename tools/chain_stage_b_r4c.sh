#!/bin/bash
# Round-4 contingency chain ("r4c"): warm-start stage B from the ROUND-3 best
# FusionNet (probe mean 33.53) under the FIXED gated-distill + log-MSE
# objective.  Rationale: r3's plateau was reached with the pre-fix objective
# (commit 2b531bf) whose distill gate compared L1 while optimizing log-MSE —
# on the binding tracking regimes (step1/brightness, where fusion must copy a
# near-perfect AdaCoF) that bug actively pulls samples that already beat the
# teacher in PSNR back toward it, which is exactly a plateau mechanism.  The
# from-scratch r4b run (leg 3 probe trend) did not catch the r3 trajectory,
# so the strongest available start + the fixed objective is the best
# remaining shot at the dominance criterion this round.
#
#   leg A: -> 8000  @ lr 1e-5  (gated-distill + log-MSE, fixed gate)
#          + widened 512^2 eval
#   leg B: -> 12000 @ lr 1e-5  photo-mixed diet (photo_frac 0.25)
#          + widened eval
#   leg C: -> 15000 @ lr 3e-6  polish
#          + widened eval + promotion
#
# Usage: nohup tools/chain_stage_b_r4c.sh > runs/demo_stack_r4c/chain_r4c.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4c
R3=runs/demo_stack
mkdir -p "$OUT"

ADA="$R3/adacof_best.msgpack"
COMMON=(--adacof_init "$ADA" --loss_psnr --distill 1.0 --probe_every 500 --save_every 500)

run_eval () {  # $1 = tag
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
    --adacof "$ADA" --fusion "$OUT/fusion_best.msgpack" \
    --out results_r4 --promote > "$OUT/eval_$1.out" 2>&1 || true
  tail -20 "$OUT/eval_$1.out" || true
}

echo "[r4c] leg A: -> 8000 @ 1e-5 (warm start from r3-best fusion, fixed objective)"
tools/supervise_stage.sh b 8000 "$OUT" --lr 1e-5 \
  --fusion_init "$R3/fusion_best.msgpack" "${COMMON[@]}"
echo "[r4c] widened 512^2 dominance eval after leg A"
run_eval legA

echo "[r4c] leg B: -> 12000 @ 1e-5 on the photo-mixed diet"
tools/supervise_stage.sh b 12000 "$OUT" --lr 1e-5 "${COMMON[@]}" --photo_frac 0.25
echo "[r4c] widened eval after the photo leg"
run_eval legB

echo "[r4c] leg C: -> 15000 @ 3e-6 polish"
tools/supervise_stage.sh b 15000 "$OUT" --lr 3e-6 "${COMMON[@]}"
echo "[r4c] widened eval after leg C"
run_eval legC

echo "[r4c] all done"
