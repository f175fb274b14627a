#!/bin/bash
# Round-5 brightness-recovery legs (replaces the r5 chain's C/D): the leg-B
# eval PASSED the dominance criterion (8/9 + strictly-best mean,
# results_r5/dominance.json) with brightness the one regime outside margin
# (-6.5 dB).  Diagnosis (RESULTS.md): the gate collapses on MID-ramp
# absolute-luminance states (gain ~0.65-0.8) that the 3-frame training
# ramps never reached; the v3 pool adds a random absolute starting gain
# (0.55-1.0) and bright_mid probes put the failing cell under selection
# pressure at both scales.
#
#   leg C2: -> 25000 @ lr 3e-5  v3 diet (the lr that taught photo) + eval
#   leg D2: -> 28000 @ lr 1e-5  polish + eval
#   leg E2: -> 30000 @ lr 3e-6  polish + eval + promotion gate
#
# Usage: nohup tools/chain_stage_b_r5b.sh > runs/demo_stack_r4d/chain_r5b.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4d
mkdir -p "$OUT" results_r5

ADA=runs/demo_stack/adacof_best.msgpack
COMMON=(--adacof_init "$ADA" --fusion_variant 2 --loss_psnr --distill 1.0
        --probe_every 500 --save_every 500 --spot_every 2500
        --photo_frac 0.25)

run_eval () {  # $1 = tag, extra args pass through
  tag=$1; shift
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
    --adacof "$ADA" --fusion "$OUT/fusion_best.msgpack" --fusion_variant 2 \
    --out results_r5 "$@" > "$OUT/eval_$tag.out" 2>&1 || true
  tail -16 "$OUT/eval_$tag.out" || true
}

echo "[r5b] leg C2: -> 25000 @ 3e-5 on the v3 (absolute-gain) diet"
tools/supervise_stage.sh b 25000 "$OUT" --lr 3e-5 "${COMMON[@]}"
echo "[r5b] widened eval after leg C2"
run_eval legC2

echo "[r5b] leg D2: -> 28000 @ 1e-5 polish"
tools/supervise_stage.sh b 28000 "$OUT" --lr 1e-5 "${COMMON[@]}"
echo "[r5b] widened eval after leg D2"
run_eval legD2

echo "[r5b] leg E2: -> 30000 @ 3e-6 polish"
tools/supervise_stage.sh b 30000 "$OUT" --lr 3e-6 "${COMMON[@]}"
echo "[r5b] widened eval after leg E2 (+promotion if the criterion holds)"
run_eval legE2 --promote

echo "[r5b] all done"
