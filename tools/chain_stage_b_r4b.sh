#!/bin/bash
# Round-4 stage-B campaign, RESUMED after the 2026-08-20 VM restart killed
# the original chain at absolute step 13400 (mid leg 2).  The full TrainState
# was not committed (only fusion_best at the leg-1/12k boundary was), so this
# chain warm-starts from runs/demo_stack_r4/fusion_best.msgpack with a fresh
# optimizer and a step counter restarting at 0.  Mapping to the original
# absolute schedule (chain_stage_b_r4.sh):
#
#   leg 2r:     -> 10000 @ lr 3e-5   (original leg 2, abs ~22k)
#   leg 3:      -> 20000 @ lr 1e-5   (abs ~32k) + widened eval
#   leg 4:      -> 28000 @ lr 3e-6   (abs ~40k) + widened eval
#   leg 5:      -> 32000 @ lr 1e-5 photo-mixed diet (abs ~44k) + eval
#
# After leg 2r starts, state_b_latest.msgpack exists again and supervised
# restarts resume exactly; tools/autocommit_campaign.sh commits the state
# periodically so another VM restart loses at most one commit interval.
#
# Usage: nohup tools/chain_stage_b_r4b.sh > runs/demo_stack_r4/chain_r4b.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4
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

echo "[r4b] leg 2r: -> 10000 @ 3e-5 (warm start from fusion_best @ abs 12k)"
tools/supervise_stage.sh b 10000 "$OUT" --lr 3e-5 \
  --fusion_init "$OUT/fusion_best.msgpack" "${COMMON[@]}"

echo "[r4b] leg 3: -> 20000 @ 1e-5"
tools/supervise_stage.sh b 20000 "$OUT" --lr 1e-5 "${COMMON[@]}"
echo "[r4b] widened 512^2 dominance eval after leg 3"
run_eval leg3

echo "[r4b] leg 4: -> 28000 @ 3e-6"
tools/supervise_stage.sh b 28000 "$OUT" --lr 3e-6 "${COMMON[@]}"
echo "[r4b] widened 512^2 dominance eval after leg 4"
run_eval leg4

echo "[r4b] leg 5: -> 32000 @ 1e-5 on the photo-mixed diet"
tools/supervise_stage.sh b 32000 "$OUT" --lr 1e-5 "${COMMON[@]}" --photo_frac 0.25
echo "[r4b] widened eval after the photo leg"
run_eval leg5

echo "[r4b] all done (post-chain benches run via tools/post_chain_r4.sh)"
