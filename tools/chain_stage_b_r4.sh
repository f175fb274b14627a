#!/bin/bash
# Round-4 stage-B campaign: FROM-SCRATCH FusionNet under the gated-distill +
# log-MSE objective from step 0 (VERDICT r3 next-step #1: the r3 warm starts
# from L1-trained weights carried an Adam/L1 plateau into every leg; the
# diagnosis is to let the eval-criterion objective shape the basin from
# initialization).  Trainer fixes applied first (advisor r3): the distill
# gate/teacher use per-sample MSE under loss_psnr, the teacher log-MSE is
# floored at 1e-6, and loss_psnr+loss_balance is rejected.
#
# Fresh out dir = true from-scratch (the supervisor resumes state_b_latest
# only within this campaign).  Frozen components: published phase_net.pt +
# the r3 stage-A AdaCoF (runs/demo_stack/adacof_best.msgpack).
#
# Legs (absolute steps):
#   1:     -> 12000 @ lr 1e-4   (reference fusion lr, from random init)
#   2:     -> 22000 @ lr 3e-5
#   3:     -> 32000 @ lr 1e-5   (+ widened eval + promotion checkpoint)
#   4:     -> 40000 @ lr 3e-6   (+ widened eval + promotion)
#   5:     -> 44000 @ lr 1e-5 on the photo-mixed diet (VERDICT #6), guarded
#
# Usage: nohup tools/chain_stage_b_r4.sh > runs/demo_stack_r4/chain_r4.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4
R3=runs/demo_stack
mkdir -p "$OUT"
# reuse the cached 768-scene texture pool (identical generator + seed)
[ -e "$OUT/pool_768_v2.npy" ] || ln -s "$(pwd)/$R3/pool_768_v2.npy" "$OUT/pool_768_v2.npy"

ADA="$R3/adacof_best.msgpack"
COMMON=(--adacof_init "$ADA" --loss_psnr --distill 1.0 --probe_every 500 --save_every 500)

run_eval () {  # $1 = tag
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
    --adacof "$ADA" --fusion "$OUT/fusion_best.msgpack" \
    --out results_r4 --promote > "$OUT/eval_$1.out" 2>&1 || true
  tail -20 "$OUT/eval_$1.out" || true
}

echo "[r4] leg 1: -> 12000 @ 1e-4 (from scratch)"
tools/supervise_stage.sh b 12000 "$OUT" --lr 1e-4 "${COMMON[@]}"

echo "[r4] leg 2: -> 22000 @ 3e-5"
tools/supervise_stage.sh b 22000 "$OUT" --lr 3e-5 "${COMMON[@]}"

echo "[r4] leg 3: -> 32000 @ 1e-5"
tools/supervise_stage.sh b 32000 "$OUT" --lr 1e-5 "${COMMON[@]}"
echo "[r4] widened 512^2 dominance eval after leg 3"
run_eval leg3

echo "[r4] leg 4: -> 40000 @ 3e-6"
tools/supervise_stage.sh b 40000 "$OUT" --lr 3e-6 "${COMMON[@]}"
echo "[r4] widened 512^2 dominance eval after leg 4"
run_eval leg4

# Leg 5 (guarded): photo-mixed diet finetune — requires MixedSynthStream
# photo support (train_demo_stack --photo_frac); skipped cleanly if absent.
echo "[r4] leg 5: -> 44000 @ 1e-5 on the photo-mixed diet"
if env PYTHONPATH=/root/repo python - <<'EOF'
import inspect
from fmvfi_tpu.train.data import MixedSynthStream
raise SystemExit(0 if "photo_frac" in inspect.signature(MixedSynthStream).parameters else 1)
EOF
then
  tools/supervise_stage.sh b 44000 "$OUT" --lr 1e-5 "${COMMON[@]}" --photo_frac 0.25
  echo "[r4] widened eval after the photo leg"
  run_eval leg5
else
  echo "[r4] photo diet not available; skipping leg 5"
fi

echo "[r4] final bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r4.json" 2>&1 || true
echo "[r4] all done"
