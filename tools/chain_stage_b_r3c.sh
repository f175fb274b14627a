#!/bin/bash
# Round-3 stage-B relaunch (c) after the second VM reset: state_b_latest is
# gone again, only the tracked fusion_best (step-16k of the warm-start chain,
# probe mean 32.27, still climbing) survived.
#
# Leg 1: balanced-L1 (the leg-4 design — equalize per-sample gradient
#   contributions so the near-degenerate tracking regimes, ~1-6 dB below the
#   frozen stage-A AdaCoF, get full gradient signal) warm-started from
#   fusion_best at 2e-5.
# Leg 2: decay continuation at 4e-6 (exact TrainState resume).
# Then: 512^2 dominance eval (+promotion when the criterion holds) and the
# streaming bench re-measurement.
#
# Usage: tools/chain_stage_b_r3c.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3c] leg 1: 18000 steps @ lr 2e-5, balanced L1 (warm start fusion_best)"
tools/supervise_stage.sh b 18000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --fusion_init "$OUT/fusion_best.msgpack" \
  --lr 2e-5 --loss_balance --probe_every 1000 --save_every 1000

echo "[r3c] leg 2: -> 24000 steps @ lr 4e-6, balanced L1"
tools/supervise_stage.sh b 24000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 4e-6 --loss_balance --probe_every 1000 --save_every 1000

echo "[r3c] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3c.out" 2>&1
echo "[r3c] eval done (see $OUT/eval_r3c.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3c.json" 2>&1
echo "[r3c] all done"
