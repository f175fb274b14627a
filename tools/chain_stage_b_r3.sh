#!/bin/bash
# Round-3 stage-B relaunch after the VM reset wiped the un-tracked TrainState
# (only the tracked fusion_best.msgpack, step-16k params, survived).
#
# Leg 1 warm-starts params from fusion_best at the leg-1 lr (fresh Adam state
# rebuilds within ~100 steps; the best-checkpoint guard reads the prior
# best_mean from the log so an early transient cannot clobber fusion_best).
# Legs 2+3 are the designed constant-lr decay continuations (Adam mu/nu/count
# restore exactly from state_b_latest; lr itself is stateless — see
# chain_stage_b_decay.sh for the rationale).  Then: 512^2 dominance eval
# (+promotion into checkpoints/ when the criterion holds) and the streaming
# bench re-measurement.
#
# Usage: tools/chain_stage_b_r3.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3chain] leg 1: 14000 steps @ lr 1e-4 (warm start from fusion_best)"
tools/supervise_stage.sh b 14000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --fusion_init "$OUT/fusion_best.msgpack" \
  --lr 1e-4 --probe_every 1000 --save_every 1000

echo "[r3chain] leg 2: -> 22000 steps @ lr 2e-5"
tools/supervise_stage.sh b 22000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 2e-5 --probe_every 1000 --save_every 1000

echo "[r3chain] leg 3: -> 26000 steps @ lr 4e-6"
tools/supervise_stage.sh b 26000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 4e-6 --probe_every 1000 --save_every 1000

echo "[r3chain] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3.out" 2>&1
echo "[r3chain] eval done (see $OUT/eval_r3.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3.json" 2>&1
echo "[r3chain] all done"
