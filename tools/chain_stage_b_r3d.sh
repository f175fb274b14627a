#!/bin/bash
# Round-3 stage-B distillation chain (d), replacing the tail of chain (c).
#
# Diagnosis: pure balanced-L1 tracking converges at ~+0.05 dB/1k steps while
# the dominance gap on the near-degenerate regimes (step1 -3.9, occl -3.4,
# translation2 -3.3 vs the frozen stage-A AdaCoF) is ~3-4 dB: GT-only L1 is
# the right objective but a hopelessly slow path into the "track the better
# component" basin.  The distill term (per-sample best frozen component as
# teacher, trainer.make_fusion_trainer(distill=...)) is the shortcut; it is
# annealed to 0 so the final objective is the reference's plain L1-to-GT.
#
# Leg 1: distill 1.0 @ 1e-4  (resume state_b_latest ~step 13k -> 16k)
# Leg 2: distill 0.3 @ 3e-5  (-> 19000)
# Leg 3: GT-only balanced L1 @ 1e-5 (-> 22000)
# Then: 512^2 dominance eval (+promotion when the criterion holds) and the
# streaming bench re-measurement.
#
# Usage: tools/chain_stage_b_r3d.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3d] leg 1: -> 16000 steps @ lr 1e-4, distill 1.0, balanced L1"
tools/supervise_stage.sh b 16000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-4 --loss_balance --distill 1.0 --probe_every 500 --save_every 500

echo "[r3d] leg 2: -> 19000 steps @ lr 3e-5, distill 0.3, balanced L1"
tools/supervise_stage.sh b 19000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 3e-5 --loss_balance --distill 0.3 --probe_every 500 --save_every 1000

echo "[r3d] leg 3: -> 22000 steps @ lr 1e-5, GT-only balanced L1"
tools/supervise_stage.sh b 22000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-5 --loss_balance --probe_every 500 --save_every 1000

echo "[r3d] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3d.out" 2>&1
echo "[r3d] eval done (see $OUT/eval_r3d.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3d.json" 2>&1
echo "[r3d] all done"
