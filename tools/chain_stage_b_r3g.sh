#!/bin/bash
# Round-3 stage-B chain (g): log-MSE + GATED best-component distillation,
# decreasing lr.  Supersedes chain (f) mid-flight.
#
# The gate (trainer.make_fusion_trainer distill docstring) keeps the
# teacher term active per sample only while the frozen best component is
# strictly better than the current fused output — a ratchet into the
# "track the near-degenerate component" basin (step1/translation2/bright
# probes sit 0.7-3.3 dB below the frozen AdaCoF) that cannot drag down
# the regimes where fusion already beats both components (translation4/
# rot/zoom).  No anneal-to-zero leg is needed.
#
# Leg 1: loss_psnr + distill 1.0 @ 1e-5  (resume state_b_latest -> 29000)
# Leg 2: loss_psnr + distill 1.0 @ 3e-6  (-> 34000)
# Leg 3: loss_psnr + distill 1.0 @ 1e-6  (-> 37000)
# Then: 512^2 dominance eval (+promotion when the criterion holds) and the
# streaming bench re-measurement.
#
# Usage: tools/chain_stage_b_r3g.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3g] leg 1: -> 29000 steps @ lr 1e-5, loss_psnr + gated distill"
tools/supervise_stage.sh b 29000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-5 --loss_psnr --distill 1.0 --probe_every 500 --save_every 500

echo "[r3g] leg 2: -> 34000 steps @ lr 3e-6, loss_psnr + gated distill"
tools/supervise_stage.sh b 34000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 3e-6 --loss_psnr --distill 1.0 --probe_every 500 --save_every 1000

echo "[r3g] leg 3: -> 37000 steps @ lr 1e-6, loss_psnr + gated distill"
tools/supervise_stage.sh b 37000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-6 --loss_psnr --distill 1.0 --probe_every 500 --save_every 1000

echo "[r3g] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3g.out" 2>&1
echo "[r3g] eval done (see $OUT/eval_r3g.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3g.json" 2>&1
echo "[r3g] all done"
