#!/bin/bash
# Round-3 stage-B chain (i): ride the gated-distill approach at lr 1e-5.
#
# Chain (g) leg 1 (log-MSE + gated distill @ 1e-5) climbed the tracking
# regimes at +0.35 dB/1k with no plateau in sight; its leg 2 at 3e-6
# dropped the slope to +0.06/1k — the approach speed (prop. to lr), not
# the jitter floor, was binding.  So: one LONG 1e-5 leg until the probes
# flatten, then a short 3e-6 polish.
#
# Leg 1: loss_psnr + distill 1.0 @ 1e-5  (resume -> 36000)
# Leg 2: loss_psnr + distill 1.0 @ 3e-6  (-> 38000)
# Then: 512^2 dominance eval (+promote) and the streaming bench.
#
# Usage: tools/chain_stage_b_r3i.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3i] leg 1: -> 36000 steps @ lr 1e-5, loss_psnr + gated distill"
tools/supervise_stage.sh b 36000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-5 --loss_psnr --distill 1.0 --probe_every 500 --save_every 500

echo "[r3i] leg 2: -> 38000 steps @ lr 3e-6, loss_psnr + gated distill"
tools/supervise_stage.sh b 38000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 3e-6 --loss_psnr --distill 1.0 --probe_every 500 --save_every 1000

echo "[r3i] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3i.out" 2>&1
echo "[r3i] eval done (see $OUT/eval_r3i.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3i.json" 2>&1
echo "[r3i] all done"
