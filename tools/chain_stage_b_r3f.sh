#!/bin/bash
# Round-3 stage-B chain (f): log-MSE objective at DECREASING lr.
#
# Chain (e)'s leg 1 (loss_psnr @ 3e-5) dipped the top regimes (probe mean
# 33.3 -> 33.15 over 1.5k steps): with Adam the per-sample reweighting only
# picks the gradient DIRECTION — the plateau level is set by lr (per-param
# step ~= lr after moment normalization), and 3e-5 is 3x the lr of the
# previous plateau.  So: keep the better direction (log-MSE equalization,
# vanishing per-sample gradient) and anneal lr BELOW the old plateau's
# 1e-5 to let the easy-regime tracking bite.
#
# Leg 1: loss_psnr @ 1e-5  (resume state_b_latest -> 28000)
# Leg 2: loss_psnr @ 3e-6  (-> 34000)
# Leg 3: loss_psnr @ 1e-6  (-> 37000)
# Then: 512^2 dominance eval (+promotion when the criterion holds) and the
# streaming bench re-measurement.
#
# Usage: tools/chain_stage_b_r3f.sh
set -u
cd /root/repo
OUT=runs/demo_stack

echo "[r3f] leg 1: -> 28000 steps @ lr 1e-5, loss_psnr"
tools/supervise_stage.sh b 28000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-5 --loss_psnr --probe_every 500 --save_every 500

echo "[r3f] leg 2: -> 34000 steps @ lr 3e-6, loss_psnr"
tools/supervise_stage.sh b 34000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 3e-6 --loss_psnr --probe_every 500 --save_every 1000

echo "[r3f] leg 3: -> 37000 steps @ lr 1e-6, loss_psnr"
tools/supervise_stage.sh b 37000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-6 --loss_psnr --probe_every 500 --save_every 1000

echo "[r3f] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3f.out" 2>&1
echo "[r3f] eval done (see $OUT/eval_r3f.out); streaming bench"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3f.json" 2>&1
echo "[r3f] all done"
