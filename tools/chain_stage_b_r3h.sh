#!/bin/bash
# Round-3 stage-B chain (h): eval-scale adaptation (contingency after (g)).
#
# The dominance eval runs at 512^2 while stage B trains at crop 256 over
# 288x448 scenes; the pyramid is 2 levels taller at 512 and the
# uncertainty-map statistics shift with scale, so probe-level tracking
# gains were observed to shrink at eval scale (probe step1 gap -3.4 dB vs
# eval -5.1 dB in chain d).  This chain finetunes at crop 512 / batch 2
# (same pixels per step) on a 576^2 pool, with a short crop-256 re-touch,
# keeping the (g) objective: log-MSE + gated best-component distill.
#
# Usage: tools/chain_stage_b_r3h.sh <start_step>
#   legs run to start+2500 (crop 512), +500 (crop 256 re-touch)
set -u
cd /root/repo
OUT=runs/demo_stack
START=${1:?pass the current absolute step (state_b_latest)}
L1=$((START + 2500))
L2=$((L1 + 500))

echo "[r3h] leg 1: -> $L1 steps @ lr 1e-5, crop 512 / batch 2 (576^2 pool)"
tools/supervise_stage.sh b "$L1" "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-5 --loss_psnr --distill 1.0 --crop 512 --batch 2 \
  --pool 192 --pool_h 576 --pool_w 576 \
  --probe_every 500 --save_every 500

echo "[r3h] leg 2: -> $L2 steps @ lr 1e-6, crop 256 re-touch"
tools/supervise_stage.sh b "$L2" "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 1e-6 --loss_psnr --distill 1.0 \
  --probe_every 250 --save_every 500

# NOTE: fusion_best tracks the 256^2 probe mean, which a 512-crop leg is
# not optimizing — evaluate the LATEST weights (the 512-adapted ones).
echo "[r3h] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_latest.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3h.out" 2>&1
echo "[r3h] eval done (see $OUT/eval_r3h.out)"
echo "[r3h] all done"
