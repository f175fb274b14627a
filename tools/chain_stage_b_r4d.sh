#!/bin/bash
# Round-4 gated-blend campaign ("r4d"): stage B with the variant-2 FusionNet
# head (per-pixel softmax selection over {base, adacof, phase} +
# confidence-muted residual), warm-started from the r4c-best variant-0 net
# (every layer but the widened dec2 1x1 conv).
#
# Rationale: three rounds of campaign evidence say the residual head
# approaches the tracking regimes (step1/brightness, where fusion must
# reproduce a near-perfect AdaCoF) only asymptotically — the 512^2 gap is a
# head-parameterization problem, not a schedule problem.  With the blend
# head, copying a component is exactly representable by saturating one
# logit, so those regimes decouple from the mixing regimes.
#
#   leg A: -> 12000 @ lr 3e-5  (gated-distill + log-MSE, fresh blend head)
#          + widened 512^2 eval (--fusion_variant 2)
#   leg B: -> 18000 @ lr 3e-5  photo-mixed diet (photo_frac 0.25) + eval
#   leg C: -> 24000 @ lr 1e-5  polish + eval
#   leg D: -> 28000 @ lr 3e-6  polish + eval + promotion
#
# Usage: nohup tools/chain_stage_b_r4d.sh > runs/demo_stack_r4d/chain_r4d.out 2>&1 &
set -u
cd /root/repo
OUT=runs/demo_stack_r4d
mkdir -p "$OUT"

ADA=runs/demo_stack/adacof_best.msgpack
WARM=runs/demo_stack_r4c/fusion_best.msgpack
COMMON=(--adacof_init "$ADA" --fusion_variant 2 --loss_psnr --distill 1.0
        --probe_every 500 --save_every 500)

run_eval () {  # $1 = tag, extra args pass through
  tag=$1; shift
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
    --adacof "$ADA" --fusion "$OUT/fusion_best.msgpack" --fusion_variant 2 \
    --out results_r4 "$@" > "$OUT/eval_$tag.out" 2>&1 || true
  tail -20 "$OUT/eval_$tag.out" || true
}

echo "[r4d] leg A: -> 12000 @ 3e-5 (blend head, warm start: $WARM)"
tools/supervise_stage.sh b 12000 "$OUT" --lr 3e-5 \
  --fusion_init "$WARM" "${COMMON[@]}"
echo "[r4d] widened 512^2 dominance eval after leg A"
run_eval legA

echo "[r4d] leg B: -> 18000 @ 3e-5 on the photo-mixed diet"
tools/supervise_stage.sh b 18000 "$OUT" --lr 3e-5 "${COMMON[@]}" --photo_frac 0.25
echo "[r4d] widened eval after the photo leg"
run_eval legB

echo "[r4d] leg C: -> 24000 @ 1e-5 polish"
tools/supervise_stage.sh b 24000 "$OUT" --lr 1e-5 "${COMMON[@]}"
echo "[r4d] widened eval after leg C"
run_eval legC

echo "[r4d] leg D: -> 28000 @ 3e-6 polish"
tools/supervise_stage.sh b 28000 "$OUT" --lr 3e-6 "${COMMON[@]}"
echo "[r4d] widened eval after leg D (+promotion if the criterion holds)"
run_eval legD --promote

echo "[r4d] all done"
