#!/bin/bash
# Leg 4: balanced-L1 continuation.  Legs 1-3 plateaued at probe mean ~33.3
# with the tracking regimes (translation2/step1/bright) 1-3 dB below the
# frozen stage-A AdaCoF: under plain batch L1 the near-degenerate samples
# (L1 ~4e-3) get ~30x less gradient than large-motion samples (~1e-1), so
# lr decay alone cannot push them to the 45+ dB tracking floor.
# --loss_balance equalizes per-sample gradient contributions (opt-in
# framework feature, trainer.py::make_fusion_trainer), TrainState pytree
# unchanged -> exact resume from the leg-3 state.
#
# Usage: tools/chain_stage_b_r3_leg4.sh [prior_chain_pid]
set -u
cd /root/repo
OUT=runs/demo_stack
PRIOR=${1:-}
if [ -n "$PRIOR" ]; then
  echo "[leg4] waiting for prior chain (pid $PRIOR)"
  while kill -0 "$PRIOR" 2>/dev/null; do sleep 60; done
fi
if [ ! -f "$OUT/state_b_latest.msgpack" ]; then
  echo "[leg4] no TrainState to resume; aborting" >&2
  exit 1
fi
echo "[leg4] balanced-L1 leg: -> 34000 steps @ lr 2e-5"
tools/supervise_stage.sh b 34000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 2e-5 --loss_balance --probe_every 1000 --save_every 1000
echo "[leg4] done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3_leg4.out" 2>&1
echo "[leg4] all done"
