#!/bin/bash
# Unattended stage-B LR step-decay continuation (legs 2+3), then the 512^2
# dominance evaluation (+ promotion into checkpoints/ when the criterion
# holds) and the streaming-bench re-measurement.
#
# Rationale: leg 1 trains at a constant 1e-4.  The dominance criterion
# (VERDICT r2 #1) needs the fused output to TRACK the frozen AdaCoF to
# within 0.2 dB on regimes where AdaCoF sits at 45-48 dB PSNR, i.e. a
# residual-error floor around 4e-3 — unreachable at lr 1e-4.  An optax
# schedule would change the optimizer-state pytree and break exact resume
# from the leg-1 TrainState, so we decay the reference way: constant-lr
# legs (Adam's mu/nu/count restore cleanly; lr itself is stateless).
#
# Usage: tools/chain_stage_b_decay.sh [leg1_supervisor_pid]
set -u
cd /root/repo
OUT=runs/demo_stack
LEG1_PID=${1:-}
if [ -n "$LEG1_PID" ]; then
  echo "[chain2] waiting for leg-1 supervisor (pid $LEG1_PID)"
  while kill -0 "$LEG1_PID" 2>/dev/null; do sleep 60; done
fi
# the decay legs only make sense as CONTINUATIONS: without a leg-1
# TrainState they would train a randomly-initialized FusionNet at a
# far-too-low lr and feed garbage into the unattended eval/promotion
if [ ! -f "$OUT/state_b_latest.msgpack" ]; then
  echo "[chain2] no leg-1 TrainState ($OUT/state_b_latest.msgpack); aborting" >&2
  exit 1
fi
echo "[chain2] leg 1 done; leg 2 (-> 30000 steps @ lr 2e-5)"
tools/supervise_stage.sh b 30000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 2e-5 --probe_every 1000 --save_every 1000
echo "[chain2] leg 2 done; leg 3 (-> 36000 steps @ lr 4e-6)"
tools/supervise_stage.sh b 36000 "$OUT" \
  --adacof_init "$OUT/adacof_best.msgpack" \
  --lr 4e-6 --probe_every 1000 --save_every 1000
echo "[chain2] training done; 512^2 dominance eval (+promote)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_demo_stack.py \
  --adacof "$OUT/adacof_best.msgpack" \
  --fusion "$OUT/fusion_best.msgpack" \
  --out results_r3 --promote > "$OUT/eval_r3.out" 2>&1
echo "[chain2] streaming bench re-measurement"
env PYTHONPATH=/root/repo:/root/.axon_site python bench.py \
  > "$OUT/bench_r3.json" 2>&1
echo "[chain2] all done"
