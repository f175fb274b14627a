#!/bin/bash
# Supervise a train_demo_stack.py stage: restart on failure, resuming from
# the full-TrainState checkpoint once one exists.  The driver exits(3) when
# it sees a persistently non-finite loss (corrupted device state — observed
# when a second axon client shares the TPU chip mid-run); a process restart
# re-acquires the chip cleanly.
#
# Usage: tools/supervise_stage.sh <stage a|b> <steps> <out_dir> [extra args...]
set -u
STAGE=$1; STEPS=$2; OUT=$3; shift 3
MAX_RESTARTS=8
n=0
while [ $n -le $MAX_RESTARTS ]; do
  STATE="$OUT/state_${STAGE}_latest.msgpack"
  RESUME=()
  if [ -f "$STATE" ]; then RESUME=(--resume_state "$STATE"); fi
  echo "[supervise] attempt $n (resume: ${RESUME[*]:-none})"
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/train_demo_stack.py \
    --stage "$STAGE" --steps "$STEPS" --out "$OUT" "${RESUME[@]}" "$@"
  rc=$?
  if [ $rc -eq 0 ]; then echo "[supervise] done"; exit 0; fi
  echo "[supervise] exited rc=$rc; restarting in 15s"
  sleep 15
  n=$((n+1))
done
echo "[supervise] giving up after $MAX_RESTARTS restarts"
exit 1
