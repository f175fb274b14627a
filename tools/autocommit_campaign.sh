#!/bin/bash
# Commit campaign state every INTERVAL seconds while a chain PID is alive,
# plus once after it exits.  Exists because a 2026-08-20 VM restart wiped the
# (then-uncommitted) full TrainState at step 13400, costing the optimizer
# state of a 7-hour campaign; with this, a restart loses at most one interval.
#
# Usage: tools/autocommit_campaign.sh <chain_pid> [interval_s=1200] [run_dir=runs/demo_stack_r4]
set -u
cd /root/repo
PID=${1:?chain pid}
INTERVAL=${2:-1200}
DIR=${3:-runs/demo_stack_r4}
commit_once () {
  git add -f "$DIR/state_b_latest.msgpack" \
             "$DIR/fusion_best.msgpack" 2>/dev/null
  git add "$DIR/stage_b_log.jsonl" results_r4 2>/dev/null
  if ! git diff --cached --quiet; then
    step=$(grep -o '"step": [0-9]*' "$DIR/stage_b_log.jsonl" | tail -1 | grep -o '[0-9]*')
    probe=$(grep -o '"probe_mean": [0-9.]*' "$DIR/stage_b_log.jsonl" | tail -1 | grep -o '[0-9.]*')
    git commit -q -m "Campaign checkpoint: stage-B resumed leg at step ${step:-?} (probe mean ${probe:-?}); TrainState tracked so a VM restart resumes exactly" || true
    echo "[autocommit] committed at step ${step:-?} probe ${probe:-?}"
  fi
}
while kill -0 "$PID" 2>/dev/null; do
  sleep "$INTERVAL"
  commit_once
done
commit_once
echo "[autocommit] chain exited; final commit done"
