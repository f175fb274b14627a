#!/bin/bash
# Unattended stage-A -> stage-B chain: wait for the stage-A supervisor
# (pid file /tmp/stage_a.pid) to exit, then launch the stage-B FusionNet
# supervisor against the frozen stage-A AdaCoF, warm-started from the
# converted published fusion_net.pt.  Survives the interactive session.
set -u
cd /root/repo
OUT=runs/demo_stack
A_PID=$(cat /tmp/stage_a.pid 2>/dev/null || echo "")
if [ -n "$A_PID" ]; then
  while kill -0 "$A_PID" 2>/dev/null; do sleep 60; done
fi
ADA="$OUT/adacof_best.msgpack"
[ -f "$ADA" ] || ADA="$OUT/adacof_latest.msgpack"
if [ ! -f "$ADA" ]; then
  echo "[chain] no stage-A checkpoint found; aborting" >&2
  exit 1
fi
echo "[chain] stage A done; launching stage B against $ADA"
exec tools/supervise_stage.sh b "${1:-20000}" "$OUT" \
  --adacof_init "$ADA" \
  --fusion_init /root/reference/src/fusion_net/fusion_net.pt \
  --probe_every 1000 --save_every 1000
