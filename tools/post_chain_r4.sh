#!/bin/bash
# Post-campaign TPU measurement suite (round 4): runs once the stage-B chain
# releases the chip (a second axon client mid-training corrupts device state,
# so every TPU measurement waits for the chain PID to exit).
#
#   1. per-pair 1080p fusion bench      (the r3 headline: 1.07 fps)
#   2. scan-fused streaming bench       (VERDICT r3 #2: target >= 1.3x per-pair)
#   3. batch-2 offline bench            (VERDICT r3 #3: fit + >1.3x bs=1 total)
#
# Usage: tools/post_chain_r4.sh <chain_pid> > runs/demo_stack_r4/post_bench.out 2>&1 &
set -u
cd /root/repo
PID=${1:?chain pid}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[post] chain $PID exited; starting TPU benches"
OUT=runs/demo_stack_r4
B="env PYTHONPATH=/root/repo:/root/.axon_site python bench.py"

echo "[post] per-pair"
$B                         > "$OUT/bench_perpair.json" 2>&1 || true
cat "$OUT/bench_perpair.json"
echo "[post] stream w8"
$B --stream                > "$OUT/bench_stream8.json" 2>&1 || true
cat "$OUT/bench_stream8.json"
echo "[post] stream w16"
$B --stream --stream_window 16 > "$OUT/bench_stream16.json" 2>&1 || true
cat "$OUT/bench_stream16.json"
echo "[post] bs=2"
$B --bs 2                  > "$OUT/bench_bs2.json" 2>&1 || true
cat "$OUT/bench_bs2.json"
echo "[post] bs=2 seq_chunk=1 (memory-fit: middle sections chunked)"
$B --bs 2 --seq_chunk 1    > "$OUT/bench_bs2_seq1.json" 2>&1 || true
cat "$OUT/bench_bs2_seq1.json"
echo "[post] bs=4 seq_chunk=1"
$B --bs 4 --seq_chunk 1    > "$OUT/bench_bs4_seq1.json" 2>&1 || true
cat "$OUT/bench_bs4_seq1.json"
echo "[post] stream w16 bs=2 (stream + batch combined)"
$B --stream --stream_window 16 --bs 2 > "$OUT/bench_stream16_bs2.json" 2>&1 || true
cat "$OUT/bench_stream16_bs2.json"
echo "[post] done"
