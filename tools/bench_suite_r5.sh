#!/bin/bash
# Round-5 TPU measurement suite (VERDICT r4 next-step #1): run the banked
# benches FIRST, before any campaign takes the chip.
#   1. per-pair 1080p fusion bench           (the headline)
#   2. scan-fused streaming bench w8/w16     (r3 #2: target >= 1.3x per-pair)
#   3. batch offline benches bs2/bs4+seq1    (r3 #3: fit + >1.3x bs=1 total)
#   4. stream16 + bs2 combined
#   5. 300-frame 1080p streamed-eval RSS sweep (<4 GB criterion)
# Usage: tools/bench_suite_r5.sh <outdir>
set -u
cd /root/repo
OUT=${1:-runs/bench_r5}
mkdir -p "$OUT"
B="env PYTHONPATH=/root/repo:/root/.axon_site python bench.py"

run () {  # $1 = output name, rest = bench args
  name=$1; shift
  echo "[bench] $name: $*"
  $B "$@" > "$OUT/$name.json" 2> "$OUT/$name.err" || true
  tail -1 "$OUT/$name.json"
}

run bench_perpair
run bench_stream8  --stream
run bench_stream16 --stream --stream_window 16
run bench_bs2_seq1 --bs 2 --seq_chunk 1
run bench_bs4_seq1 --bs 4 --seq_chunk 1
run bench_stream16_bs2 --stream --stream_window 16 --bs 2
run bench_bs2      --bs 2

echo "[bench] RSS sweep (300-frame 1080p streamed eval)"
env PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_rss_sweep.py \
  --frames 300 --out "$OUT/rss_sweep.json" > "$OUT/rss_sweep.out" 2>&1 || true
tail -3 "$OUT/rss_sweep.out"
echo "[bench] done"
