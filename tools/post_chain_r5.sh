#!/bin/bash
# Post-campaign leftovers (round 5): fire the moment the r5b chain releases
# the chip (one axon client at a time).
#   1. the 300-frame 1080p streamed-eval RSS sweep (4th attempt; the remote
#      compiler 500'd this graph class from ~13:50) with a 512^2 fallback
#      so the <4 GB host-RSS criterion gets SOME banked evidence,
#   2. a single-seed visualize pass of the 9/9 stack (panels + .avi),
#   3. refreshed lpips_sub calibration over the full results_r5 cache.
# Usage: tools/post_chain_r5.sh <chain_pid> > runs/bench_r5/post_r5.out 2>&1 &
set -u
cd /root/repo
PID=${1:?chain pid}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[post] chain $PID exited"
E="env PYTHONPATH=/root/repo:/root/.axon_site"

echo "[post] RSS sweep 1080p (attempt 4)"
$E python tools/measure_rss_sweep.py --frames 300 \
  --out runs/bench_r5/rss_sweep.json > runs/bench_r5/rss_sweep4.out 2>&1 \
  && tail -1 runs/bench_r5/rss_sweep.json \
  || { echo "[post] 1080p failed again; 512^2 fallback";
       $E python tools/measure_rss_sweep.py --frames 300 --size 512x512 \
         --clip /tmp/rss_clip_512.avi \
         --out runs/bench_r5/rss_sweep_512.json \
         > runs/bench_r5/rss_sweep_512.out 2>&1 \
         && tail -1 runs/bench_r5/rss_sweep_512.json || echo "[post] 512 failed too"; }

echo "[post] visualize pass (single seed, fusion panels)"
$E python - <<'EOF' > runs/bench_r5/panels.out 2>&1 || true
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fmvfi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fmvfi_tpu.eval.evaluate import evaluate_suite, synthetic_sets
from fmvfi_tpu.pipeline.interpolate import FusionWeights
from fmvfi_tpu.utils.convert import (load_adacof_weights, load_fusion_weights,
                                     phase_net_from_torch)
w = FusionWeights(
    phase_net=phase_net_from_torch("/root/reference/src/phase_net/phase_net.pt"),
    adacof=load_adacof_weights("checkpoints/adacof_synth_demo.msgpack"),
    fusion_net=load_fusion_weights("checkpoints/fusion_synth_demo.msgpack"))
s = evaluate_suite(w, "results_r5/panels",
                   sets=synthetic_sets(512, n_frames=6, include_photo=True),
                   methods=("fusion",), dim=512, max_num=4, variant=2,
                   visualize=True, cache_token="panels-nf6")
print({k: round(v["fusion"]["psnr"], 2) for k, v in s.items()})
EOF
tail -2 runs/bench_r5/panels.out

echo "[post] lpips_sub calibration over results_r5"
python tools/calibrate_lpips_sub.py --out_dir results_r5 \
  --json results_r5/lpips_calibration.json | tail -4
echo "[post] done"
