"""Measure peak host RSS of a streamed 1080p clip eval sweep.

VERDICT r3 weak #5 / next-step #8 done-criterion: a synthetic 1080p
multi-hundred-frame clip sweep through `evaluate_frames` must peak below
4 GB host RSS.  Decoded whole (the r3 path / the reference's
evaluate.py:219-300), 300 frames of 1080p float32 alone are 7 GB before
the model runs; streamed (`load_set(stream=True)`), frames decode u8 as
they score through a 3-frame rolling window.

Writes the clip with cv2 (MJPG .avi), runs the sweep with the bundled demo
weights, and reports peak RSS (ru_maxrss, whole-process high-water mark)
plus the per-triplet PSNR count as evidence the sweep really ran.

Run ON TPU (fast):   env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/measure_rss_sweep.py --frames 120
Run on CPU (slow):   add --cpu --frames 8 --size 512x512
"""

import argparse
import json
import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=120)
parser.add_argument("--size", default="1080x1920")
parser.add_argument("--clip", default="/tmp/rss_sweep_clip.avi")
parser.add_argument("--out", default=None, help="append the JSON line here")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import cv2
import numpy as np

h, w = (int(x) for x in args.size.split("x"))

if not os.path.exists(args.clip):
    # write the clip in chunks so clip GENERATION doesn't dominate RSS
    from fmvfi_tpu.eval.synth import translation_video

    wr = cv2.VideoWriter(
        args.clip, cv2.VideoWriter_fourcc(*"MJPG"), 24, (w, h)
    )
    left = args.frames
    seg = 0
    while left > 0:
        n = min(left, 24)
        v = translation_video(n + 1, h, w, step=3.0, seed=17 + seg)[:n]
        for f in v:
            wr.write(cv2.cvtColor(
                (f * 255 + 0.5).astype(np.uint8), cv2.COLOR_RGB2BGR
            ))
        left -= n
        seg += 1
    wr.release()

from __graft_entry__ import _fusion_weights
from fmvfi_tpu.eval.evaluate import evaluate_frames, load_set

weights = _fusion_weights(h, w)
from fmvfi_tpu.models.fusion_net import infer_variant  # noqa: E402

stream_src = load_set(args.clip, stream=True)
res = evaluate_frames(stream_src(), weights, method="fusion", dim=min(h, w),
                      variant=infer_variant(weights.fusion_net))

peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
result = {
    "metric": "streamed_1080p_sweep_peak_rss_mb",
    "value": round(peak_mb, 1),
    "unit": "MB",
    "frames": args.frames,
    "size": args.size,
    "triplets_scored": int(res["psnr"].shape[0]),
    "mean_psnr": float(np.mean(res["psnr"])),
    "pass_under_4gb": bool(peak_mb < 4096),
}
print(json.dumps(result))
if args.out:
    with open(args.out, "a") as f:
        f.write(json.dumps(result) + "\n")
