"""Benchmark: 1080p fusion-pipeline interpolation throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md) and its CUDA pipeline cannot
run here, so `vs_baseline` is measured fps divided by the DRIVER TARGET of
2x an estimated 1.0 fps for the reference pipeline at 1080p on its GPU (the
reference runs 5 U-Net passes, 4 full pyramid build/reconstruct cycles, CPU
scipy 50x50 median filters per frame, and reloads PhaseNet from disk per
frame pair — interpolate_twoframe.py:135-137; ~1 fps is generous).
vs_baseline >= 1.0 means the >2x-reference target is met.

Usage: python bench.py [--size HxW] [--frames N] [--pipeline fusion|phase]
"""

import argparse
import json
import sys
import time

import numpy as np

EST_REFERENCE_FPS = 1.0  # documented estimate, see module docstring
TARGET_MULTIPLier = 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--pipeline", default="fusion", choices=["fusion", "phase"])
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    h, w = (int(x) for x in args.size.split("x"))

    from __graft_entry__ import _fusion_weights
    from fmvfi_tpu.eval.synth import translation_video
    from fmvfi_tpu.ops.pyramid import make_filters, max_pyr_height
    from fmvfi_tpu.pipeline.interpolate import fusion_interpolate, phase_interpolate

    frames = translation_video(args.frames + 1, h, w, step=3.0)
    weights = _fusion_weights(h, w)
    # filters as traced device arguments (not HLO constants)
    filters = jax.tree.map(jnp.asarray, make_filters(h, w, max_pyr_height(h, w)))

    if args.pipeline == "fusion":
        fn = jax.jit(
            lambda wts, flt, a, b: fusion_interpolate(wts, a, b, filters=flt)
        )
        wrapped = fn
        fn = lambda wts, a, b: wrapped(wts, filters, a, b)
        wts = weights
    else:
        jfn = jax.jit(
            lambda wts, flt, a, b: phase_interpolate(wts, a, b, filters=flt)
        )
        fn = lambda wts, a, b: jfn(wts, filters, a, b)
        wts = weights.phase_net

    f = jnp.asarray(frames[:, None][0])  # warmup pair
    a = jnp.asarray(frames[0][None])
    b = jnp.asarray(frames[1][None])
    out = fn(wts, a, b)
    jax.block_until_ready(out)

    # timed: interpolate between consecutive frames
    t0 = time.perf_counter()
    outs = []
    for i in range(args.frames):
        a = jnp.asarray(frames[i][None])
        b = jnp.asarray(frames[i + 1][None])
        outs.append(fn(wts, a, b))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = args.frames / dt

    result = {
        "metric": f"{h}p_{args.pipeline}_interpolated_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / (TARGET_MULTIPLier * EST_REFERENCE_FPS), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
