"""Benchmark: 1080p fusion-pipeline interpolation throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Methodology notes (important on this environment):
- On this platform block_until_ready does not reliably wait, so the loop
  CHAINS each iteration on the previous device output (out feeds the next
  input) and the barrier is a one-scalar device->host read at the end —
  honest wall-clock per frame, frames resident in HBM (as in a production
  serving loop), barrier cost amortized over the frame count.
- The reference publishes no numbers (BASELINE.md) and its CUDA pipeline
  cannot run here.  It does, however, run scipy.ndimage.median_filter(size=50)
  on the CPU for EVERY frame (fusion_net/trainer.py:143,
  interpolate_twoframe.py:222) — measured at 60.3 s per 1080p frame on this
  host (see --measure_baseline) — so 1/60.3 = 0.0166 fps is a strict UPPER
  bound on the reference pipeline's 1080p throughput, before its 5 U-Net
  passes, 4 pyramid cycles, per-pair PhaseNet reloads and host round-trips.
  vs_baseline = fps / (2 * 0.0166): >= 1.0 means the >2x-reference driver
  target is met.

Usage: python bench.py [--size HxW] [--frames N] [--pipeline fusion|phase|adacof]
"""

import argparse
import json
import time

# measured upper bound on the reference pipeline (see module docstring)
EST_REFERENCE_FPS = 1.0 / 60.3
TARGET_MULTIPLIER = 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument(
        "--pipeline", default="fusion", choices=["fusion", "phase", "adacof"]
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="fusion: use the streaming serving loop instead of the default "
        "per-pair pipeline (stream reuses the shared frame's decomposition, "
        "batches pass-3 with the next main pass, and runs --stream_window "
        "steps inside one jitted lax.scan so the carry never crosses the "
        "jit boundary; identical math, pinned by tests/test_pipeline.py::"
        "test_fusion_stream_matches_per_pair).  The result JSON carries "
        '"stream": true so runs are distinguishable from per-pair ones',
    )
    ap.add_argument("--no_stream", action="store_true",
                    help="deprecated no-op (per-pair is the default)")
    ap.add_argument("--stream_window", type=int, default=8,
                    help="stream steps per jitted lax.scan dispatch")
    ap.add_argument("--bs", type=int, default=1,
                    help="batch size: N independent frame streams per "
                    "dispatch (offline rate-doubling throughput; fps counts "
                    "all N)")
    ap.add_argument("--seq_chunk", type=int, default=0,
                    help="fusion: run the bandwidth-bound middle sections "
                    "(PhaseNet/pyramid, uncertainty, baseline) over batch "
                    "chunks of this size via lax.map inside the jit — "
                    "bounds peak HBM near the chunk footprint so --bs 2 "
                    "fits at 1080p (identical math, pinned by tests)")
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"],
                    help="compute dtype for the conv nets (warp/pyramid stay fp32)")
    ap.add_argument("--measure_baseline", action="store_true",
                    help="re-measure the reference's per-frame CPU median floor")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    h, w = (int(x) for x in args.size.split("x"))

    ref_fps = EST_REFERENCE_FPS
    if args.measure_baseline:
        import time as _t

        import numpy as _np
        from scipy.ndimage import median_filter as _mf

        x = _np.random.rand(h, w).astype(_np.float32)
        t0 = _t.perf_counter()
        _mf(x, size=50)
        ref_fps = 1.0 / (_t.perf_counter() - t0)

    from __graft_entry__ import _fusion_weights
    from fmvfi_tpu.eval.synth import translation_video
    from fmvfi_tpu.ops.pyramid import make_filters, max_pyr_height
    from fmvfi_tpu.pipeline.interpolate import (
        adacof_interpolate,
        fusion_interpolate,
        phase_interpolate,
    )

    frames = translation_video(2, h, w, step=3.0)
    weights = _fusion_weights(h, w)
    from fmvfi_tpu.models.fusion_net import infer_variant

    variant = infer_variant(weights.fusion_net)  # promoted ckpt may be v2
    bs = args.bs
    filters = jax.tree.map(jnp.asarray, make_filters(h, w, max_pyr_height(h, w)))

    cdt = jnp.bfloat16 if args.dtype == "bf16" else None
    if args.pipeline == "fusion" and args.stream:
        from fmvfi_tpu.pipeline.interpolate import (
            fusion_stream_init,
            fusion_stream_scan,
        )

        T = max(1, args.stream_window)
        # window of steps inside ONE jitted lax.scan: the carry is a
        # device-internal loop variable (donated across window dispatches),
        # so the pyramid bands never materialize at a jit boundary
        jscan = jax.jit(
            lambda wts, flt, c, fw: fusion_stream_scan(
                wts, c, fw, filters=flt, compute_dtype=cdt, variant=variant
            ),
            donate_argnums=(2,),
        )
        a = jnp.asarray(jnp.tile(frames[0][None], (bs, 1, 1, 1)))
        fw = jnp.asarray(jnp.tile(frames[1][None, None], (T, bs, 1, 1, 1)))
        carry = jax.jit(lambda flt, f: fusion_stream_init(f, flt))(filters, a)
        carry, outs = jscan(weights, filters, carry, fw)  # warmup/compile
        _ = float(outs[0, 0, 0, 0, 0])

        iters = max(1, -(-args.frames // T))
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, outs = jscan(weights, filters, carry, fw)
        _ = float(outs[-1, 0, 0, 0, 0])
        dt = time.perf_counter() - t0
        fps = iters * T * bs / dt
        result = {
            "metric": f"{h}p_fusion_interpolated_frames_per_sec_per_chip",
            "value": round(fps, 4),
            "unit": "frames/sec",
            "vs_baseline": round(fps / (TARGET_MULTIPLIER * ref_fps), 4),
            "stream": True,
            "stream_window": T,
            "batch": bs,
        }
        print(json.dumps(result))
        return
    if args.pipeline == "fusion":
        raw = jax.jit(
            lambda a, b: fusion_interpolate(
                weights, a, b, filters=filters, compute_dtype=cdt,
                seq_chunk=args.seq_chunk, variant=variant,
            )
        )
    elif args.pipeline == "phase":
        raw = jax.jit(
            lambda a, b: phase_interpolate(weights.phase_net, a, b, filters=filters)
        )
    else:
        raw = jax.jit(lambda a, b: adacof_interpolate(weights.adacof, a, b))

    a = jnp.asarray(jnp.tile(frames[0][None], (bs, 1, 1, 1)))
    b = jnp.asarray(jnp.tile(frames[1][None], (bs, 1, 1, 1)))

    # warmup/compile (scalar read = real execution barrier)
    out = raw(a, b)
    _ = float(out[0, 0, 0, 0])

    # timed: chain on the device (each iteration consumes the previous output)
    t0 = time.perf_counter()
    x = out
    for _ in range(args.frames):
        x = raw(x, b)
    _ = float(x[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    fps = args.frames * bs / dt

    result = {
        "metric": f"{h}p_{args.pipeline}_interpolated_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / (TARGET_MULTIPLIER * ref_fps), 4),
        "stream": False,
        "batch": bs,
        "seq_chunk": args.seq_chunk,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
