"""Per-stage wall-clock breakdown of the 1080p fusion pipeline on one chip.

Each stage is jitted separately and timed with the same chained-execution
methodology as bench.py (scalar device->host read as the barrier). The sum of
stages exceeds the fused end-to-end time (XLA overlaps/fuses across stage
boundaries in the real pipeline), so treat these as an attribution guide,
not an additive budget.

Usage: python tools/profile_stages.py [--size 1080x1920] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


HBM_GBPS = 819.0  # set from --hbm_gbps in main()


def timed(fn, args, iters, name, chain_idx=0):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(abs(leaves[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
    _ = float(abs(leaves[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / iters

    # bandwidth floor: bytes the optimized HLO touches / peak HBM bandwidth.
    # "% of floor" = how close the stage runs to pure-bandwidth speed-of-light
    # (100% = every byte moved once at peak BW; MXU-bound stages read lower).
    line = f"{name:42s} {dt*1e3:9.1f} ms"
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        gb = ca.get("bytes accessed", 0.0) / 1e9
        floor_ms = gb / HBM_GBPS * 1e3
        line += (
            f"  {gb:8.2f} GB  {gb / dt:7.1f} GB/s"
            f"  floor {floor_ms:7.1f} ms ({100.0 * floor_ms / (dt * 1e3):5.1f}%)"
        )
    except Exception:
        pass
    print(line, flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--hbm_gbps", type=float, default=819.0,
                    help="peak HBM bandwidth for the floor column (v5e: 819)")
    args = ap.parse_args()
    global HBM_GBPS
    HBM_GBPS = args.hbm_gbps

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fusion_weights
    from fmvfi_tpu.eval.synth import translation_video
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.models.fusion_net import FusionNet
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs, predictions_to_decomp
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.color import lab_to_rgb, rgb_to_lab
    from fmvfi_tpu.ops.filters import gaussian_blur, median_filter_fast
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height, reconstruct
    from fmvfi_tpu.pipeline.interpolate import (
        _from_chan_batch,
        _to_chan_batch,
        fusion_interpolate,
    )

    h, w = (int(x) for x in args.size.split("x"))
    cdt = jnp.bfloat16 if args.dtype == "bf16" else None
    frames = translation_video(2, h, w, step=3.0)
    weights = _fusion_weights(h, w)
    filters = jax.tree.map(jnp.asarray, make_filters(h, w, max_pyr_height(h, w)))
    f1 = jnp.asarray(frames[0][None])
    f2 = jnp.asarray(frames[1][None])
    it = args.iters

    adacof = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt)
    adacof_lite = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt, with_stats=False)

    # 1. adacof main
    ada_fn = jax.jit(lambda a, b: adacof.apply(weights.adacof, a, b).blended)
    ada_pred, _ = timed(ada_fn, (f1, f2), it, "1. adacof main pass (with stats)")

    # 2. phase: color + decompose
    def dec_fn(a, b):
        lab = jnp.concatenate([_to_chan_batch(rgb_to_lab(a)), _to_chan_batch(rgb_to_lab(b))], 0)
        return decompose(lab, filters)

    vals, _ = timed(jax.jit(dec_fn), (f1, f2), it, "2. rgb->lab + pyramid decompose (x6)")

    # 3. phasenet core
    def core_fn(vals):
        v1, v2 = dec_ops.split_frames(vals, 2)
        low, phases, amps = dec_ops.concat_for_net([v1, v2])
        lown, pn, an, norm = normalize_inputs(low, phases, amps)
        core = PhaseNetCore(num_img=2, dtype=cdt)
        lo, pp, ap = core.apply(weights.phase_net, lown, pn, an)
        return predictions_to_decomp(lo, pp, ap, norm, jnp.zeros_like(v1.high))

    dec, _ = timed(jax.jit(core_fn), (vals,), it, "3. phasenet core (+norm/denorm)")

    # 4. reconstruct + lab->rgb
    def rec_fn(dec):
        lab_pred = reconstruct(dec, filters)
        return jnp.clip(lab_to_rgb(_from_chan_batch(lab_pred)), 0.0, 1.0)

    phase_pred, _ = timed(jax.jit(rec_fn), (dec,), it, "4. pyramid reconstruct + lab->rgb (x3)")

    # 5+6+7. uncertainty maps (frequency-domain fast path)
    from fmvfi_tpu.pipeline.interpolate import fusion_uncertainty
    from fmvfi_tpu.ops.filters import median_filter_fast as _mff

    _, _ = timed(
        jax.jit(lambda a, p: fusion_uncertainty(a, p, filters)),
        (ada_pred, phase_pred),
        it,
        "5-7. uncertainty maps (fast path)",
    )

    # 7b. median filter alone (the biggest single op inside the maps)
    g = jnp.mean(ada_pred - phase_pred, axis=-1)
    _, _ = timed(
        jax.jit(lambda x: _mff(x, size=50)), (g,), it, "7b. median_filter_fast alone"
    )

    # 8. baseline passes 1+2 (batched)
    def base12(a, p, b):
        lhs = jnp.concatenate([a, p], axis=0)
        rhs = jnp.concatenate([p, b], axis=0)
        return adacof_lite.apply(weights.adacof, lhs, rhs).blended

    mids, _ = timed(jax.jit(base12), (f1, phase_pred, f2), it, "8. baseline adacof passes 1+2 (2B batch)")

    # 9. baseline pass 3
    def base3(mids):
        in1, in2 = jnp.split(mids, 2, axis=0)
        return adacof_lite.apply(weights.adacof, in1, in2).blended

    base, _ = timed(jax.jit(base3), (mids,), it, "9. baseline adacof pass 3")

    # 10. fusion net
    def fuse(base, ada, ph, a, b):
        other = jnp.concatenate([rgb_to_lab(a), rgb_to_lab(b)], axis=-1)
        maps = jnp.zeros(base.shape[:3] + (3,), base.dtype)
        return FusionNet(dtype=cdt).apply(weights.fusion_net, base, ada, ph, other, maps, 0)

    _, _ = timed(jax.jit(fuse), (base, ada_pred, phase_pred, f1, f2), it, "10. fusion net")

    # end-to-end
    full = jax.jit(lambda a, b: fusion_interpolate(weights, a, b, filters=filters, compute_dtype=cdt))
    _, dt = timed(full, (f1, f2), it, "END-TO-END fused")
    print(f"{'fps':42s} {1.0/dt:9.3f}")


if __name__ == "__main__":
    main()
