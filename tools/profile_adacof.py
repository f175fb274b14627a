"""Sub-stage breakdown of one AdaCoF apply at 1080p: U-Net, warps, stats.

Usage: python tools/profile_adacof.py [--size 1080x1920] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters, name):
    import jax

    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(abs(leaves[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
    _ = float(abs(leaves[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fusion_weights
    from fmvfi_tpu.eval.synth import translation_video
    from fmvfi_tpu.models.adacof import AdaCoFNet, KernelEstimation, module_normalize, flow_stats_tm
    from fmvfi_tpu.ops.adacof import pad_replicate
    from fmvfi_tpu.ops.adacof_pallas import adacof_warp_fast_tm

    h, w = (int(x) for x in args.size.split("x"))
    cdt = jnp.bfloat16
    frames = translation_video(2, h, w, step=3.0)
    weights = _fusion_weights(h, w)
    f1 = jnp.asarray(frames[0][None])
    f2 = jnp.asarray(frames[1][None])
    it = args.iters

    # pad to /32 like AdaCoFNet
    pad_h = (32 - h % 32) % 32
    pad_w = (32 - w % 32) % 32
    if pad_h or pad_w:
        pad = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
        f1p = jnp.pad(f1, pad, mode="reflect")
        f2p = jnp.pad(f2, pad, mode="reflect")
    else:
        f1p, f2p = f1, f2

    ke = KernelEstimation(5, cdt)
    kvars = {"params": weights.adacof["params"]["get_kernel"]}

    def unet(a, b):
        return ke.apply(kvars, module_normalize(a), module_normalize(b))

    heads, _ = timed(jax.jit(unet), (f1p, f2p), it, "U-Net kernel estimation (7 heads)")
    w1, a1, b1, w2, a2, b2, occ = heads

    xpad = pad_replicate(f1p, 2)

    def warp1(x, wt, at, bt):
        return adacof_warp_fast_tm(x, wt, at, bt, 1)

    _, _ = timed(jax.jit(warp1), (xpad, w1, a1, b1), it, "Pallas warp (one frame)")

    def warps2(x1, x2):
        o1 = adacof_warp_fast_tm(x1, w1, a1, b1, 1)
        o2 = adacof_warp_fast_tm(x2, w2, a2, b2, 1)
        return occ * o1 + (1.0 - occ) * o2

    _, _ = timed(
        jax.jit(warps2), (xpad, pad_replicate(f2p, 2)), it, "both warps + blend"
    )

    def stats():
        m1, v1 = flow_stats_tm(w1, a1, b1)
        m2, v2 = flow_stats_tm(w2, a2, b2)
        unc = jnp.maximum(v1.sum(-1), v2.sum(-1))
        return jnp.clip(unc, 0.0, 20.0) / 20.0

    _, _ = timed(jax.jit(stats), (), it, "flow stats + uncertainty")

    model = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt)
    _, _ = timed(
        jax.jit(lambda a, b: model.apply(weights.adacof, a, b).blended),
        (f1, f2),
        it,
        "FULL apply (with stats)",
    )
    lite = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt, with_stats=False)
    _, _ = timed(
        jax.jit(lambda a, b: lite.apply(weights.adacof, a, b).blended),
        (f1, f2),
        it,
        "FULL apply (no stats)",
    )


if __name__ == "__main__":
    main()
