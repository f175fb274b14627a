"""Per-stage HBM-traffic floors for the 1080p fusion pipeline (no execution).

VERDICT r2 #4b asked for "bytes moved / 110 GB/s vs actual ms" per stage so
that "within 2-3x of the bandwidth floor" is a number, not a claim.  This
tool computes, via jax.eval_shape only (CPU-safe, runs while the chip is
busy), two floors per stage of tools/profile_stages.py:

  io floor      bytes(stage inputs) + bytes(stage outputs) — an
                unconditional lower bound on HBM traffic.
  traffic est.  a roofline estimate of real traffic:
                - conv nets: every leaf-module activation is written once
                  and read once by its consumer (2x bytes; flax
                  capture_intermediates under eval_shape gives the shapes
                  without running anything), plus one read of the params
                  and of the stage inputs. Elementwise ops are assumed
                  fused (XLA does this), conv im2col reuse is assumed
                  perfect — so this UNDERSTATES convs and the utilization
                  numbers are conservative.
                - FFT stages: each 2-D (I)FFT moves ~4x the complex array
                  (two 1-D passes, each read+write), summed over the
                  actual per-level crop shapes in PyramidFilters.

  floor_ms = traffic / BW, utilization = floor_ms / measured_ms.

Measured ms defaults are the round-2/3 stage budget from RESULTS.md
(tools/profile_stages.py on the real chip); pass --measured to override,
--bw to change the 110 GB/s effective-bandwidth ceiling (RESULTS.md
"Platform ceiling").

Usage: python tools/bandwidth_floor.py [--size 1080x1920]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # eval_shape only; never touch TPU

import jax.numpy as jnp

GB = 1e9


def nbytes(tree) -> int:
    return sum(
        x.size * jnp.dtype(x.dtype).itemsize for x in jax.tree_util.tree_leaves(tree)
    )


def io_floor(fn, *args) -> tuple:
    out = jax.eval_shape(fn, *args)
    return nbytes(args) + nbytes(out), out


def _leaf_call_outputs(inter):
    """Flatten capture_intermediates, keeping only LEAF modules' __call__
    outputs (composite modules re-sow their children's outputs)."""
    paths = []

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        else:
            paths.append((path, node))

    rec(inter, ())
    # a module path is a leaf iff no other sown path extends its module
    # prefix (path minus the trailing '__call__')
    prefixes = {p[:-1] for p, _ in paths}
    out = []
    for p, node in paths:
        mod = p[:-1]
        if not any(q != mod and q[: len(mod)] == mod for q in prefixes):
            out.append(node)
    return out


def net_traffic(model, variables, *args, method=None) -> int:
    """Roofline traffic of one flax-net apply: inputs once + params once +
    2x every leaf-module activation (written by its producer, read by its
    consumer)."""

    def fn(v, *a):
        return model.apply(
            v, *a, capture_intermediates=True, mutable=["intermediates"],
            method=method,
        )

    out, state = jax.eval_shape(fn, variables, *args)
    acts = _leaf_call_outputs(state["intermediates"])
    return nbytes(args) + nbytes(variables) + 2 * sum(nbytes(a) for a in acts)


def _flat_paths(tree):
    out = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        else:
            out[path] = node

    rec(tree, ())
    return out


def conv_mxu_ms(model, variables, *args, extra_apply_args=()):
    """Conv-FLOP floor in ms: match each conv kernel (kh,kw,Cin,Cout) with
    its module's sown __call__ output (N,H,W,Cout) and charge the measured
    width-dependent matmul rate of this chip (RESULTS.md platform ceiling:
    ~6 TF/s below 128 channels, ~20 mid, ~48 TF/s at >=384)."""

    def fn(v, *a):
        return model.apply(
            v, *a, *extra_apply_args,
            capture_intermediates=True, mutable=["intermediates"],
        )

    _, state = jax.eval_shape(fn, variables, *args)
    acts = _flat_paths(state["intermediates"])
    params = _flat_paths(
        variables["params"] if "params" in variables else variables
    )
    ms = 0.0
    for ppath, p in params.items():
        if ppath[-1] != "kernel" or len(p.shape) != 4:
            continue
        node = acts.get(ppath[:-1] + ("__call__",))
        if node is None:
            continue
        o = jax.tree_util.tree_leaves(node)[0]
        kh, kw, cin, cout = p.shape
        n, ho, wo = o.shape[0], o.shape[-3], o.shape[-2]
        fl = 2 * n * ho * wo * kh * kw * cin * cout
        width = min(cin, cout)
        rate = 6e12 if width < 128 else (20e12 if width < 384 else 48e12)
        ms += fl / rate * 1e3
    return ms


def fft2_traffic(shape, complex_bytes=8) -> int:
    """Two 1-D FFT passes, each read+write of the full complex array."""
    h, w = shape[-2:]
    n = 1
    for s in shape[:-2]:
        n *= s
    return 4 * n * h * w * complex_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--bw", type=float, default=110.0, help="GB/s ceiling")
    ap.add_argument(
        "--measured",
        default="",
        help="comma list stage=ms overriding the RESULTS.md defaults, "
        "e.g. 1=150,2=80",
    )
    args = ap.parse_args()

    from __graft_entry__ import _fusion_weights
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.models.fusion_net import FusionNet
    from fmvfi_tpu.models.phase_net import PhaseNetCore, normalize_inputs
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.color import rgb_to_lab
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.pipeline.interpolate import _to_chan_batch, fusion_uncertainty

    h, w = (int(x) for x in args.size.split("x"))
    cdt = jnp.bfloat16
    weights = _fusion_weights(h, w)
    filters = make_filters(h, w, max_pyr_height(h, w))
    f1 = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    f2 = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)

    # RESULTS.md stage budget (round-2/3 measurements on the real chip)
    measured = {
        "1. adacof main pass": 150.0,
        "2. rgb->lab + decompose x6": 80.0,
        "3. phasenet core": 150.0,
        "4. reconstruct + lab->rgb": 45.0,
        "5-7. uncertainty maps": 45.0,
        "8+9. baseline composite (3 passes)": 450.0,
        "10. fusion net": 32.0,
    }
    for kv in filter(None, args.measured.split(",")):
        k, v = kv.split("=")
        for name in measured:
            if name.startswith(k + ".") or name.startswith(k + "+"):
                measured[name] = float(v)

    rows = []

    def add(name, io_b, traffic_b, mxu_ms=0.0):
        rows.append((name, io_b, max(traffic_b, io_b), mxu_ms))

    adacof = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt)
    adacof_lite = AdaCoFNet(kernel_size=5, dilation=1, dtype=cdt, with_stats=False)

    # 1. adacof main: U-Net traffic + 2 warps (image+fields read, out write)
    io_b, _ = io_floor(
        lambda a, b: adacof.apply(weights.adacof, a, b).blended, f1, f2
    )
    tr = net_traffic(adacof, weights.adacof, f1, f2)
    add("1. adacof main pass", io_b, tr,
        conv_mxu_ms(adacof, weights.adacof, f1, f2))

    # 2. color + decompose: FFT-aware over the actual crop pyramid
    def dec_fn(a, b):
        lab = jnp.concatenate(
            [_to_chan_batch(rgb_to_lab(a)), _to_chan_batch(rgb_to_lab(b))], 0
        )
        return decompose(lab, filters)

    io_b, dec_shape = io_floor(dec_fn, f1, f2)
    n_img = 6  # 2 frames x 3 Lab channels
    tr = fft2_traffic((n_img, h, w))  # forward FFT
    tr += fft2_traffic((n_img, h, w))  # hi0 band IFFT
    nlv = filters.height - 2
    for lvl in range(nlv):
        lh, lw = filters.level_shapes[lvl]
        tr += fft2_traffic((n_img, filters.nbands, lh, lw))  # band IFFTs
    lh, lw = filters.level_shapes[-1] if filters.level_shapes else (h, w)
    tr += fft2_traffic((n_img, lh, lw))  # low IFFT (coarsest crop)
    tr += io_b
    add("2. rgb->lab + decompose x6", io_b, tr)

    # 3. phasenet core
    def core_fn(vals):
        v1, v2 = dec_ops.split_frames(vals, 2)
        low, phases, amps = dec_ops.concat_for_net([v1, v2])
        lown, pn, an, _ = normalize_inputs(low, phases, amps)
        core = PhaseNetCore(num_img=2, dtype=cdt)
        return core.apply(weights.phase_net, lown, pn, an)

    io_b, _ = io_floor(core_fn, dec_shape)
    core = PhaseNetCore(num_img=2, dtype=cdt)

    def core_only(v, vals):
        v1, v2 = dec_ops.split_frames(vals, 2)
        low, phases, amps = dec_ops.concat_for_net([v1, v2])
        lown, pn, an, _ = normalize_inputs(low, phases, amps)
        return core.apply(
            v, lown, pn, an, capture_intermediates=True, mutable=["intermediates"]
        )

    out, state = jax.eval_shape(core_only, weights.phase_net, dec_shape)
    acts = _leaf_call_outputs(state["intermediates"])
    tr = (
        nbytes(dec_shape)
        + nbytes(weights.phase_net)
        + 2 * sum(nbytes(a) for a in acts)
    )
    class _CoreWrap:
        """apply(v, vals) adapter so conv_mxu_ms sees the full core call."""

        @staticmethod
        def apply(v, vals, capture_intermediates=False, mutable=()):
            v1, v2 = dec_ops.split_frames(vals, 2)
            low, phases, amps = dec_ops.concat_for_net([v1, v2])
            lown, pn, an, _ = normalize_inputs(low, phases, amps)
            return core.apply(
                v, lown, pn, an,
                capture_intermediates=capture_intermediates, mutable=mutable,
            )

    add("3. phasenet core", io_b, tr,
        conv_mxu_ms(_CoreWrap, weights.phase_net, dec_shape))

    # 4. reconstruct + lab->rgb: same FFT model, 3 channels one frame
    tr = fft2_traffic((3, h, w)) * 2  # band FFTs forward accumulate + final IFFT
    for lvl in range(nlv):
        lh, lw = filters.level_shapes[lvl]
        tr += fft2_traffic((3, filters.nbands, lh, lw))
    io_b = nbytes(dec_shape) // 2 + (h * w * 3 * 4)
    add("4. reconstruct + lab->rgb", io_b, tr)

    # 5-7. uncertainty maps (io floor only: median histogram passes are
    # implementation-specific; floor understated, flagged in RESULTS)
    pred = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    io_b, _ = io_floor(
        lambda a, p: fusion_uncertainty(a, p, filters), pred, pred
    )
    add("5-7. uncertainty maps", io_b, io_b)

    # 8+9. baseline composite: 3 more lite U-Net passes
    io_b, _ = io_floor(
        lambda a, b: adacof_lite.apply(weights.adacof, a, b).blended, f1, f2
    )
    tr1 = net_traffic(adacof_lite, weights.adacof, f1, f2)
    add("8+9. baseline composite (3 passes)", 3 * io_b, 3 * tr1,
        3 * conv_mxu_ms(adacof_lite, weights.adacof, f1, f2))

    # 10. fusion net
    fusion = FusionNet(dtype=cdt)
    maps = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    other = jax.ShapeDtypeStruct((1, h, w, 6), jnp.float32)
    io_b, _ = io_floor(
        lambda a, b, c, o, m: fusion.apply(weights.fusion_net, a, b, c, o, m, 0),
        pred, pred, pred, other, maps,
    )

    def fuse_cap(v, a, b, c, o, m):
        return fusion.apply(
            v, a, b, c, o, m, 0,
            capture_intermediates=True, mutable=["intermediates"],
        )

    _, fstate = jax.eval_shape(
        fuse_cap, weights.fusion_net, pred, pred, pred, other, maps
    )
    facts = _leaf_call_outputs(fstate["intermediates"])
    tr = (
        nbytes((pred, pred, pred, other, maps))
        + nbytes(weights.fusion_net)
        + 2 * sum(nbytes(a) for a in facts)
    )

    class _FuseWrap:
        @staticmethod
        def apply(v, a, b, c, o, m, capture_intermediates=False, mutable=()):
            return fusion.apply(
                v, a, b, c, o, m, 0,
                capture_intermediates=capture_intermediates, mutable=mutable,
            )
    add("10. fusion net", io_b, tr,
        conv_mxu_ms(_FuseWrap, weights.fusion_net, pred, pred, pred, other,
                    maps))

    print(f"{'stage':38s} {'est GB':>7s} {'bw ms':>6s} {'mxu ms':>7s} "
          f"{'floor':>6s} {'meas':>5s} {'util':>6s}")
    tot_f = tot_m = 0.0
    for name, io_b, tr, mxu in rows:
        bw_ms = tr / (args.bw * GB) * 1e3
        fl = max(bw_ms, mxu)
        ms = measured.get(name)
        tot_f += fl
        tot_m += ms or 0.0
        util = f"{fl/ms*100:5.0f}%" if ms else "    ?"
        print(f"{name:38s} {tr/GB:7.3f} {bw_ms:6.1f} {mxu:7.1f} "
              f"{fl:6.1f} {ms if ms else 0:5.0f} {util:>6s}")
    print(f"{'TOTAL (binding floor per stage)':38s} {'':7s} {'':6s} {'':7s} "
          f"{tot_f:6.1f} {tot_m:5.0f} {tot_f/tot_m*100:5.0f}%")


if __name__ == "__main__":
    main()
