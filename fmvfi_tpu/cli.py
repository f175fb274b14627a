"""Command-line entry points mirroring the reference's scripts.

    python -m fmvfi_tpu.cli interpolate   --first a.png --second b.png --output out.png
    python -m fmvfi_tpu.cli video         --input clip.mp4 --output_dir out/
    python -m fmvfi_tpu.cli evaluate      --out_dir results/
    python -m fmvfi_tpu.cli bench         --size 1080x1920

Reference counterparts: src/{fusion_net,phase_net,adacof}/interpolate_twoframe
.py, interpolate_video.py, src/evaluation/evaluate.py.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_weights(args, h, w):
    import jax
    import jax.numpy as jnp

    from .models.registry import get_model
    from .pipeline.interpolate import FusionWeights
    from .utils.convert import (
        load_adacof_weights,
        load_fusion_weights,
        phase_net_from_torch,
    )

    import os

    ckpt_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints"
    )
    # single-model methods load only their own weights (phase-only use must
    # not require an AdaCoF/FusionNet checkpoint and vice versa); the eval
    # command compares methods, so it keeps everything
    method = getattr(args, "method", "fusion")
    methods = set(getattr(args, "methods", method).split(","))
    need_ada = bool(methods - {"phase"})
    need_phase = bool(methods - {"adacof"})
    need_fusion = bool(methods & {"fusion"})

    rng = jax.random.key(0)
    z = jnp.zeros((1, max(h, 32), max(w, 32), 3))
    using_demo_ada = False
    if not need_ada:
        ada = None
    elif args.adacof_checkpoint:
        ada = load_adacof_weights(
            args.adacof_checkpoint, args.kernel_size, args.dilation
        )
    else:
        demo = os.path.join(ckpt_dir, "adacof_synth_demo.msgpack")
        if os.path.exists(demo) and args.kernel_size == 5:
            ada = load_adacof_weights(demo)
            using_demo_ada = True
            print(f"note: using bundled demo AdaCoF weights ({demo}); pass "
                  "--adacof_checkpoint for trained ones", file=sys.stderr)
        else:
            model = get_model(
                getattr(args, "model", None) or "adacof",
                kernel_size=args.kernel_size,
                dilation=args.dilation,
            )
            ada = model.init(rng, z, z)
            print("warning: no --adacof_checkpoint, using random AdaCoF weights",
                  file=sys.stderr)

    fusion_ckpt = args.fusion_checkpoint
    demo_fusion = os.path.join(ckpt_dir, "fusion_synth_demo.msgpack")
    if (
        need_fusion
        and using_demo_ada
        and os.path.exists(demo_fusion)
        and fusion_ckpt.endswith("fusion_net.pt")
    ):
        # the published FusionNet was trained against the published AdaCoF;
        # with the demo AdaCoF, prefer the FusionNet finetuned alongside it
        fusion_ckpt = demo_fusion
        print(f"note: using bundled demo FusionNet ({demo_fusion}) matched to "
              "the demo AdaCoF", file=sys.stderr)

    # Resolve the FusionNet mode, auto-detected from the checkpoint name the
    # way the reference publishes them (fusion_net_phase.pt = variant 1,
    # fusion_net_nouncertainty.pt = uncertainty_maps 0; fusion_net.py:69-77,
    # fusion_net/train.py:79).  msgpack checkpoints are detected from the
    # tree SHAPE instead (promotion places whatever variant won the
    # campaign at the default path).  Explicit flags override.
    name = os.path.basename(fusion_ckpt)
    if getattr(args, "fusion_maps", -1) < 0:
        args.fusion_maps = 0 if "nouncertainty" in name else 3
    explicit_variant = getattr(args, "fusion_variant", -1)
    if explicit_variant < 0 and not fusion_ckpt.endswith(".msgpack"):
        explicit_variant = 1 if "phase" in name else 0
    fusion_vars = None
    if need_fusion:
        fusion_vars = load_fusion_weights(
            fusion_ckpt, uncertainty_maps=args.fusion_maps,
            variant=None if explicit_variant < 0 else explicit_variant,
        )
    if getattr(args, "fusion_variant", -1) < 0:
        if explicit_variant >= 0 or fusion_vars is None:
            args.fusion_variant = max(explicit_variant, 0)
        else:
            from .models.fusion_net import infer_variant

            args.fusion_variant = infer_variant(fusion_vars)
    return FusionWeights(
        phase_net=(
            phase_net_from_torch(args.phase_checkpoint) if need_phase else None
        ),
        adacof=ada,
        fusion_net=fusion_vars,
    )


def _common(p):
    p.add_argument("--method", default="fusion", choices=["fusion", "phase", "adacof"])
    p.add_argument(
        "--phase_checkpoint", default="/root/reference/src/phase_net/phase_net.pt"
    )
    p.add_argument(
        "--fusion_checkpoint", default="/root/reference/src/fusion_net/fusion_net.pt"
    )
    p.add_argument("--adacof_checkpoint", default="")
    p.add_argument("--fusion_variant", type=int, default=-1,
                   choices=[-1, 0, 1, 2],
                   help="FusionNet head: 0 = residual over the baseline "
                        "composite, 1 = residual over the phase prediction "
                        "(fusion_net_phase.pt), 2 = gated-blend head "
                        "(beyond-reference; *blend*.msgpack); -1 = auto "
                        "from checkpoint name")
    p.add_argument("--fusion_maps", type=int, default=-1, choices=[-1, 0, 3],
                   help="uncertainty-map channels: 3 = full, 0 = no-maps "
                        "ablation (fusion_net_nouncertainty.pt); -1 = auto "
                        "from checkpoint name")
    p.add_argument("--kernel_size", type=int, default=5)
    p.add_argument("--dilation", type=int, default=1)
    p.add_argument("--model", default="",
                   help="registry name or dotted path exposing make_model() "
                        "(the reference's dynamic loader, models/__init__.py)")


def cmd_interpolate(argv):
    p = argparse.ArgumentParser(prog="interpolate")
    p.add_argument("--first_frame", required=True)
    p.add_argument("--second_frame", required=True)
    p.add_argument("--output_frame", default="./output.png")
    p.add_argument("--dim", type=int, default=0, help="center-crop size (0 = full)")
    p.add_argument("--output_phase", default="", help="also write the PhaseNet prediction here")
    p.add_argument("--output_adacof", default="", help="also write the AdaCoF prediction here")
    p.add_argument("--output_baseline", default="", help="also write the 3-pass baseline composite here")
    _common(p)
    args = p.parse_args(argv)

    import cv2
    import jax.numpy as jnp

    from .eval.evaluate import crop_center
    from .pipeline.video import _interp_fn

    def read(path):
        raw = cv2.imread(path)
        if raw is None:
            p.error(f"cannot read image: {path}")
        img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        return img.astype(np.float32) / 255.0

    f1, f2 = read(args.first_frame), read(args.second_frame)
    if args.dim:
        f1 = crop_center(f1, args.dim)
        f2 = crop_center(f2, args.dim)
    h, w, _ = f1.shape
    weights = _load_weights(args, h, w)

    def write(path, img):
        cv2.imwrite(
            path,
            cv2.cvtColor((np.asarray(img) * 255).clip(0, 255).astype(np.uint8),
                         cv2.COLOR_RGB2BGR),
        )
        print(f"wrote {path}")

    side = args.output_phase or args.output_adacof or args.output_baseline
    if side and args.method == "fusion":
        import jax

        from .pipeline.interpolate import fusion_interpolate

        out, parts = jax.jit(
            lambda a, b: fusion_interpolate(
                weights, a, b, return_parts=True,
                variant=args.fusion_variant,
                uncertainty_maps=args.fusion_maps,
            )
        )(jnp.asarray(f1[None]), jnp.asarray(f2[None]))
        if args.output_phase:
            write(args.output_phase, parts["phase"][0])
        if args.output_adacof:
            write(args.output_adacof, parts["adacof"][0])
        if args.output_baseline:
            write(args.output_baseline, parts["baseline"][0])
        out = out[0]
    else:
        fn = _interp_fn(weights, h, w, args.method,
                        args.fusion_variant, args.fusion_maps)
        out = fn(jnp.asarray(f1[None]), jnp.asarray(f2[None]))[0]
    write(args.output_frame, out)


def cmd_video(argv):
    p = argparse.ArgumentParser(prog="video")
    p.add_argument("--input", required=True, help="video file or frame directory")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch", type=int, default=1,
                   help="pairs per device dispatch (>1 = offline-throughput "
                        "mode; 1 = per-pair latency mode)")
    p.add_argument("--factor", type=int, default=2,
                   help="rate multiplier (power of two; >2 = recursive "
                        "midpoint doubling)")
    p.add_argument("--stream", action="store_true",
                   help="fusion: streaming serving loop (scan-fused window; "
                        "the shared frame's pyramid decomposition is reused "
                        "across consecutive pairs) instead of per-pair")
    p.add_argument("--stream_window", type=int, default=8,
                   help="stream steps per jitted lax.scan dispatch")
    p.add_argument("--seq_chunk", type=int, default=0,
                   help="fusion + --batch>1: chunk the bandwidth-bound "
                        "middle sections to this batch granularity inside "
                        "the jit (bounds peak HBM; lets --batch 2 fit at "
                        "1080p on a 16 GB chip)")
    _common(p)
    args = p.parse_args(argv)

    from .eval.evaluate import load_set
    from .pipeline.video import multiply_frame_rate, write_frame_dir

    frames = load_set(args.input)
    h, w = frames.shape[1:3]
    weights = _load_weights(args, h, w)
    out = list(multiply_frame_rate(frames, weights, args.method,
                                   args.fusion_variant, args.fusion_maps,
                                   factor=args.factor, batch=args.batch,
                                   stream=args.stream,
                                   stream_window=args.stream_window,
                                   seq_chunk=args.seq_chunk))
    write_frame_dir(args.output_dir, out)
    print(f"wrote {len(out)} frames to {args.output_dir}")


def cmd_evaluate(argv):
    p = argparse.ArgumentParser(prog="evaluate")
    p.add_argument("--out_dir", default="./results")
    p.add_argument("--test_sets", default="synthetic",
                   help="'synthetic', 'synthetic+photo' (adds a real-"
                        "photograph motion set with exact GT), "
                        "comma-separated video/frame-dir paths, "
                        "or adapter specs like middlebury:<in>:<gt>, "
                        "davis:<in>:<gt>, ucf101:<dir>, vimeo:<root>, "
                        "middlebury_eval:<dir> (scored per scene like "
                        "TestModule.py)")
    p.add_argument("--methods", default="fusion")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--max_num", type=int, default=10)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--vgg_checkpoint", default="",
                   help="torchvision vgg16 state dict: adds the real "
                        "VGG-feature LPIPS column (evaluate_image.py:21-28); "
                        "without it the documented lpips_sub substitute is "
                        "reported")
    _common(p)
    args = p.parse_args(argv)

    from .eval.datasets import load_test_set
    from .eval.evaluate import (
        evaluate_suite,
        evaluate_triplets,
        load_set,
        synthetic_sets,
    )
    from .eval.visualize import metric_bars

    lpips_fn = None
    if args.vgg_checkpoint:
        from .eval.metrics import make_vgg_lpips

        lpips_fn = make_vgg_lpips(args.vgg_checkpoint)

    adapters = {a + ":" for a in
                ("middlebury", "middlebury_eval", "davis", "ucf101", "vimeo")}
    synth_mode = args.test_sets in ("synthetic", "synthetic+photo")
    specs = [] if synth_mode else args.test_sets.split(",")
    paired = [s for s in specs if any(s.startswith(a) for a in adapters)]
    plain = [s for s in specs if s not in paired]

    weights = _load_weights(args, args.dim, args.dim)
    summary = {}
    if synth_mode or plain:
        if synth_mode:
            sets = synthetic_sets(
                args.dim, include_photo=args.test_sets.endswith("+photo")
            )
        else:
            # streamed: frames decode as they score (u8 until device
            # upload), so an 11-clip 1080p sweep fits host RAM
            sets = {s.split("/")[-1]: load_set(s, stream=True) for s in plain}
        summary = evaluate_suite(
            weights,
            args.out_dir,
            sets=sets,
            methods=args.methods.split(","),
            dim=args.dim,
            max_num=args.max_num,
            overwrite=args.overwrite,
            lpips_fn=lpips_fn,
            variant=args.fusion_variant,
            uncertainty_maps=args.fusion_maps,
        )
        metric_bars(summary, out_path=f"{args.out_dir}/results.png")

    for spec in paired:
        name = spec.split(":")[0]
        triplets = load_test_set(spec, max_num=args.max_num)
        for method in args.methods.split(","):
            res = evaluate_triplets(
                triplets, weights, method,
                output_dir=f"{args.out_dir}/{name}_{method}",
                lpips_fn=lpips_fn,
                variant=args.fusion_variant,
                uncertainty_maps=args.fusion_maps,
            )
            with open(f"{args.out_dir}/result_{name}_{method}.json", "w") as f:
                json.dump(res, f, indent=2)
            summary[f"{name}/{method}"] = res.get("average", {})
    print(json.dumps(summary, indent=2))


def cmd_train(argv):
    p = argparse.ArgumentParser(prog="train")
    p.add_argument("--regime", default="adacof", choices=["adacof", "phase", "fusion"])
    p.add_argument("--data_dir", default="", help="Vimeo90k root (empty = synthetic)")
    p.add_argument("--out_dir", default="./output")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr_decay_epochs", type=int, default=0,
                   help="halve the LR every N epochs (reference AdaCoF: 20)")
    p.add_argument("--loss", default="1*Charb+0.01*g_Spatial+0.005*g_Occlusion")
    p.add_argument("--vgg_checkpoint", default="",
                   help="torchvision vgg16 state dict (required for *VGG loss)")
    p.add_argument("--optimizer", default="adamax")
    p.add_argument("--mode", default="phase", choices=["phase", "fusion"],
                   help="phase regime: plain or fusion-input variant "
                        "(train/train.py --mode)")
    p.add_argument("--model_variant", type=int, default=0, choices=[0, 1],
                   help="fusion-mode phase training: 0=warped pair inputs "
                        "(num_img=4), 1=blended input (num_img=3)")
    p.add_argument("--high_level", action="store_true",
                   help="carry AdaCoF's highpass band (architecture.py:64-66)")
    p.add_argument("--m", type=int, default=0,
                   help="hierarchical training: start predicting only the m "
                        "coarsest levels (0 = all levels, no schedule)")
    p.add_argument("--m_update", type=int, default=500,
                   help="increment m every N batches (train/trainer.py:162)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices")
    _common(p)
    args = p.parse_args(argv)

    import jax

    from .train.data import SyntheticTriplets, Vimeo90kTriplets, batch_iterator
    from .train.loop import fit
    from .train.losses import parse_loss_spec
    from .train import trainer as T
    from .utils import config as C

    rng = jax.random.key(0)
    hw = args.crop
    decay_steps = args.lr_decay_epochs * args.steps_per_epoch or None
    make_step = None
    if args.regime == "adacof":
        state, step = T.make_adacof_trainer(
            rng, hw, hw, kernel_size=args.kernel_size, dilation=args.dilation,
            lr=args.lr or 1e-3, loss_spec=parse_loss_spec(args.loss),
            optimizer=args.optimizer, lr_decay_steps=decay_steps,
            vgg_checkpoint=args.vgg_checkpoint,
        )
    elif args.regime == "phase":
        adacof_vars = None
        if args.mode == "fusion" or args.high_level:
            adacof_vars = _load_weights(args, hw, hw).adacof
        state, step, _, make_step = T.make_phase_trainer(
            rng, hw, hw, lr=args.lr or 1e-3, mode=args.mode,
            model_variant=args.model_variant, adacof_vars=adacof_vars,
            kernel_size=args.kernel_size, dilation=args.dilation,
            high_level=args.high_level,
        )
    else:
        w = _load_weights(args, hw, hw)
        state, step = T.make_fusion_trainer(
            rng, hw, hw, w.phase_net, w.adacof,
            kernel_size=args.kernel_size, dilation=args.dilation,
            lr=args.lr or 1e-4,
            variant=args.fusion_variant, uncertainty_maps=args.fusion_maps,
        )

    # persist the full config next to the checkpoints (train/train.py:107-111)
    cfg = C.Config()
    cfg.adacof.kernel_size = args.kernel_size
    cfg.adacof.dilation = args.dilation
    cfg.adacof.checkpoint = args.adacof_checkpoint
    cfg.phase_net.checkpoint = args.phase_checkpoint
    cfg.fusion_net.checkpoint = args.fusion_checkpoint
    cfg.train.epochs = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.train.lr = args.lr or {"adacof": 1e-3, "phase": 1e-3, "fusion": 1e-4}[args.regime]
    cfg.train.optimizer = args.optimizer
    cfg.train.loss = args.loss
    cfg.train.crop = args.crop
    cfg.train.out_dir = args.out_dir
    cfg.train.data_dir = args.data_dir
    C.save(cfg, f"{args.out_dir}/config.json")

    if args.data_dir:
        ds = Vimeo90kTriplets(args.data_dir)
    else:
        ds = SyntheticTriplets(n=32, h=args.crop + 16, w=args.crop + 16)
        print("note: no --data_dir, training on synthetic motion", file=sys.stderr)
    batches = batch_iterator(ds, args.batch_size, crop=args.crop)

    wrap = None
    if args.data_parallel:
        from .parallel.dp import data_parallel
        from .parallel.mesh import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        state = replicate(mesh, state)

        def wrap(raw):  # fit() applies this to the initial step AND to
            # every m-schedule rebuild (previously the rebuild dropped DP)
            pstep = data_parallel(raw, mesh)
            return lambda s, b: pstep(s, shard_batch(mesh, b))

    state = fit(
        state, step, batches, args.out_dir,
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        jit=not args.data_parallel,
        make_step=make_step if args.m else None,
        m_init=args.m or None, m_update=args.m_update,
        wrap_step=wrap,
    )
    print(f"trained {int(state.step)} steps; checkpoints in {args.out_dir}/checkpoint")


def cmd_export(argv):
    """AOT-export a pipeline as a self-contained serving artifact (StableHLO
    + weights in one .npz) loadable with plain jax — no fmvfi_tpu, no torch.
    The reference has no deployment story beyond running its scripts in-tree."""
    p = argparse.ArgumentParser(prog="export", description=cmd_export.__doc__)
    p.add_argument("--size", default="512x512", help="HxW the artifact serves")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="pipeline.fmx.npz")
    p.add_argument("--platforms", default="",
                   help="comma list (e.g. tpu,cpu) for a multi-platform "
                        "artifact; empty = current platform")
    _common(p)
    args = p.parse_args(argv)
    h, w = (int(x) for x in args.size.split("x"))

    from .utils.export import export_pipeline, save_exported

    weights = _load_weights(args, h, w)  # resolves fusion_variant/maps >= 0
    blob = export_pipeline(
        weights, h, w, args.method, batch=args.batch,
        kernel_size=args.kernel_size, dilation=args.dilation,
        variant=args.fusion_variant, uncertainty_maps=args.fusion_maps,
        platforms=[s for s in args.platforms.split(",") if s] or None,
    )
    save_exported(args.out, blob)
    print(f"exported {args.method} {args.batch}x{h}x{w} -> {args.out} "
          f"({len(blob)/1e6:.1f} MB)")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmds = {
        "interpolate": cmd_interpolate,
        "video": cmd_video,
        "evaluate": cmd_evaluate,
        "train": cmd_train,
        "export": cmd_export,
    }
    if not argv or argv[0] not in cmds:
        print(f"usage: python -m fmvfi_tpu.cli {{{'|'.join(cmds)}}} ...")
        return 1
    return cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main() or 0)
