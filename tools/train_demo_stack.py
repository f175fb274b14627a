"""Train the bundled demo stack until the fused output dominates both
components (VERDICT r2 next-step #1).

Stage A: AdaCoF with the published config (Charb + 0.01 g_Spatial +
         0.005 g_Occlusion, ADAMax lr 1e-3, staircase x0.5 decay —
         reference src/adacof/train.py:31,39, utility.py:47-58) on the
         continuously-jittered mixed-regime synthetic stream.
Stage B: FusionNet (plain L1, Adam — fusion_net/trainer.py:254) against the
         frozen published PhaseNet + the stage-A AdaCoF.

Per-regime PSNR probes (256x256, held-out seeds) are logged every probe_every
steps; final weights land in checkpoints/*.msgpack only when promoted by
tools/eval_demo_stack.py.

Run ON TPU (axon): env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/train_demo_stack.py --stage a --steps 40000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--stage", choices=["a", "b"], required=True)
parser.add_argument("--steps", type=int, default=40000)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--crop", type=int, default=256)
parser.add_argument("--pool", type=int, default=768)
parser.add_argument("--pool_h", type=int, default=288,
                    help="scene height of the synthetic pool (crop <= this)")
parser.add_argument("--pool_w", type=int, default=448)
parser.add_argument("--lr", type=float, default=0.0, help="0 = stage default")
parser.add_argument("--decay_steps", type=int, default=10000)
parser.add_argument("--out", default="runs/demo_stack")
parser.add_argument("--adacof_init", default="", help="stage a warm start / stage b frozen adacof (msgpack)")
parser.add_argument("--fusion_init", default="",
                    help="stage b warm start (fusion_net .pt or .msgpack, e.g. "
                    "the converted published fusion_net.pt)")
parser.add_argument("--probe_every", type=int, default=2000)
parser.add_argument("--save_every", type=int, default=2000)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--resume_state", default="", help="full TrainState msgpack (exact resume incl. optimizer)")
parser.add_argument("--loss_balance", action="store_true",
                    help="stage b: per-sample-balanced L1 (equalizes regime "
                    "gradients on the mixed synthetic diet; TrainState pytree "
                    "unchanged, exact resume across the flag works)")
parser.add_argument("--loss_psnr", action="store_true",
                    help="stage b: per-sample log-MSE loss (= mean negative "
                    "PSNR, the eval criterion); self-balancing and with a "
                    "vanishing gradient at convergence, unlike L1's "
                    "sign-gradient plateau (TrainState unchanged, exact "
                    "resume across the flag)")
parser.add_argument("--fusion_variant", type=int, default=0, choices=[0, 1, 2],
                    help="stage b: FusionNet head variant (2 = gated-blend "
                    "head: per-pixel softmax selection over {base, adacof, "
                    "phase} + confidence-muted residual; warm starts from a "
                    "variant-0 msgpack keep every layer except the reshaped "
                    "final 1x1 conv)")
parser.add_argument("--distill", type=float, default=0.0,
                    help="stage b: weight of the per-sample best-component "
                    "teacher term (anneal to 0 in a final GT-only leg; "
                    "TrainState unchanged, exact resume across the flag)")
parser.add_argument("--spot_every", type=int, default=0,
                    help="stage b: every N steps run a 512^2 spot-probe on "
                    "the binding regimes (bright/step1/photo) and log the "
                    "delta vs the frozen components AT EVAL SCALE — the "
                    "256^2 probe alone let legs 'improve' while the 512^2 "
                    "criterion stayed short (VERDICT r4). 0 = off")
parser.add_argument("--photo_frac", type=float, default=0.0,
                    help="fraction of pool scenes drawn from the natural-"
                    "photo sources (synth.natural_video) instead of value-"
                    "noise textures, same continuous regime jitter")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: supervisor restarts (and CPU fallback runs,
# where the fusion train-step compile alone is >20 min) skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/fmvfi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from fmvfi_tpu.eval import synth
from fmvfi_tpu.train.data import MixedSynthStream, batch_iterator
from fmvfi_tpu.train import trainer as T
from fmvfi_tpu.utils.checkpoint import load_msgpack, save_msgpack
from fmvfi_tpu.models.adacof import AdaCoFNet
from fmvfi_tpu.utils.convert import load_adacof_weights, phase_net_from_torch

os.makedirs(args.out, exist_ok=True)
log_path = os.path.join(args.out, f"stage_{args.stage}_log.jsonl")
log_f = open(log_path, "a")


def log(rec):
    rec["time"] = time.time()
    log_f.write(json.dumps(rec) + "\n")
    log_f.flush()


def psnr(a, b):
    return float(-10 * np.log10(max(np.mean((np.asarray(a) - np.asarray(b)) ** 2), 1e-12)))


# ---- held-out probes: one triplet per regime, NOT in the training stream
def probe_triplets(s=256):
    out = {}
    f = synth.translation_triplet(s, s, dx=8.0, dy=2.0, seed=9001)
    out["translation4"] = f
    f = synth.translation_triplet(s, s, dx=4.0, dy=0.0, seed=9002)
    out["translation2"] = f
    v = synth.large_motion_video(3, s, s, step=24.0, seed=9003)
    out["large24"] = (v[0], v[1], v[2])
    v = synth.rotation_video(3, s, s, deg_per_frame=1.5, seed=9004)
    out["rot1.5"] = (v[0], v[1], v[2])
    v = synth.zoom_video(3, s, s, scale_per_frame=1.02, seed=9005)
    out["zoom1.02"] = (v[0], v[1], v[2])
    v = synth.occlusion_video(3, s, s, fg_step=6.0, bg_step=-2.0, seed=9006)
    out["occl"] = (v[0], v[1], v[2])
    v = synth.brightness_video(3, s, s, step=2.0, seed=9007)
    out["bright"] = (v[0], v[1], v[2])
    # MID- and LATE-ramp brightness triplets: the r5 leg-B eval regressed
    # brightness 6.5 dB while every ramp-START probe (incl. the 512^2
    # spot) stayed within margin.  The per-triplet curves
    # (results_r5/result_brightness@s0_*) localize the failure to the
    # MIDDLE of the 0.93^t ramp (t=3-6, gain ~0.65-0.8), where AdaCoF is
    # still at ~47 dB but the gate stops selecting it (~25 dB); at the
    # ramp tail both components are weak and fusion WINS.  Same generator
    # as the eval sets, held-out seeds.
    v = synth.brightness_video(11, s, s, step=2.0, seed=9009)
    out["bright_mid"] = (v[3], v[4], v[5])
    out["bright_late"] = (v[8], v[9], v[10])
    v = synth.translation_video(3, s, s, step=1.0, seed=9008)
    out["step1"] = (v[0], v[1], v[2])
    # the natural-statistics set IS in the dominance criterion (the r4 photo
    # gap, fusion -7.2 dB vs phase, was invisible to a probe without it)
    v = synth.photo_video(3, s, s, seed=9011)
    out["photo"] = (v[0], v[1], v[2])
    return out


PROBES = probe_triplets()


def spot_triplets(s=512):
    """Held-out 512^2 triplets for the binding criterion regimes (seeds
    disjoint from both the training stream and the eval suite)."""
    out = {}
    v = synth.brightness_video(3, s, s, step=2.0, seed=9107)
    out["bright512"] = (v[0], v[1], v[2])
    v = synth.brightness_video(11, s, s, step=2.0, seed=9109)
    out["bright512_mid"] = (v[3], v[4], v[5])
    out["bright512_late"] = (v[8], v[9], v[10])
    v = synth.translation_video(3, s, s, step=1.0, seed=9108)
    out["step1_512"] = (v[0], v[1], v[2])
    v = synth.photo_video(3, s, s, seed=9111)
    out["photo512"] = (v[0], v[1], v[2])
    return out

print(f"[{args.stage}] generating {args.pool}-scene mixed stream...", flush=True)
t0 = time.time()
# v2: large-motion regime magnitude fix in MixedSynthStream (dx no longer
# scaled by cos(angle)) — a v1 pool must not be reused
# v3: brightness scenes get a random ABSOLUTE starting gain (0.55-1.0) so
# the eval's mid-ramp luminance states are inside the training support
size_tag = (
    "" if (args.pool_h, args.pool_w) == (288, 448)
    else f"_{args.pool_h}x{args.pool_w}"
)
photo_tag = f"_p{args.photo_frac:g}" if args.photo_frac > 0 else ""
cache = os.path.join(args.out, f"pool_{args.pool}{size_tag}{photo_tag}_v3.npy")
if os.path.exists(cache):
    ds = MixedSynthStream.__new__(MixedSynthStream)
    ds._items = list(np.load(cache))
else:
    ds = MixedSynthStream(n=args.pool, h=args.pool_h, w=args.pool_w, seed0=1000,
                          photo_frac=args.photo_frac)
    np.save(cache, np.stack(ds._items))
print(f"pool ready in {time.time()-t0:.1f}s", flush=True)

rng = jax.random.key(0)

def u8_batches(pool, batch, crop, seed):
    """u8 crop/flip/time-reversal batches — normalization happens ON DEVICE
    (u8 transfer is 1.7x faster per step over the axon tunnel than f32,
    tools/diag_train_step.py)."""
    rng = np.random.default_rng(seed)
    n = len(pool)
    while True:
        f1s, mids, f2s = [], [], []
        for _ in range(batch):
            v = pool[int(rng.integers(0, n))]  # (3, H, W, 3) u8
            H, W = v.shape[1:3]
            y = int(rng.integers(0, H - crop + 1))
            x = int(rng.integers(0, W - crop + 1))
            tri = v[:, y : y + crop, x : x + crop]
            if rng.random() < 0.5:
                tri = tri[:, :, ::-1]
            if rng.random() < 0.5:
                tri = tri[:, ::-1]
            if rng.random() < 0.5:
                tri = tri[::-1]
            f1s.append(tri[0])
            mids.append(tri[1])
            f2s.append(tri[2])
        yield (
            np.ascontiguousarray(np.stack(f1s)),
            np.ascontiguousarray(np.stack(mids)),
            np.ascontiguousarray(np.stack(f2s)),
        )


def wrap_u8(step):
    return jax.jit(
        lambda s, b: step(
            s, tuple(x.astype(jnp.float32) / 255.0 for x in b)
        ),
        donate_argnums=0,
    )


if args.stage == "a":
    state, step = T.make_adacof_trainer(
        rng, args.crop, args.crop, kernel_size=5, dilation=1,
        lr=args.lr or 1e-3, lr_decay_steps=args.decay_steps,
    )
    if args.adacof_init:
        init = load_adacof_weights(args.adacof_init)
        state = state._replace(params=init["params"])

    jstep = wrap_u8(step)

    model = AdaCoFNet(kernel_size=5, dilation=1)
    japply = jax.jit(
        lambda p, a, b: model.apply(p, a, b).blended
    )

    def run_probe(st):
        vals = {}
        for name, (f1, mid, f2) in PROBES.items():
            pred = japply(
                {"params": st.params}, jnp.asarray(f1)[None], jnp.asarray(f2)[None]
            )
            vals[name] = round(psnr(pred[0], mid), 2)
        return vals, {}

    def save(st, tag):
        save_msgpack(
            os.path.join(args.out, f"adacof_{tag}.msgpack"),
            {"params": jax.device_get(st.params)},
        )

else:
    phase_vars = phase_net_from_torch("/root/reference/src/phase_net/phase_net.pt")
    ada_path = args.adacof_init or os.path.join(args.out, "adacof_latest.msgpack")
    adacof_vars = load_adacof_weights(ada_path)
    print(f"frozen adacof: {ada_path}", flush=True)
    state, step = T.make_fusion_trainer(
        rng, args.crop, args.crop, phase_vars, adacof_vars,
        kernel_size=5, dilation=1, lr=args.lr or 1e-4,
        loss_balance=args.loss_balance, distill=args.distill,
        loss_psnr=args.loss_psnr, variant=args.fusion_variant,
    )
    if args.fusion_init:
        from fmvfi_tpu.utils.convert import (
            load_fusion_weights,
            merge_matching_params,
        )

        init = load_fusion_weights(args.fusion_init)
        # cross-variant warm start: keep every loaded layer whose shape
        # matches the freshly-initialized tree (a variant-2 net warm-started
        # from a variant-0 msgpack keeps all but the reshaped dec2 1x1 conv)
        merged, fresh = merge_matching_params(state.params, init["params"])
        state = state._replace(params=merged)
        print(f"fusion warm start: {args.fusion_init}"
              + (f" (fresh: {fresh})" if fresh else ""), flush=True)
    jstep = wrap_u8(step)

    from fmvfi_tpu.pipeline.interpolate import (
        FusionWeights,
        adacof_interpolate,
        fusion_interpolate,
        phase_interpolate,
    )

    jfusion = jax.jit(
        lambda fp, a, b: fusion_interpolate(
            FusionWeights(phase_vars, adacof_vars, {"params": fp}), a, b,
            variant=args.fusion_variant,
        )
    )
    jphase = jax.jit(lambda a, b: phase_interpolate(phase_vars, a, b))
    jada = jax.jit(lambda a, b: adacof_interpolate(adacof_vars, a, b))

    def _component_best(triplets):
        """Per-regime max(phase, adacof) PSNR — the criterion's reference
        quantity (computed ONCE; the components are frozen all stage)."""
        best = {}
        for name, (f1, mid, f2) in triplets.items():
            a, b = jnp.asarray(f1)[None], jnp.asarray(f2)[None]
            best[name] = round(
                max(psnr(jphase(a, b)[0], mid), psnr(jada(a, b)[0], mid)), 2
            )
        return best

    print("[b] probing frozen components (criterion reference)...", flush=True)
    COMP_BEST = _component_best(PROBES)
    print(f"component best per regime: {COMP_BEST}", flush=True)
    SPOTS = spot_triplets() if args.spot_every else {}
    SPOT_BEST = None  # lazily computed at the first spot probe

    def run_probe(st):
        """Probe PSNR per regime PLUS the criterion's quantity: delta vs the
        frozen best component (VERDICT r4 #3 — legs were steered by raw
        mean while the pass/fail margin is per-regime delta)."""
        vals, deltas = {}, {}
        for name, (f1, mid, f2) in PROBES.items():
            pred = jfusion(st.params, jnp.asarray(f1)[None], jnp.asarray(f2)[None])
            vals[name] = round(psnr(pred[0], mid), 2)
            deltas[name] = round(vals[name] - COMP_BEST[name], 2)
        return vals, deltas

    def run_spot(st):
        global SPOT_BEST
        if SPOT_BEST is None:
            print("[b] probing components at 512^2 (one-time)...", flush=True)
            SPOT_BEST = _component_best(SPOTS)
            log({"spot_component_best": SPOT_BEST})
        vals, deltas = {}, {}
        for name, (f1, mid, f2) in SPOTS.items():
            pred = jfusion(st.params, jnp.asarray(f1)[None], jnp.asarray(f2)[None])
            vals[name] = round(psnr(pred[0], mid), 2)
            deltas[name] = round(vals[name] - SPOT_BEST[name], 2)
        return vals, deltas

    def save(st, tag):
        save_msgpack(
            os.path.join(args.out, f"fusion_{tag}.msgpack"),
            {"params": jax.device_get(st.params)},
        )


from flax import serialization

state_path = os.path.join(args.out, f"state_{args.stage}_latest.msgpack")
if args.resume_state:
    with open(args.resume_state, "rb") as f:
        state = serialization.from_bytes(state, f.read())
    print(f"resumed full TrainState from {args.resume_state}", flush=True)


def save_state(st, tag="latest"):
    path = (state_path if tag == "latest"
            else os.path.join(args.out, f"state_{args.stage}_{tag}.msgpack"))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(st)))
    os.replace(tmp, path)


# A supervised restart resumes at the TrainState's absolute step: it runs
# only the REMAINING budget (not args.steps again) and offsets the stream
# seed so the early batches are not replayed.  Logged steps stay absolute.
start_step = int(jax.device_get(state.step)) if args.resume_state else 0
if start_step >= args.steps:
    print(f"resumed at step {start_step} >= target {args.steps}; done",
          flush=True)
    sys.exit(0)
if start_step:
    print(f"continuing from absolute step {start_step}", flush=True)
batches = u8_batches(ds._items, args.batch, args.crop, seed=7 + start_step)
t_start = time.time()
losses = []

MARGIN = 0.2  # the dominance margin (eval_demo_stack --margin default)


def probe_key(vals, deltas):
    """Checkpoint-selection key, ordered by distance to the DOMINANCE
    criterion (VERDICT r4 #3: raw probe mean let legs 'improve' while the
    binding per-regime margins stayed short).  Primary: mean shortfall below
    the margin, 0 when every regime is within 0.2 dB of its best component;
    tie-break: raw mean PSNR (the criterion's strictly-best-mean clause).
    Stage a has no components — deltas is empty and the key is mean-only."""
    mean = float(np.mean(list(vals.values())))
    if not deltas:
        return (0.0, mean)
    crit = float(np.mean([min(d + MARGIN, 0.0) for d in deltas.values()]))
    return (round(crit, 4), round(mean, 3))


best_key = (-float("inf"), -float("inf"))
# restarts must not clobber a better best-checkpoint from a previous attempt.
# Only records probing the SAME regime set are comparable: when a probe
# regime is added (e.g. bright_late in r5), the mean shifts by construction
# and an old-bar comparison would freeze fusion_best for the whole leg.
if os.path.exists(log_path):
    probe_keyset = set(PROBES)
    with open(log_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if "probe_mean" in r and set(r.get("probe", ())) == probe_keyset:
                # pre-r5 records carry no probe_crit; rank them mean-only
                # below any criterion-scored record of equal mean
                k = (r.get("probe_crit", -999.0), r["probe_mean"])
                best_key = max(best_key, k)
nonfinite_windows = 0
last_window_finite = True  # gate on checkpoint writes
for k, batch in enumerate(batches):
    i = start_step + k
    if i >= args.steps:
        break
    batch = tuple(jnp.asarray(x) for x in batch)
    state, metrics = jstep(state, batch)
    losses.append(metrics["loss"])
    if (i + 1) % 100 == 0:
        lv = float(jnp.mean(jnp.stack([jnp.asarray(x) for x in losses[-100:]])))
        rate = (k + 1) / (time.time() - t_start)
        log({"step": i + 1, "loss": lv, "steps_per_s": round(rate, 3)})
        print(f"step {i+1} loss {lv:.5f} ({rate:.2f} it/s)", flush=True)
        last_window_finite = bool(np.isfinite(lv))
        if not last_window_finite:
            nonfinite_windows += 1
            print("WARNING: non-finite loss window — updates are being "
                  "skipped (apply_if_finite); params remain at the last "
                  "finite point", flush=True)
            # A healthy-params forward producing inf means the device state
            # is corrupted (observed when a second axon client shares the
            # chip).  Exit so a supervisor can restart from state_*_latest.
            if nonfinite_windows >= 3:
                log({"step": i + 1, "abort": "persistent non-finite loss"})
                print("ABORT: persistent non-finite loss — device state "
                      "suspect; restart from the latest state checkpoint",
                      flush=True)
                sys.exit(3)
        else:
            nonfinite_windows = 0
    if (i + 1) % args.probe_every == 0:
        vals, deltas = run_probe(state)
        key = probe_key(vals, deltas)
        rec = {"step": i + 1, "probe": vals, "probe_mean": key[1]}
        msg = f"probe @{i+1}: mean {key[1]:.2f}"
        if deltas:
            rec["delta_vs_best"] = deltas
            rec["probe_crit"] = key[0]
            msg += f" crit {key[0]:+.3f} delta {deltas}"
        log(rec)
        print(f"{msg} {vals}", flush=True)
        if key > best_key and last_window_finite:
            best_key = key
            save(state, "best")
            save_state(state, "best")
            log({"step": i + 1, "best_key": list(key)})
    if (args.spot_every and args.stage == "b"
            and (i + 1) % args.spot_every == 0):
        svals, sdeltas = run_spot(state)
        log({"step": i + 1, "spot": svals, "spot_delta": sdeltas})
        print(f"spot512 @{i+1}: {svals} delta {sdeltas}", flush=True)
    if (i + 1) % args.save_every == 0 and last_window_finite:
        # NEVER checkpoint during a non-finite era: the r3 restart loop was
        # caused by state_latest being saved after poisoning, making every
        # supervised resume start from garbage.
        save(state, "latest")
        save_state(state)

if last_window_finite:
    save(state, "latest")
    save_state(state)
save(state, "final")
vals, deltas = run_probe(state)
rec = {"step": args.steps, "probe": vals, "final": True}
if deltas:
    rec["delta_vs_best"] = deltas
    rec["probe_crit"] = probe_key(vals, deltas)[0]
log(rec)
print(f"FINAL probe: {vals}" + (f" delta {deltas}" if deltas else ""),
      flush=True)
