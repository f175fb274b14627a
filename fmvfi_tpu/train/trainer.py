"""Training steps for the three regimes, as pure jittable functions.

Functional redesign of the reference's three trainers:
- PhaseNet  (/root/reference/src/train/trainer.py:111-165): Adam, loss =
  L1(lab image) + 0.005 * circular phase loss vs the target's decomposition
  (the target frame rides through the SAME pyramid pass as the inputs,
  trainer.py:94-104).
- AdaCoF    (/root/reference/src/adacof/trainer.py:36-54): spec-string loss
  (default '1*Charb+0.01*g_Spatial+0.005*g_Occlusion'), ADAMax.
- FusionNet (/root/reference/src/fusion_net/trainer.py:222-292): plain L1 on
  the fused output; PhaseNet and AdaCoF frozen (stop_gradient), only
  FusionNet parameters receive gradients.

Each `make_*_step` returns `(init_state, step_fn)` where step_fn is pure:
`state, metrics = step_fn(state, batch)` — jit it directly, or wrap with
`parallel.dp.data_parallel` to shard the batch across a mesh (XLA inserts the
gradient all-reduce; the reference had no multi-device story at all).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.adacof import AdaCoFNet, smoothness_penalties
from ..models.fusion_net import FusionNet
from ..models.phase_net import PhaseNetCore, normalize_inputs, predictions_to_decomp
from ..ops import decomp as dec_ops
from ..ops.color import rgb_to_lab
from ..ops.pyramid import decompose, make_filters, max_pyr_height, reconstruct
from ..pipeline.interpolate import FusionWeights, _to_chan_batch, fusion_interpolate
from .losses import LossSpec, charbonnier, l1, phase_net_loss


class TrainState(NamedTuple):
    params: Any
    extra: Any  # batch_stats for BN models, None otherwise
    opt_state: Any
    step: jnp.ndarray


def _init_state(params, extra, tx) -> TrainState:
    return TrainState(params, extra, tx.init(params), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------- PhaseNet


def make_phase_trainer(
    rng,
    h: int,
    w: int,
    lr: float = 1e-3,
    height: Optional[int] = None,
    weighting_factor: float = 0.005,
    mode: str = "phase",
    model_variant: int = 0,
    adacof_vars=None,
    kernel_size: int = 5,
    dilation: int = 1,
    high_level: bool = False,
):
    """PhaseNet training on (frame1, target, frame2) RGB NHWC triplets.

    mode='phase': num_img=2 (inputs f1, f2).
    mode='fusion': frozen AdaCoF provides side inputs (train/trainer.py:78-99);
      model_variant 0 -> num_img=4 (f1, f2, ada_warped1, ada_warped2),
      model_variant 1 -> num_img=3 (f1, f2, ada_blended).
    high_level=True: the reconstruction carries AdaCoF's highpass residual
      instead of PhaseNet's zeros (architecture.py:64-66, --high_level at
      train/train.py:46) — the Lab-converted AdaCoF prediction rides through
      the same pyramid pass and donates its `high` band.
    The target frame rides through the SAME pyramid pass (trainer.py:94-104).

    Note: the reference's shipped trainer calls its model without threading the
    target through (train/trainer.py:109 / architecture.py:41), which would
    mis-group separate_vals and crash get_loss — unrunnable as shipped; this
    is the evidently intended behavior.

    Returns (state, step_fn, eval_fn, make_step) where make_step(m) builds a
    hierarchical-training step predicting only the m coarsest levels, with the
    remaining fine levels exchanged in from the target
    (architecture.py:59-61, exchange range [0, height-m))."""
    height = height or max_pyr_height(h, w)
    filters = make_filters(h, w, height)
    num_img = {"phase": 2, "fusion": 4 if model_variant == 0 else 3}[mode]
    if mode == "fusion" or high_level:
        assert adacof_vars is not None, (
            "fusion/high_level phase-training needs AdaCoF weights"
        )
        adacof = AdaCoFNet(kernel_size=kernel_size, dilation=dilation)
    core = PhaseNetCore(num_img=num_img)
    tx = optax.adam(lr)

    # init by tracing one forward at the real height
    dummy = jnp.zeros((3, h, w))
    vals = decompose(dummy, filters)
    low, phases, amps = dec_ops.concat_for_net([vals] * num_img)
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    variables = core.init(rng, lown, pn, an)
    state = _init_state(variables["params"], variables["batch_stats"], tx)

    def forward(params, batch_stats, f1, f2, target, train: bool):
        groups = [
            _to_chan_batch(rgb_to_lab(f1)),
            _to_chan_batch(rgb_to_lab(f2)),
        ]
        ada = None
        if mode == "fusion" or high_level:
            ada = adacof.apply(jax.lax.stop_gradient(adacof_vars), f1, f2)
        if mode == "fusion":
            if model_variant == 0:
                groups.append(_to_chan_batch(rgb_to_lab(ada.warped0)))
                groups.append(_to_chan_batch(rgb_to_lab(ada.warped2)))
            else:
                groups.append(_to_chan_batch(rgb_to_lab(ada.blended)))
        labt = _to_chan_batch(rgb_to_lab(target))
        groups.append(labt)
        if high_level:
            # AdaCoF prediction decomposed in the SAME pass; only its highpass
            # band is consumed (architecture.py:64-66)
            groups.append(_to_chan_batch(rgb_to_lab(ada.blended)))
        # one pyramid pass for inputs AND target
        vals = decompose(jnp.concatenate(groups, 0), filters)
        parts = dec_ops.split_frames(vals, len(groups))
        if high_level:
            v_ada = parts[-1]
            parts = parts[:-1]
        vt = parts[-1]
        low, phases, amps = dec_ops.concat_for_net(parts[:-1])
        lown, pn, an, norm = normalize_inputs(low, phases, amps)
        out, updates = core.apply(
            {"params": params, "batch_stats": batch_stats},
            lown,
            pn,
            an,
            train=train,
            mutable=["batch_stats"] if train else [],
        )
        lo, pp, ap = out
        high = (
            jax.lax.stop_gradient(v_ada.high)
            if high_level
            else jnp.zeros_like(vt.high)
        )
        dec = predictions_to_decomp(lo, pp, ap, norm, high)
        new_stats = updates.get("batch_stats", batch_stats) if train else batch_stats
        return labt, dec, vt, new_stats

    def make_step(m: Optional[int] = None):
        """Build a step; hierarchical training exchanges the finest
        [0, height - m) prediction levels with the target's decomposition
        before reconstructing (architecture.py:59-61), so gradients focus on
        the m coarsest levels."""
        ex_end = 0 if m is None else min(max(height - m, 0), height - 2)

        def loss_fn(params, batch_stats, batch):
            f1, target, f2 = batch
            labt, dec, vt, new_stats = forward(
                params, batch_stats, f1, f2, target, train=True
            )
            if ex_end > 0:
                dec = dec_ops.exchange_levels(dec, vt, 0, ex_end)
            pred_img = reconstruct(dec, filters)
            total, parts = phase_net_loss(pred_img, labt, dec, vt, weighting_factor)
            return total, (parts, new_stats)

        def step_fn(state: TrainState, batch):
            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.extra, batch)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, **parts}
            return TrainState(params, new_stats, opt_state, state.step + 1), metrics

        return step_fn

    step_fn = make_step(None)

    def eval_fn(state: TrainState, f1, f2):
        assert mode == "phase", "eval_fn is the 2-frame (phase-mode) path"
        lab1 = _to_chan_batch(rgb_to_lab(f1))
        lab2 = _to_chan_batch(rgb_to_lab(f2))
        vals = decompose(jnp.concatenate([lab1, lab2], 0), filters)
        v1, v2 = dec_ops.split_frames(vals, 2)
        low, phases, amps = dec_ops.concat_for_net([v1, v2])
        lown, pn, an, norm = normalize_inputs(low, phases, amps)
        lo, pp, ap = core.apply(
            {"params": state.params, "batch_stats": state.extra}, lown, pn, an
        )
        dec = predictions_to_decomp(lo, pp, ap, norm, jnp.zeros_like(v1.high))
        return reconstruct(dec, filters)

    return state, step_fn, eval_fn, make_step


# ---------------------------------------------------------------- AdaCoF


def make_adacof_trainer(
    rng,
    h: int,
    w: int,
    kernel_size: int = 5,
    dilation: int = 1,
    lr: float = 1e-3,
    loss_spec: Optional[LossSpec] = None,
    optimizer: str = "adamax",
    lr_decay_steps: Optional[int] = None,
    lr_decay_rate: float = 0.5,
    vgg_checkpoint: str = "",
    grad_clip: float = 1.0,
    use_pallas: Optional[bool] = None,
    spatial_mesh=None,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
):
    """AdaCoF training (config of the published checkpoints: Vimeo90k,
    ADAMax lr 1e-3, loss 1*Charb+0.01*g_Spatial+0.005*g_Occlusion).

    - `lr_decay_steps`: step-decay schedule x`lr_decay_rate` every N steps,
      reproducing make_scheduler (adacof/utility.py:47-58, StepLR gamma=0.5
      every 20 epochs — pass epochs_to_steps(20) here).
    - `grad_clip` (> 0): global-norm gradient clipping + skip-if-nonfinite
      (optax.apply_if_finite).  Long synthetic-diet runs hit a rare batch
      whose gradient is inf, which permanently poisons the optimizer state
      (observed at step ~12.4k in the round-3 demo run); the reference never
      trained long enough on such data to need this.  0 disables (exact
      reference optimizer).
    - VGG term (losses/__init__.py:22-24): perceptual conv4_3 MSE, gated on a
      user-supplied torchvision vgg16 checkpoint (no network egress).
    - GAN-family terms (losses/__init__.py:25-30): the Adversarial state
      (inner critic optimizer) rides in TrainState.extra and updates once per
      step, as the reference's hidden per-call update does."""
    from .adversarial import Adversarial
    from .losses import gan_terms, has_term, parse_loss_spec

    spec = loss_spec or parse_loss_spec("1*Charb+0.01*g_Spatial+0.005*g_Occlusion")
    # use_pallas=False for spatially-sharded training (the Pallas warp is a
    # single-device program; parallel.spatial.adacof_spatial_trainer sets it
    # together with spatial_mesh, which routes the warp through the
    # halo-exchange shard_map instead of the SPMD gather)
    model = AdaCoFNet(
        kernel_size=kernel_size, dilation=dilation, use_pallas=use_pallas,
        spatial_mesh=spatial_mesh, batch_axis=batch_axis,
        spatial_axis=spatial_axis,
    )
    schedule = (
        optax.exponential_decay(
            lr, lr_decay_steps, lr_decay_rate, staircase=True
        )
        if lr_decay_steps
        else lr
    )
    tx = {"adam": optax.adam, "adamax": optax.adamax, "sgd": optax.sgd}[optimizer](
        schedule
    )
    if grad_clip:
        tx = optax.apply_if_finite(
            optax.chain(optax.clip_by_global_norm(grad_clip), tx),
            max_consecutive_errors=100_000,
        )
    dummy = jnp.zeros((1, h, w, 3))
    variables = model.init(rng, dummy, dummy)

    vgg_loss = None
    if has_term(spec, "VGG"):
        from .vgg import VGGLoss

        if not vgg_checkpoint:
            raise ValueError(
                "loss spec contains VGG: pass vgg_checkpoint= (a torchvision "
                "vgg16 state dict; this offline build cannot download one)"
            )
        vgg_loss = VGGLoss(vgg_checkpoint)

    gans = gan_terms(spec)
    if len(gans) > 1:
        raise ValueError(f"at most one adversarial term per spec, got {gans}")
    adv = None
    adv_state = None
    if gans:
        rng, sub = jax.random.split(rng)
        adv = Adversarial(gans[0][1], sub, patch_size=(h, w))
        adv_state = adv.init_state()

    state = _init_state(variables["params"], adv_state, tx)

    def loss_fn(params, adv_state, batch):
        f1, target, f2 = batch
        out = model.apply({"params": params}, f1, f2)
        w1, a1, b1, w2, a2, b2 = out.heads
        g_spatial, g_occ = smoothness_penalties(w1, a1, b1, w2, a2, b2, out.occ_raw)
        values = {
            "Charb": charbonnier(out.blended, target),
            "L1": l1(out.blended, target),
            "MSE": jnp.mean((out.blended - target) ** 2),
            "g_Spatial": g_spatial,
            "g_Occlusion": g_occ,
        }
        new_adv = adv_state
        if vgg_loss is not None:
            values["VGG"] = vgg_loss(out.blended, target)
        if adv is not None:
            g_loss, new_adv, d_metrics = adv.step(
                adv_state, out.blended, target, (f1, f2)
            )
            values[gans[0][1]] = g_loss
            values["d_loss"] = d_metrics["d_loss"]
        return spec(values), (values, new_adv)

    def step_fn(state: TrainState, batch):
        (loss, (values, new_adv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.extra, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **values}
        return TrainState(params, new_adv, opt_state, state.step + 1), metrics

    return state, step_fn


# ---------------------------------------------------------------- FusionNet


def make_fusion_trainer(
    rng,
    h: int,
    w: int,
    phase_vars,
    adacof_vars,
    kernel_size: int = 5,
    dilation: int = 1,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    spatial_mesh=None,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
    variant: int = 0,
    uncertainty_maps: int = 3,
    loss_balance: bool = False,
    distill: float = 0.0,
    loss_psnr: bool = False,
):
    """FusionNet training: frozen PhaseNet + AdaCoF produce the pipeline
    inputs; only FusionNet trains, plain L1 (fusion_net/trainer.py:254).

    `loss_balance=True` (beyond-reference, opt-in) normalizes each sample's
    L1 by its own stop-gradient magnitude (weight 1/(l1+1e-3), renormalized)
    before reducing.  On a multi-regime diet the plain batch L1 is dominated
    by hard samples (large motion, L1 ~ 0.1) and near-degenerate samples
    (L1 ~ 0.004, where one frozen component is near-perfect and the fused
    output must TRACK it to 45+ dB) get ~30x less gradient; balancing
    equalizes them.  The reported "loss" metric stays the plain L1 either
    way, so runs are comparable across modes.  The reference trains on real
    video with plain L1 only — this flag exists for synthetic multi-regime
    diets, off by default.

    `distill>0` (beyond-reference, opt-in) adds `distill * L(pred, teacher)`
    where the teacher is, per sample, the frozen component (AdaCoF or
    PhaseNet prediction) closer to the ground truth.  Minimizing plain L1 to
    GT alone converges extremely slowly toward TRACKING a near-degenerate
    component (the fused output must reproduce a 45+ dB prediction
    detail-for-detail); the teacher term is a shortcut into that basin.
    The term is GATED per sample: it is active only while the teacher is
    strictly better than the current prediction (stop-gradient comparison),
    so it ratchets the fused output up to the better component and then
    vanishes — it never pulls a sample whose fused output already beats
    both components back toward them, and no anneal-to-zero leg is needed.
    The comparison metric matches the optimized criterion: L1 in the
    default mode, per-sample MSE under `loss_psnr` (where the teacher
    term is log-MSE floored at 1e-6 so its gradient cannot blow up and
    saturate the global-norm clip as pred approaches the teacher).
    The reported "loss" metric stays the plain L1.  TrainState is
    unchanged, so exact resumes work across the flag.

    `loss_psnr=True` (beyond-reference, opt-in) replaces the per-sample term
    with log(MSE + 1e-8) — i.e. it minimizes mean per-sample negative PSNR,
    the evaluation criterion itself.  Two properties matter on a
    multi-regime diet near convergence: the 1/MSE weighting equalizes
    regimes automatically (stronger than `loss_balance`), and the gradient
    VANISHES as a sample converges, unlike L1's constant-magnitude sign
    gradient whose Adam stationary jitter caps per-sample PSNR at a
    lr-dependent plateau.  The reported "loss" stays plain L1; TrainState
    is unchanged, so exact resumes work across the flag.

    `variant`/`uncertainty_maps` select the published-checkpoint modes
    (fusion_net.py:69-77, fusion_net/train.py:79): (1, 3) trains the
    phase-residual `fusion_net_phase.pt` architecture, (0, 0) the no-maps
    `fusion_net_nouncertainty.pt` ablation.

    `spatial_mesh`: a 2-D (data x spatial) Mesh threads through to
    fusion_interpolate so the forward runs batch- AND height-sharded (the
    FFT sections stay pinned to batch sharding); jit the returned step with
    explicit shardings via parallel.spatial.fusion_spatial_trainer."""
    if loss_psnr and loss_balance:
        # log-MSE is already self-balancing (1/MSE weighting is implicit in
        # d/dx log); stacking 1/(L1) weights on the NEGATIVE log values
        # inverts the intent — the largest weight lands on the already-
        # converged samples (advisor r3, medium).
        raise ValueError(
            "loss_psnr and loss_balance are mutually exclusive: per-sample "
            "log-MSE is self-balancing, and 1/L1 weighting applied to "
            "negative log values would up-weight converged samples instead "
            "of lagging ones"
        )
    fusion = FusionNet(uncertainty_maps=uncertainty_maps)
    z3 = jnp.zeros((1, h, w, 3))
    fvars = fusion.init(
        rng, z3, z3, z3, jnp.zeros((1, h, w, 6)),
        jnp.zeros((1, h, w, uncertainty_maps)) if uncertainty_maps else None,
        variant,
    )
    tx = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr)
    )
    # same divergence protection as make_adacof_trainer (rare inf-gradient
    # batches on long synthetic-diet runs poison the optimizer state)
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), tx),
        max_consecutive_errors=100_000,
    )
    state = _init_state(fvars["params"], None, tx)
    frozen_phase = jax.lax.stop_gradient(phase_vars)
    frozen_ada = jax.lax.stop_gradient(adacof_vars)

    def loss_fn(fparams, batch):
        f1, target, f2 = batch
        weights = FusionWeights(
            phase_net=frozen_phase,
            adacof=frozen_ada,
            fusion_net={"params": fparams},
        )
        pred = fusion_interpolate(
            weights, f1, f2, kernel_size=kernel_size, dilation=dilation,
            spatial_mesh=spatial_mesh, batch_axis=batch_axis,
            spatial_axis=spatial_axis,
            variant=variant, uncertainty_maps=uncertainty_maps,
            return_parts=bool(distill),
        )
        if distill:
            pred, parts = pred
        per = jnp.mean(jnp.abs(pred - target), axis=(1, 2, 3))
        plain = jnp.mean(per)
        if loss_psnr:
            mse_pred = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
            total = jnp.log(mse_pred + 1e-8)
        else:
            total = per
        if distill:
            # per-sample teacher = the frozen component closer to GT; both
            # are functions of frozen weights only (no grad to fparams)
            ada = jax.lax.stop_gradient(parts["adacof"])
            ph = jax.lax.stop_gradient(parts["phase"])
            if loss_psnr:
                # teacher selection AND gate use per-sample MSE so the gate
                # metric matches the optimized/evaluated criterion — an
                # L1 gate could keep pulling a sample that already beats
                # the teacher in PSNR (advisor r3)
                m_ada = jnp.mean((ada - target) ** 2, axis=(1, 2, 3))
                m_ph = jnp.mean((ph - target) ** 2, axis=(1, 2, 3))
                teacher = jnp.where(
                    (m_ada <= m_ph)[:, None, None, None], ada, ph
                )
                gate = (
                    jnp.minimum(m_ada, m_ph)
                    < jax.lax.stop_gradient(mse_pred)
                ).astype(pred.dtype)
                # floor the distill MSE at 1e-6 (60 dB to-teacher fidelity):
                # below it the clamp zeroes the term's gradient, so the
                # 1/MSE log-gradient cannot grow unboundedly as pred
                # approaches the teacher and saturate the global-norm clip
                # (advisor r3)
                total = total + (distill * gate) * jnp.log(
                    jnp.maximum(
                        jnp.mean((pred - teacher) ** 2, axis=(1, 2, 3)),
                        1e-6,
                    )
                )
            else:
                l_ada = jnp.mean(jnp.abs(ada - target), axis=(1, 2, 3))
                l_ph = jnp.mean(jnp.abs(ph - target), axis=(1, 2, 3))
                teacher = jnp.where(
                    (l_ada <= l_ph)[:, None, None, None], ada, ph
                )
                # gate: teacher active only while strictly better than pred
                gate = (
                    jnp.minimum(l_ada, l_ph) < jax.lax.stop_gradient(per)
                ).astype(pred.dtype)
                total = total + (distill * gate) * jnp.mean(
                    jnp.abs(pred - teacher), axis=(1, 2, 3)
                )
        if loss_balance:
            wgt = 1.0 / (jax.lax.stop_gradient(per) + 1e-3)
            return jnp.sum(total * wgt / jnp.sum(wgt)), plain
        return jnp.mean(total), plain

    def step_fn(state: TrainState, batch):
        (_, plain), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, None, opt_state, state.step + 1), {"loss": plain}

    return state, step_fn
