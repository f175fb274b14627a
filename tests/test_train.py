"""Training-step tests: loss decreases, losses match semantics, spec parser."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.eval.synth import translation_triplet
from fmvfi_tpu.train.losses import (
    charbonnier,
    circular_phase_loss,
    parse_loss_spec,
    phase_net_loss,
)
from fmvfi_tpu.train.trainer import (
    make_adacof_trainer,
    make_fusion_trainer,
    make_phase_trainer,
)


def _triplet_batch(b=2, h=64, w=64):
    f1s, mids, f2s = [], [], []
    for i in range(b):
        f1, mid, f2 = translation_triplet(h, w, dx=3.0, dy=1.0, seed=i)
        f1s.append(f1)
        mids.append(mid)
        f2s.append(f2)
    return (
        jnp.asarray(np.stack(f1s)),
        jnp.asarray(np.stack(mids)),
        jnp.asarray(np.stack(f2s)),
    )


def test_loss_spec_parser():
    spec = parse_loss_spec("1*Charb+0.01*g_Spatial+0.005*g_Occlusion")
    vals = {
        "Charb": jnp.asarray(2.0),
        "g_Spatial": jnp.asarray(100.0),
        "g_Occlusion": jnp.asarray(200.0),
    }
    assert abs(float(spec(vals)) - (2.0 + 1.0 + 1.0)) < 1e-6
    # VGG/GAN terms parse (wiring is validated in tests/test_wiring.py)
    assert parse_loss_spec("1*VGG+0.01*GAN").terms == ((1.0, "VGG"), (0.01, "GAN"))
    with pytest.raises(ValueError):
        parse_loss_spec("1*Bogus")


def test_circular_phase_loss_wraps():
    from fmvfi_tpu.ops.pyramid import Decomp

    p1 = (jnp.full((1, 4, 4, 4), 3.1),)
    p2 = (jnp.full((1, 4, 4, 4), -3.1),)  # ~0.083 apart circularly, not 6.2
    d1 = Decomp(jnp.zeros((1, 4, 4)), jnp.zeros((1, 2, 2)), p1, p1)
    d2 = Decomp(jnp.zeros((1, 4, 4)), jnp.zeros((1, 2, 2)), p2, p2)
    v = float(circular_phase_loss(d1, d2))
    expected = 4 * (2 * np.pi - 6.2)  # per-band mean, summed over 4 bands
    assert abs(v - expected) < 1e-3


def test_adacof_train_step_reduces_loss():
    state, step = make_adacof_trainer(jax.random.key(0), 64, 64, lr=2e-4)
    batch = _triplet_batch(1, 64, 64)
    jstep = jax.jit(step)
    losses = []
    for _ in range(15):
        state, m = jstep(state, batch)
        losses.append(float(m["loss"]))
    # single-batch overfit must trend down (allow early optimizer noise)
    assert min(losses[5:]) < losses[0], losses
    assert int(state.step) == 15


def test_phase_train_step_reduces_loss():
    state, step, eval_fn, make_step = make_phase_trainer(jax.random.key(0), 64, 64, lr=1e-3)
    batch = _triplet_batch(1, 64, 64)
    jstep = jax.jit(step)
    state, m0 = jstep(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(6):
        state, m = jstep(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # eval path produces a lab image batch
    out = eval_fn(state, batch[0], batch[2])
    assert out.shape == (3, 64, 64)  # B=1 -> 3 lab channel-images


@pytest.mark.slow
def test_fusion_train_step_runs():
    rng = jax.random.key(0)
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.models.phase_net import PhaseNetCore
    from fmvfi_tpu.ops import decomp as dec_ops
    from fmvfi_tpu.ops.pyramid import decompose, make_filters, max_pyr_height
    from fmvfi_tpu.models.phase_net import normalize_inputs

    h = w = 64
    filters = make_filters(h, w, max_pyr_height(h, w))
    vals = decompose(jnp.zeros((3, h, w)), filters)
    low, phases, amps = dec_ops.concat_for_net([vals, vals])
    lown, pn, an, _ = normalize_inputs(low, phases, amps)
    phase_vars = PhaseNetCore(num_img=2).init(rng, lown, pn, an)
    ada_vars = AdaCoFNet(5, 1).init(rng, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))

    state, step = make_fusion_trainer(rng, h, w, phase_vars, ada_vars)
    batch = _triplet_batch(1, h, w)
    state, m1 = jax.jit(step)(state, batch)
    state, m2 = jax.jit(step)(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2

    # balanced-L1 mode: same TrainState pytree (exact resume across the flag
    # works), same REPORTED loss on the same params (metric stays plain L1),
    # different parameter update (gradients are reweighted per sample)
    state_b, step_b = make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars, loss_balance=True
    )
    assert jax.tree_util.tree_structure(state_b) == jax.tree_util.tree_structure(
        make_fusion_trainer(rng, h, w, phase_vars, ada_vars)[0]
    )
    batch2 = _triplet_batch(2, h, w)
    sb1, mb1 = jax.jit(step_b)(state_b, batch2)
    assert np.isfinite(float(mb1["loss"]))
    sp1, mp1 = jax.jit(make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars)[1])(
        make_fusion_trainer(rng, h, w, phase_vars, ada_vars)[0], batch2
    )
    np.testing.assert_allclose(float(mb1["loss"]), float(mp1["loss"]), rtol=1e-5)

    # distill mode: same TrainState pytree, reported metric still the plain
    # L1 on the same params, parameter update differs (teacher term active)
    state_d, step_d = make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars, loss_balance=True, distill=1.0
    )
    assert jax.tree_util.tree_structure(state_d) == jax.tree_util.tree_structure(
        state_b
    )
    sd1, md1 = jax.jit(step_d)(state_d, batch2)
    assert np.isfinite(float(md1["loss"]))
    np.testing.assert_allclose(float(md1["loss"]), float(mp1["loss"]), rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), sd1.params, sb1.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    # psnr (log-MSE) mode: same TrainState pytree, reported metric still the
    # plain L1 on the same params, parameter update differs from plain L1
    state_p, step_p = make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars, loss_psnr=True
    )
    assert jax.tree_util.tree_structure(state_p) == jax.tree_util.tree_structure(
        state_b
    )
    spp1, mpp1 = jax.jit(step_p)(state_p, batch2)
    assert np.isfinite(float(mpp1["loss"]))
    np.testing.assert_allclose(float(mpp1["loss"]), float(mp1["loss"]), rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), spp1.params, sp1.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    # psnr + gated distill (the round-4 campaign objective): runs finite,
    # reported metric still the plain L1, and the combination with
    # loss_balance is rejected (advisor r3 medium: 1/L1 weights on negative
    # log values invert the balancing intent)
    state_pd, step_pd = make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars, loss_psnr=True, distill=1.0
    )
    spd1, mpd1 = jax.jit(step_pd)(state_pd, batch2)
    assert np.isfinite(float(mpd1["loss"]))
    np.testing.assert_allclose(float(mpd1["loss"]), float(mp1["loss"]), rtol=1e-5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_fusion_trainer(
            rng, h, w, phase_vars, ada_vars, loss_psnr=True, loss_balance=True
        )

    # gated-blend head (variant 2) under the campaign objective: the head
    # is widened to 6 channels and the step runs finite
    state_v2, step_v2 = make_fusion_trainer(
        rng, h, w, phase_vars, ada_vars, loss_psnr=True, distill=1.0,
        variant=2,
    )
    assert state_v2.params["dec2"]["kernel"].shape == (1, 1, 32, 6)
    sv1, mv1 = jax.jit(step_v2)(state_v2, batch2)
    assert np.isfinite(float(mv1["loss"]))
    assert int(sv1.step) == 1


@pytest.mark.slow
def test_phase_fusion_mode_and_hierarchical():
    """Fusion phase-training variants (num_img 3/4) + hierarchical-m step."""
    from fmvfi_tpu.models.adacof import AdaCoFNet

    rng = jax.random.key(0)
    h = w = 64
    ada_vars = AdaCoFNet(3, 1).init(
        rng, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
    )
    for variant in (0, 1):
        state, step, eval_fn, make_step = __import__(
            "fmvfi_tpu.train.trainer", fromlist=["make_phase_trainer"]
        ).make_phase_trainer(
            rng, h, w, mode="fusion", model_variant=variant,
            adacof_vars=ada_vars, kernel_size=3,
        )
        batch = _triplet_batch(1, h, w)
        state, m = jax.jit(step)(state, batch)
        assert np.isfinite(float(m["loss"]))

    # hierarchical: m=3 -> finest levels exchanged from target, loss finite
    state, step, eval_fn, make_step = __import__(
        "fmvfi_tpu.train.trainer", fromlist=["make_phase_trainer"]
    ).make_phase_trainer(rng, h, w)
    hstep = make_step(3)
    batch = _triplet_batch(1, h, w)
    state, m = jax.jit(hstep)(state, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_fit_image_probe(tmp_path):
    """Sample-image renders every N steps (train/trainer.py:140-142 parity)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmvfi_tpu.train.loop import fit
    from fmvfi_tpu.train.trainer import make_adacof_trainer

    rng = np.random.default_rng(0)
    hw = 32
    state, step = make_adacof_trainer(jax.random.key(0), hw, hw, kernel_size=3)
    batches = iter(
        [
            tuple(
                jnp.asarray(rng.uniform(0, 1, (1, hw, hw, 3)).astype(np.float32))
                for _ in range(3)
            )
            for _ in range(4)
        ]
    )
    fit(
        state,
        step,
        batches,
        str(tmp_path),
        epochs=1,
        steps_per_epoch=4,
        resume=False,
        image_probe=lambda s: np.full((8, 8, 3), 0.5, np.float32),
        image_every=2,
    )
    files = sorted(os.listdir(tmp_path / "result"))
    assert files == ["step_000002.png", "step_000004.png"]
