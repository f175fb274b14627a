"""Round-2 wiring tests: loss factory VGG/GAN terms, LR step decay,
hierarchical-m scheduling, the high_level swap variant, batched evaluation,
config persistence, and registry call paths."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmvfi_tpu.train.losses import GAN_TYPES, gan_terms, has_term, parse_loss_spec


def _triplet_batch(rng, b=2, hw=64):
    return tuple(
        jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
        for _ in range(3)
    )


def test_loss_spec_accepts_vgg_and_gan_terms():
    spec = parse_loss_spec("0.1*VGG+1*Charb+0.01*GAN")
    assert has_term(spec, "VGG")
    assert gan_terms(spec) == [(0.01, "GAN")]
    with pytest.raises(ValueError):
        parse_loss_spec("1*Nope")


def test_vgg_term_requires_checkpoint():
    from fmvfi_tpu.train.trainer import make_adacof_trainer

    with pytest.raises(ValueError, match="vgg_checkpoint"):
        make_adacof_trainer(
            jax.random.key(0), 64, 64, loss_spec=parse_loss_spec("1*VGG")
        )


@pytest.mark.slow
def test_gan_loss_trains():
    from fmvfi_tpu.train.trainer import make_adacof_trainer

    rng = np.random.default_rng(0)
    state, step = make_adacof_trainer(
        jax.random.key(0),
        64,
        64,
        loss_spec=parse_loss_spec("1*Charb+0.01*GAN"),
    )
    batch = _triplet_batch(rng, b=2, hw=64)
    jstep = jax.jit(step)
    state2, metrics = jstep(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["GAN"]))
    # discriminator state advanced
    d0 = jax.tree.leaves(state.extra.params)[0]
    d1 = jax.tree.leaves(state2.extra.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_lr_step_decay_schedule():
    from fmvfi_tpu.train.trainer import make_adacof_trainer

    rng = np.random.default_rng(1)
    state, step = make_adacof_trainer(
        jax.random.key(0), 32, 32, lr=1e-3, lr_decay_steps=2, lr_decay_rate=0.5
    )
    batch = _triplet_batch(rng, b=1, hw=32)
    jstep = jax.jit(step)
    # capture parameter delta magnitude before and after the decay boundary
    deltas = []
    for _ in range(4):
        new_state, _ = jstep(state, batch)
        d = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                         new_state.params, state.params)
        deltas.append(max(jax.tree.leaves(d)))
        state = new_state
    # ADAMax step magnitude == lr for the dominant coordinate; halves after
    # the staircase boundary at step 2
    assert deltas[2] < deltas[0] * 0.75


@pytest.mark.slow
def test_high_level_trainer_smoke():
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.train.trainer import make_phase_trainer

    rng = np.random.default_rng(2)
    key = jax.random.key(0)
    hw = 64
    z = jnp.zeros((1, hw, hw, 3))
    ada_vars = AdaCoFNet(kernel_size=5, dilation=1).init(key, z, z)
    state, step, _, make_step = make_phase_trainer(
        key, hw, hw, adacof_vars=ada_vars, high_level=True
    )
    batch = _triplet_batch(rng, b=1, hw=hw)
    state2, metrics = jax.jit(step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_hierarchical_m_schedule_in_fit(tmp_path):
    from fmvfi_tpu.train.loop import fit
    from fmvfi_tpu.train.trainer import make_phase_trainer

    rng = np.random.default_rng(3)
    key = jax.random.key(0)
    hw = 32
    state, step, _, make_step = make_phase_trainer(key, hw, hw)
    batches = iter([_triplet_batch(rng, b=1, hw=hw) for _ in range(6)])
    state = fit(
        state,
        step,
        batches,
        str(tmp_path),
        epochs=1,
        steps_per_epoch=6,
        log_every=1,
        ckpt_every=100,
        resume=False,
        make_step=make_step,
        m_init=2,
        m_update=2,
        m_max=4,
    )
    # m should have progressed 2 -> 4 across 6 batches (increment at n=2,4)
    recs = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "train_metrics.jsonl"))
    ]
    ms = [r["m"] for r in recs if "m" in r]
    assert ms[0] == 2 and ms[-1] == 4


def test_batched_eval_matches_loop():
    from fmvfi_tpu.eval.evaluate import evaluate_frames
    from fmvfi_tpu.eval.synth import translation_video
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.pipeline.interpolate import FusionWeights

    hw = 64
    key = jax.random.key(0)
    z = jnp.zeros((1, hw, hw, 3))
    ada_vars = AdaCoFNet(kernel_size=5, dilation=1).init(key, z, z)
    weights = FusionWeights(phase_net=None, adacof=ada_vars, fusion_net=None)
    frames = translation_video(5, hw, hw, step=2.0)

    batched = evaluate_frames(frames, weights, "adacof", dim=hw, batch_size=3)
    looped = evaluate_frames(frames, weights, "adacof", dim=hw, batch_size=1)
    for k in ("psnr", "ssim"):
        np.testing.assert_allclose(batched[k], looped[k], atol=1e-4)


def test_config_roundtrip(tmp_path):
    from fmvfi_tpu.utils import config as C

    cfg = C.Config()
    cfg.train.lr = 5e-4
    cfg.adacof.kernel_size = 11
    path = str(tmp_path / "config.json")
    C.save(cfg, path)
    loaded = C.load(path)
    assert loaded.train.lr == 5e-4
    assert loaded.adacof.kernel_size == 11


def test_registry_paths():
    from fmvfi_tpu.models.registry import get_model

    m = get_model("adacof", kernel_size=5, dilation=1)
    assert m.kernel_size == 5
    with pytest.raises(KeyError):
        get_model("not_a_model")
