"""Regression tests for the round-3 code-review fixes:

1. `_interp_fn` must build the fusion filter bank at the PADDED resolution
   (fusion_interpolate reflect-pads off-/8 inputs internally), or every
   precomputed-filters caller (evaluate_triplets at native resolution,
   cmd_interpolate, non-streaming cmd_video) crashed at decompose.
2. `double_frame_rate` on a single frame must yield it back, not index
   frames[1] (streaming) / unpack None (per-pair).
3. MixedSynthStream's large-motion regime must keep |dx| = 2*step in the
   documented 8-28 px/frame range (the earlier cos(angle) scaling collapsed
   it to [0, 28] with a sparse tail — the r2 coverage-hole failure mode).
4. The eval harness threads FusionNet `variant`/`uncertainty_maps` to the
   pipeline (the published fusion_net_phase.pt / fusion_net_nouncertainty.pt
   modes were silently evaluated as variant 0 / 3 maps).
"""

import os
from typing import NamedTuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmvfi_tpu.eval.synth import translation_triplet, translation_video
from fmvfi_tpu.models.adacof import AdaCoFNet
from fmvfi_tpu.pipeline.interpolate import FusionWeights
from fmvfi_tpu.pipeline.video import _interp_fn, double_frame_rate
from fmvfi_tpu.utils.convert import fusion_net_from_torch, phase_net_from_torch

PHASE_CKPT = "/root/reference/src/phase_net/phase_net.pt"
FUSION_CKPT = "/root/reference/src/fusion_net/fusion_net.pt"
needs_ckpts = pytest.mark.skipif(
    not (os.path.exists(PHASE_CKPT) and os.path.exists(FUSION_CKPT)),
    reason="reference checkpoints unavailable",
)


@pytest.fixture(scope="module")
def weights():
    z = jnp.zeros((1, 64, 64, 3))
    return FusionWeights(
        phase_net=phase_net_from_torch(PHASE_CKPT),
        adacof=AdaCoFNet(kernel_size=5, dilation=1).init(jax.random.key(0), z, z),
        fusion_net=fusion_net_from_torch(FUSION_CKPT),
    )


@pytest.mark.slow
@needs_ckpts
def test_interp_fn_fusion_off_grid(weights):
    f1, _, f2 = translation_triplet(92, 148, dx=1.5, dy=0.0, seed=6)
    fn = _interp_fn(weights, 92, 148, "fusion")
    out = fn(jnp.asarray(f1)[None], jnp.asarray(f2)[None])
    assert out.shape == (1, 92, 148, 3)
    assert np.isfinite(np.asarray(out)).all()


@needs_ckpts
def test_double_frame_rate_single_frame(weights):
    frames = translation_video(1, 64, 64, step=1.0)
    for method, stream in (("fusion", True), ("fusion", False), ("adacof", True)):
        out = list(double_frame_rate(frames, weights, method, stream=stream))
        assert len(out) == 1
        np.testing.assert_array_equal(out[0], frames[0])


def test_mixed_stream_large_motion_magnitude(monkeypatch):
    from fmvfi_tpu.eval import synth
    from fmvfi_tpu.train import data as data_mod

    recorded = []
    real = synth.translation_triplet

    def spy(h, w, dx=0.0, dy=0.0, seed=0):
        recorded.append((dx, dy))
        return real(h, w, dx=dx, dy=dy, seed=seed)

    monkeypatch.setattr(synth, "translation_triplet", spy)
    data_mod.MixedSynthStream(n=12, h=96, w=128, seed0=77, workers=2)
    # scenes 1 and 7 are the large-motion regime (k = i % 6 == 1); they are
    # the 2nd translation_triplet call of each 6-scene block, but thread
    # order varies — instead select by magnitude class: large-motion dx is
    # 2*step with step in [8, 28] -> |dx| in [16, 56]; plain translation is
    # 2*step with step <= 8 -> |dx| <= 16.
    big = [abs(dx) for dx, _ in recorded if abs(dx) > 16.0 + 1e-9]
    assert len(big) == 2, recorded
    for m in big:
        assert 16.0 <= m <= 56.0


@needs_ckpts
def test_evaluate_frames_threads_fusion_mode(weights, monkeypatch):
    """evaluate_frames(variant=, uncertainty_maps=) must reach _interp_fn."""
    from fmvfi_tpu.eval import evaluate as ev

    seen = {}
    real = ev._interp_fn

    def spy(w, h, ww, method, variant=0, uncertainty_maps=3):
        seen["mode"] = (variant, uncertainty_maps)
        return real(w, h, ww, method, variant, uncertainty_maps)

    monkeypatch.setattr(ev, "_interp_fn", spy)
    frames = translation_video(3, 64, 64, step=1.0)
    ev.evaluate_frames(
        frames, weights, "adacof", dim=64, max_num=1,
        variant=1, uncertainty_maps=3,
    )
    assert seen["mode"] == (1, 3)


def test_load_weights_method_gated(monkeypatch):
    """`_load_weights` loads only the checkpoints its method needs
    (package-review fix): phase-only use must not touch AdaCoF/FusionNet
    loaders, adacof-only must not touch PhaseNet's, eval keeps everything."""
    from types import SimpleNamespace

    from fmvfi_tpu import cli

    calls = []
    monkeypatch.setattr(
        "fmvfi_tpu.utils.convert.load_adacof_weights",
        lambda *a, **k: calls.append("ada") or "ADA",
    )
    monkeypatch.setattr(
        "fmvfi_tpu.utils.convert.load_fusion_weights",
        lambda *a, **k: calls.append("fus") or "FUS",
    )
    monkeypatch.setattr(
        "fmvfi_tpu.utils.convert.phase_net_from_torch",
        lambda *a, **k: calls.append("pha") or "PHA",
    )

    def make_args(**kw):
        return SimpleNamespace(
            adacof_checkpoint="x.msgpack",
            fusion_checkpoint="fusion_net.pt",
            phase_checkpoint="phase_net.pt",
            kernel_size=5, dilation=1, fusion_variant=-1, fusion_maps=-1,
            **kw,
        )

    w = cli._load_weights(make_args(method="phase"), 64, 64)
    assert (w.phase_net, w.adacof, w.fusion_net) == ("PHA", None, None)
    assert calls == ["pha"]

    calls.clear()
    w = cli._load_weights(make_args(method="adacof"), 64, 64)
    assert (w.phase_net, w.adacof, w.fusion_net) == (None, "ADA", None)
    assert calls == ["ada"]

    calls.clear()
    w = cli._load_weights(
        make_args(methods="fusion,phase,adacof", method="fusion"), 64, 64
    )
    assert (w.phase_net, w.adacof, w.fusion_net) == ("PHA", "ADA", "FUS")
    assert sorted(calls) == ["ada", "fus", "pha"]

    calls.clear()  # baseline = spectral split of phase+adacof, no FusionNet
    w = cli._load_weights(make_args(method="baseline"), 64, 64)
    assert (w.phase_net, w.adacof, w.fusion_net) == ("PHA", "ADA", None)


class _S(NamedTuple):
    """Minimal fit()-compatible state (a pytree, so epoch-end orbax
    checkpointing works)."""

    step: np.ndarray


def _schedule_harness(tmp_path, initial_step, n_batches, m_init, m_update,
                      m_max, epochs=1, steps_per_epoch=None):
    """Run fit() with an m-schedule + wrap_step; return the m each (re)build
    passed through the wrapper."""
    from fmvfi_tpu.train.loop import fit

    wrapped_ms = []

    def make_step(m):
        def step(state, batch):
            return _S(state.step + 1), {"loss": np.float32(m)}

        step.m = m
        return step

    def wrap(fn):
        wrapped_ms.append(fn.m)
        return fn

    batches = [(np.zeros(1),)] * n_batches
    fit(
        _S(np.int64(initial_step)), None, iter(batches), str(tmp_path),
        epochs=epochs, steps_per_epoch=steps_per_epoch,
        jit=False, make_step=make_step, m_init=m_init, m_update=m_update,
        m_max=m_max, wrap_step=wrap, log_every=1000, ckpt_every=10**9,
        resume=False,
    )
    return wrapped_ms


def test_fit_wrap_step_survives_m_rebuild(tmp_path):
    """The wrap_step wrapper (e.g. data_parallel) must be re-applied at every
    hierarchical-m step rebuild (review fix: --data_parallel + --m silently
    dropped DP on rebuild)."""
    ms = _schedule_harness(tmp_path / "a", 0, 6, m_init=1, m_update=2, m_max=3)
    assert ms == [1, 2, 3]


def test_fit_m_resumes_at_restored_step(tmp_path):
    """A resumed run advances m to where an uninterrupted run would be at the
    restored step instead of restarting the exchange schedule."""
    ms = _schedule_harness(tmp_path / "b", 4, 2, m_init=1, m_update=2, m_max=9)
    assert ms[0] == 3  # 1 + 4 // 2


def test_fit_m_resume_matches_uninterrupted_epoch_schedule(tmp_path):
    """m increments on the PER-EPOCH counter (the reference's batch_idx
    resets each epoch, trainer.py:162), so a resume must replay the epoch
    structure — a global-step formula diverges whenever
    steps_per_epoch % m_update != 0."""
    kw = dict(m_init=1, m_update=2, m_max=9, epochs=3, steps_per_epoch=3)
    full = _schedule_harness(tmp_path / "full", 0, 9, **kw)
    assert full == [1, 2, 3, 4]  # one increment per 3-step epoch (at n==2)
    # resume at step 4 = epoch 1, n 1: an uninterrupted run is at m=2 there
    # (the old global formula said 1 + 4//2 = 3)
    resumed = _schedule_harness(tmp_path / "res", 4, 5, **kw)
    assert resumed == [2, 3, 4]
