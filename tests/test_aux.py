"""Auxiliary subsystems: adversarial losses, discriminators, metrics writer,
training loop with checkpoint resume, profiling utils, data pipeline."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_discriminators_shapes():
    from fmvfi_tpu.models.discriminator import (
        Discriminator,
        FIDiscriminator,
        TemporalDiscriminator,
    )

    z = jnp.zeros((2, 64, 64, 3))
    d = Discriminator()
    v = d.init(jax.random.key(0), z)
    assert d.apply(v, z).shape == (2, 1)

    fi = FIDiscriminator()
    v = fi.init(jax.random.key(0), z, z)
    assert fi.apply(v, z, z).shape == (2, 1)

    td = TemporalDiscriminator()
    v = td.init(jax.random.key(0), z, z, z)
    assert td.apply(v, z, z, z).shape == (2, 1)


@pytest.mark.parametrize(
    "gan_type",
    [pytest.param("GAN", marks=pytest.mark.slow), "WGAN",
     pytest.param("WGAN_GP", marks=pytest.mark.slow), "FI_GAN"],
)
def test_adversarial_step(gan_type):
    from fmvfi_tpu.train.adversarial import Adversarial

    rng = np.random.default_rng(0)
    adv = Adversarial(gan_type, jax.random.key(0), patch_size=32)
    state = adv.init_state()
    fake = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    frames = (real, real)
    g_loss, state2, aux = adv.step(state, fake, real, frames)
    assert np.isfinite(float(g_loss))
    assert np.isfinite(float(aux["d_loss"]))
    # discriminator params actually moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_metrics_writer_and_plot(tmp_path):
    from fmvfi_tpu.train.loop import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    for i in range(10):
        w.write(i, {"loss": 1.0 / (i + 1)})
    p = w.plot()
    assert os.path.exists(p)
    assert os.path.exists(w.path)
    w.close()


def test_fit_loop_with_resume(tmp_path):
    from fmvfi_tpu.train.data import SyntheticTriplets, batch_iterator
    from fmvfi_tpu.train.loop import fit
    from fmvfi_tpu.train.trainer import make_adacof_trainer
    from fmvfi_tpu.utils.checkpoint import Checkpointer

    ds = SyntheticTriplets(n=4, h=40, w=40)
    state, step = make_adacof_trainer(jax.random.key(0), 32, 32, kernel_size=3)

    batches = batch_iterator(ds, batch_size=2, crop=32, epochs=1, seed=1)
    state = fit(
        state,
        step,
        batches,
        str(tmp_path),
        epochs=1,
        log_every=1,
        ckpt_every=100,
    )
    assert int(state.step) == 2  # 4 items / batch 2

    # resume: a fresh template restores the saved state
    ck = Checkpointer(os.path.join(str(tmp_path), "checkpoint"))
    assert ck.latest() == 2
    state0, _ = make_adacof_trainer(jax.random.key(0), 32, 32, kernel_size=3)
    restored = ck.restore(state0)
    assert int(restored.step) == 2


def test_vimeo_reader_missing_dir():
    from fmvfi_tpu.train.data import Vimeo90kTriplets

    with pytest.raises((ValueError, FileNotFoundError)):
        Vimeo90kTriplets("/nonexistent/vimeo")


def test_checked_catches_nan():
    from fmvfi_tpu.utils.profiling import checked

    def f(x):
        return jnp.log(x)  # nan for negative

    cf = checked(jax.jit(f))
    cf(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        cf(jnp.asarray([-1.0]))


def test_loss_spec_vgg_needs_checkpoint():
    from fmvfi_tpu.train.vgg import VGGLoss

    with pytest.raises(FileNotFoundError):
        VGGLoss("/nonexistent/vgg16.pth")


def test_native_augmentation_matches_numpy():
    from fmvfi_tpu import native
    from fmvfi_tpu.train.data import augment_triplet

    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, 3, 40, 48, 3)).astype(np.uint8)
    params = np.array([[3, 5, 1, 0, 1], [0, 0, 0, 1, 0]], np.int32)
    crop = 32
    o0, o1, o2 = native.augment_batch(raw, crop, params)
    for b in range(2):
        y0, x0, hf, vf, ts = params[b]
        frames = [raw[b, t].astype(np.float32) / 255.0 for t in range(3)]
        f = [fr[y0 : y0 + crop, x0 : x0 + crop] for fr in frames]
        if hf:
            f = [fr[:, ::-1] for fr in f]
        if vf:
            f = [fr[::-1] for fr in f]
        if ts:
            f = [f[2], f[1], f[0]]
        np.testing.assert_allclose(o0[b], f[0], atol=1e-6)
        np.testing.assert_allclose(o1[b], f[1], atol=1e-6)
        np.testing.assert_allclose(o2[b], f[2], atol=1e-6)


def test_native_u8_to_f32():
    from fmvfi_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    y = native.u8_to_f32(x)
    np.testing.assert_allclose(y, x.astype(np.float32) / 255.0, atol=1e-7)


def test_vgg_lpips_with_synthetic_checkpoint(tmp_path):
    """make_vgg_lpips loads a torchvision-format vgg16 state dict and yields
    a positive distance that is zero for identical inputs."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from fmvfi_tpu.eval.metrics import make_vgg_lpips

    # synthetic vgg16 'features' state dict (full conv trunk)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    sd = {}
    idx = 0
    cin = 3
    g = np.random.default_rng(0)
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            (g.normal(size=(v, cin, 3, 3)) * 0.05).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        cin = v
        idx += 2
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)

    lpips = make_vgg_lpips(path)
    a = jnp.asarray(g.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    b = jnp.asarray(g.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    assert float(lpips(a, a)) < 1e-6
    assert float(lpips(a, b)) > 0.0

    # and the metric dict picks it up
    from fmvfi_tpu.eval.metrics import all_metrics

    m = all_metrics(a, b, lpips_fn=lpips)
    assert "lpips_vgg" in m and np.isfinite(float(m["lpips_vgg"]))


@pytest.mark.slow
def test_lpips_flows_through_eval_harness(tmp_path):
    """--vgg_checkpoint wiring: evaluate_frames must add the lpips_vgg column
    when an lpips_fn is supplied (the reference's piq.LPIPS column)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from fmvfi_tpu.eval.evaluate import evaluate_frames
    from fmvfi_tpu.eval.metrics import make_vgg_lpips
    from fmvfi_tpu.models.adacof import AdaCoFNet
    from fmvfi_tpu.pipeline.interpolate import FusionWeights

    # tiny synthetic vgg checkpoint (see test_vgg_lpips_with_synthetic_checkpoint)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    sd, idx, cin = {}, 0, 3
    g = np.random.default_rng(1)
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            (g.normal(size=(v, cin, 3, 3)) * 0.05).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        cin, idx = v, idx + 2
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)
    lpips = make_vgg_lpips(path)

    z = jnp.zeros((1, 64, 64, 3))
    ada = AdaCoFNet(kernel_size=5).init(jax.random.key(0), z, z)
    weights = FusionWeights(phase_net=None, adacof=ada, fusion_net=None)
    frames = g.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    res = evaluate_frames(
        frames, weights, method="adacof", dim=64, lpips_fn=lpips
    )
    assert "lpips_vgg" in res and res["lpips_vgg"].shape == (2,)
    assert np.isfinite(res["lpips_vgg"]).all()
