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


@pytest.mark.parametrize("gan_type", ["GAN", "WGAN", "WGAN_GP", "FI_GAN"])
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
