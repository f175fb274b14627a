"""Adversarial loss family with an inner discriminator optimizer.

Functional redesign of /root/reference/src/adacof/losses/adversarial.py:10-97:
each call performs one discriminator update (on detached generator output) and
returns the generator loss plus the new discriminator state — explicit state
instead of a stateful nn.Module with a hidden optimizer.

Supported gan_type: GAN, WGAN, WGAN_GP, FI_GAN, T_WGAN_GP (adversarial.py
:15-27, 46-94), including the WGAN weight clamp and the WGAN-GP gradient
penalty (lambda=10) via jax.grad instead of torch.autograd.grad.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import Discriminator, FIDiscriminator, TemporalDiscriminator


class AdvState(NamedTuple):
    params: Any
    batch_stats: Any  # {} for BN-free (WGAN_GP-family) critics
    opt_state: Any
    rng: jax.Array  # RAW key data (jax.random.key_data) — typed PRNG keys
    # are extended-dtype arrays that orbax StandardCheckpointer rejects, and
    # AdvState rides in TrainState.extra through fit()'s checkpoints


def _bce_logits(logits, target):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class Adversarial:
    """gan = Adversarial('WGAN_GP', key, patch_size=96); then per step:
    g_loss, state = gan.step(state, fake, real, input_frames)."""

    def __init__(
        self,
        gan_type: str,
        rng: jax.Array,
        patch_size=96,  # int or (h, w) — the BN trunks flatten into a Dense,
        # so the critic must be initialized at the REAL crop shape
        lr: Optional[float] = None,
    ):
        self.gan_type = gan_type
        if gan_type == "T_WGAN_GP":
            self.model = TemporalDiscriminator()
        elif gan_type == "FI_GAN":
            self.model = FIDiscriminator()
        else:
            self.model = Discriminator(gan_type=gan_type)

        if gan_type in ("WGAN_GP", "T_WGAN_GP"):
            self.tx = optax.adam(lr or 1e-5, b1=0.0, b2=0.9, eps=1e-8)
        else:
            self.tx = optax.adam(lr or 1e-4)

        ph, pw = (
            patch_size if isinstance(patch_size, (tuple, list))
            else (patch_size, patch_size)
        )
        z = jnp.zeros((1, ph, pw, 3))
        if gan_type == "T_WGAN_GP":
            variables = self.model.init(rng, z, z, z)
        elif gan_type == "FI_GAN":
            variables = self.model.init(rng, z, z)
        else:
            variables = self.model.init(rng, z)
        self._init_state = AdvState(
            variables["params"],
            variables.get("batch_stats", {}),
            self.tx.init(variables["params"]),
            jax.random.key_data(rng),
        )

    def init_state(self) -> AdvState:
        return self._init_state

    def _d(self, params, stats, *frames):
        """Critic forward in TRAIN mode when the trunk has BatchNorm:
        normalize by the BATCH statistics, exactly as the reference's torch
        critics do inside training (they run in train mode throughout).
        The mutated running-stats collection is discarded here; step()
        refreshes AdvState.batch_stats once per step after the update."""
        v = {"params": params}
        if stats:
            v["batch_stats"] = stats
            out, _ = self.model.apply(
                v, *frames, train=True, mutable=["batch_stats"]
            )
            return out
        return self.model.apply(v, *frames)

    def step(
        self,
        state: AdvState,
        fake: jnp.ndarray,
        real: jnp.ndarray,
        input_frames: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """One discriminator update + generator loss.  Pure; jit-safe."""
        gan = self.gan_type
        fake_d = jax.lax.stop_gradient(fake)
        stats = state.batch_stats
        rng, sub = jax.random.split(jax.random.wrap_key_data(state.rng))

        def d_loss_fn(params):
            if gan == "T_WGAN_GP":
                d_fake = self._d(params, stats, input_frames[0], fake_d, input_frames[1])
                d_real = self._d(params, stats, input_frames[0], real, input_frames[1])
            elif gan == "FI_GAN":
                d_01 = self._d(params, stats, input_frames[0], fake_d)
                d_12 = self._d(params, stats, fake_d, input_frames[1])
                return _bce_logits(d_01, jnp.zeros_like(d_01)) + _bce_logits(
                    d_12, jnp.ones_like(d_12)
                )
            else:
                d_fake = self._d(params, stats, fake_d)
                d_real = self._d(params, stats, real)

            if gan == "GAN":
                return _bce_logits(d_fake, jnp.zeros_like(d_fake)) + _bce_logits(
                    d_real, jnp.ones_like(d_real)
                )
            # WGAN family
            loss = jnp.mean(d_fake - d_real)
            if "GP" in gan:
                eps = jax.random.uniform(sub, fake.shape)
                hat = fake_d * (1 - eps) + real * eps

                def d_sum(h):
                    if gan == "T_WGAN_GP":
                        return jnp.sum(
                            self._d(params, stats, input_frames[0], h, input_frames[1])
                        )
                    return jnp.sum(self._d(params, stats, h))

                g = jax.grad(d_sum)(hat)
                gnorm = jnp.sqrt(
                    jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) + 1e-12
                )
                loss = loss + 10.0 * jnp.mean((gnorm - 1.0) ** 2)
            return loss

        d_loss, grads = jax.value_and_grad(d_loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if gan == "WGAN":
            params = jax.tree.map(lambda p: jnp.clip(p, -1.0, 1.0), params)

        # generator loss against the UPDATED discriminator (detached d params)
        dp = jax.lax.stop_gradient(params)
        if gan == "GAN":
            d_fake_g = self._d(dp, stats, fake)
            g_loss = _bce_logits(d_fake_g, jnp.ones_like(d_fake_g))
        elif gan == "FI_GAN":
            d01 = jax.nn.sigmoid(self._d(dp, stats, input_frames[0], fake))
            d12 = jax.nn.sigmoid(self._d(dp, stats, fake, input_frames[1]))
            g_loss = jnp.mean(
                d01 * jnp.log(d01 + 1e-12) + d12 * jnp.log(d12 + 1e-12)
            )
        else:
            if gan == "T_WGAN_GP":
                g_loss = -jnp.mean(
                    self._d(dp, stats, input_frames[0], fake, input_frames[1])
                )
            else:
                g_loss = -jnp.mean(self._d(dp, stats, fake))

        # refresh the running-stats collection once per step with the
        # updated params (advisory only — training normalization uses batch
        # statistics, see _d; these matter only if the critic is ever run
        # in eval mode)
        new_stats = stats
        if stats:
            ref = (
                (input_frames[0], fake_d) if gan == "FI_GAN" else (real,)
            )
            _, mut = self.model.apply(
                {"params": params, "batch_stats": stats}, *ref,
                train=True, mutable=["batch_stats"],
            )
            new_stats = mut["batch_stats"]

        return (
            g_loss,
            AdvState(params, new_stats, opt_state, jax.random.key_data(rng)),
            {"d_loss": d_loss},
        )
