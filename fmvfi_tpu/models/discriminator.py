"""GAN discriminators for adversarial training losses.

Functional flax redesign of /root/reference/src/adacof/losses/discriminator.py
(NHWC): 8 strided 3x3 conv blocks (64->...->1024 channels, stride 2 on even
blocks), LeakyReLU(0.2), optional BatchNorm (off for WGAN_GP variants), then a
1024-unit linear classifier over the flattened patch features.

- `Discriminator`     — single-frame patch critic (discriminator.py:19-57)
- `TemporalDiscriminator` — 3-D conv stem over a (prev, mid, next) frame
  triplet, then the same trunk (discriminator.py:60-110)
- `FIDiscriminator`   — frame-pair (6-channel) critic (discriminator.py:113-152)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class _Trunk(nn.Module):
    """The shared conv trunk + classifier."""

    use_bn: bool
    depth: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = lambda z: nn.leaky_relu(z, negative_slope=0.2)

        def block(z, c_out, stride, i):
            z = nn.Conv(
                c_out, (3, 3), strides=(stride, stride), padding="SAME",
                use_bias=False, name=f"conv{i}",
            )(z)
            if self.use_bn:
                z = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name=f"bn{i}"
                )(z)
            return act(z)

        c = 64
        x = block(x, c, 1, 0)
        for i in range(self.depth):
            stride = 1 if i % 2 == 1 else 2
            if i % 2 == 1:
                c *= 2
            x = block(x, c, stride, i + 1)

        x = x.reshape(x.shape[0], -1)
        x = act(nn.Dense(1024, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)


class Discriminator(nn.Module):
    gan_type: str = "GAN"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return _Trunk(use_bn=self.gan_type != "WGAN_GP", name="trunk")(x, train)


class FIDiscriminator(nn.Module):
    """Critic over an (earlier, later) frame pair, channel-concatenated."""

    @nn.compact
    def __call__(self, f0, f1, train: bool = False) -> jnp.ndarray:
        x = jnp.concatenate([f0, f1], axis=-1)
        return _Trunk(use_bn=True, name="trunk")(x, train)


class TemporalDiscriminator(nn.Module):
    """Critic over a (prev, mid, next) triplet via two (2,3,3) 3-D convs that
    collapse the time axis, then the 2-D trunk."""

    @nn.compact
    def __call__(self, f0, f1, f2, train: bool = False) -> jnp.ndarray:
        # NDHWC: (B, T=3, H, W, C)
        x = jnp.stack([f0, f1, f2], axis=1)
        x = nn.Conv(64, (2, 3, 3), padding=((0, 0), (1, 1), (1, 1)), name="conv3d_0")(x)
        x = nn.Conv(64, (2, 3, 3), padding=((0, 0), (1, 1), (1, 1)), name="conv3d_1")(x)
        x = x[:, 0]  # time axis collapsed to 1
        return _Trunk(use_bn=False, name="trunk")(x, train)
