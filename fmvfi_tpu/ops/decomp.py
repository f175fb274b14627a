"""Pytree utilities over pyramid decompositions.

Functional re-design of /root/reference/src/train/utils.py: the reference
packs multiple frames into the pyramid batch axis, decomposes once, then
splits/re-concats with reshape gymnastics over an (N*nbands, 1, h, w) layout.
Here `Decomp` carries (N, nbands, h, w) arrays and these helpers are simple
axis ops on a registered pytree — jit/vmap/grad-safe, no hidden state.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .pyramid import Decomp


def split_frames(vals: Decomp, num: int) -> List[Decomp]:
    """Split a Decomp whose leading axis packs `num` frame groups (frame-major),
    mirroring separate_vals (/root/reference/src/train/utils.py:83-127)."""
    outs = []
    n = vals.high.shape[0] // num
    for i in range(num):
        sl = slice(i * n, (i + 1) * n)
        outs.append(
            Decomp(
                high=vals.high[sl],
                low=vals.low[sl],
                phase=tuple(p[sl] for p in vals.phase),
                amplitude=tuple(a[sl] for a in vals.amplitude),
            )
        )
    return outs


def concat_frames(vals_list: Sequence[Decomp]) -> Decomp:
    """Concatenate per-frame Decomps along the leading (batch) axis,
    mirroring combine_values (utils.py:208-240)."""
    return Decomp(
        high=jnp.concatenate([v.high for v in vals_list], axis=0),
        low=jnp.concatenate([v.low for v in vals_list], axis=0),
        phase=tuple(
            jnp.concatenate([v.phase[i] for v in vals_list], axis=0)
            for i in range(len(vals_list[0].phase))
        ),
        amplitude=tuple(
            jnp.concatenate([v.amplitude[i] for v in vals_list], axis=0)
            for i in range(len(vals_list[0].amplitude))
        ),
    )


def concat_for_net(vals_list: Sequence[Decomp]):
    """Build PhaseNet inputs from per-frame Decomps: band axes of all frames are
    concatenated (frame0 bands, frame1 bands, ...) and levels are reordered
    COARSEST-first, mirroring get_concat_layers_inf (utils.py:47-80).

    Returns (low, phases, amps):
      low:    (N, hL, wL, num_img)
      phases: list coarse->fine of (N, h_l, w_l, num_img*nbands)
      amps:   same shapes
    with channel order [f0b0..f0b3, f1b0..f1b3, ...] on the last axis (NHWC).
    """
    num = len(vals_list)
    low = jnp.stack([v.low for v in vals_list], axis=-1)
    nlev = len(vals_list[0].phase)
    phases, amps = [], []
    for lvl in range(nlev):
        # (N, nbands, h, w) per frame -> (N, h, w, num*nbands)
        p = jnp.concatenate([v.phase[lvl] for v in vals_list], axis=1)
        a = jnp.concatenate([v.amplitude[lvl] for v in vals_list], axis=1)
        phases.append(jnp.transpose(p, (0, 2, 3, 1)))
        amps.append(jnp.transpose(a, (0, 2, 3, 1)))
    return low, phases[::-1], amps[::-1]


def keep_finest_levels(vals: Decomp, use_levels: int = 1) -> Decomp:
    """Zero all but the `use_levels` finest band levels; keep high, zero low.
    Mirrors get_last_value_levels (utils.py:242-280)."""
    return Decomp(
        high=vals.high,
        low=jnp.zeros_like(vals.low),
        phase=tuple(
            p if i < use_levels else jnp.zeros_like(p)
            for i, p in enumerate(vals.phase)
        ),
        amplitude=tuple(
            a if i < use_levels else jnp.zeros_like(a)
            for i, a in enumerate(vals.amplitude)
        ),
    )


def keep_coarsest_levels(vals: Decomp, use_levels: int = 1) -> Decomp:
    """Zero all but the `use_levels` coarsest band levels; keep low, zero high.
    Mirrors get_first_value_levels (utils.py:282-320)."""
    n = len(vals.phase)
    return Decomp(
        high=jnp.zeros_like(vals.high),
        low=vals.low,
        phase=tuple(
            p if i >= n - use_levels else jnp.zeros_like(p)
            for i, p in enumerate(vals.phase)
        ),
        amplitude=tuple(
            a if i >= n - use_levels else jnp.zeros_like(a)
            for i, a in enumerate(vals.amplitude)
        ),
    )


def abs_difference(v1: Decomp, v2: Decomp) -> Decomp:
    """Elementwise |v1 - v2| on every component (utils.py:322-346)."""
    return Decomp(
        high=jnp.abs(v1.high - v2.high),
        low=jnp.abs(v1.low - v2.low),
        phase=tuple(jnp.abs(a - b) for a, b in zip(v1.phase, v2.phase)),
        amplitude=tuple(jnp.abs(a - b) for a, b in zip(v1.amplitude, v2.amplitude)),
    )


def exchange_levels(base: Decomp, changer: Decomp, start: int, end: int) -> Decomp:
    """Replace band levels [start, end) of `base` with `changer`'s
    (hierarchical-training helper, utils.py:145-152)."""
    return Decomp(
        high=base.high,
        low=base.low,
        phase=tuple(
            changer.phase[i] if start <= i < end else base.phase[i]
            for i in range(len(base.phase))
        ),
        amplitude=tuple(
            changer.amplitude[i] if start <= i < end else base.amplitude[i]
            for i in range(len(base.amplitude))
        ),
    )
