"""PhaseNet: coarse-to-fine phase/amplitude prediction over pyramid levels.

Re-design of /root/reference/src/phase_net/{block.py,core.py,phase_net.py}
as flax.linen modules in NHWC:

- `PhaseNetBlock` (block.py:4-32): Conv->BN->ELU->Conv->ELU feature head +
  1x1 Conv->Tanh prediction head, reflect padding.
- `PhaseNetCore` (core.py:9-200): 8 blocks; blocks [0..2] are 1x1, [3..7] are
  3x3; block index is min(level+1, 7) so ONE weight set serves any pyramid
  height (core.py:168).  Level 0 predicts an alpha-blend of the two low-res
  residuals (core.py:129-131); each level predicts `nbands` phases directly
  plus beta-weights that blend the two frames' amplitudes (core.py:175-178).
- The reference's hidden normalization state (`self.max_amplitudes`,
  core.py:61-68) becomes an explicit `NormState` value threaded through the
  call — pure functions, jit/grad-safe.

The network operates per Lab-channel: batch axis is B*3, and the channel axis
carries the frames' band stacks ([f0 b0..b3, f1 b0..b3] = 8 for num_img=2).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pyramid import Decomp
from ..ops.resize import resize_bilinear


class PhaseNetBlock(nn.Module):
    c_out: int
    pred_out: int
    kernel: int  # 1 or 3
    dtype: object = None  # compute dtype (e.g. bfloat16); params stay fp32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        pad = self.kernel // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def rpad(z):
            if pad == 0:
                return z
            return jnp.pad(
                z, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect"
            )

        k = (self.kernel, self.kernel)
        x = nn.Conv(self.c_out, k, padding="VALID", dtype=self.dtype, name="conv1")(rpad(x))
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.elu(x)
        x = nn.Conv(self.c_out, k, padding="VALID", dtype=self.dtype, name="conv2")(rpad(x))
        feat = nn.elu(x)
        pred = jnp.tanh(
            nn.Conv(self.pred_out, (1, 1), dtype=self.dtype, name="pred")(feat)
        )
        # keep the compute dtype: the values were PRODUCED at this precision,
        # so upcasting here would only make the level-to-level resizes run the
        # slow fp32-"highest" matmul path for no accuracy gain
        return feat, pred


class NormState(NamedTuple):
    """Explicit normalization state (replaces the reference's mutable
    self.max_amplitudes / self.max_low_level, core.py:61-68,80-83)."""

    max_amps: Tuple[jnp.ndarray, ...]  # coarse-first, each (B,1,1,1)
    max_low: jnp.ndarray  # (B,1,1,1)


def normalize_inputs(
    low: jnp.ndarray,
    phases: Sequence[jnp.ndarray],
    amps: Sequence[jnp.ndarray],
    eps: float = 1e-8,
):
    """normalize_vals (core.py:50-90): amplitudes / per-sample max, phases / pi,
    low / per-sample max.  Inputs are NHWC, levels coarse-first."""
    max_amps = tuple(
        jnp.max(a, axis=(1, 2, 3), keepdims=True) + eps for a in amps
    )
    amps_n = [a / m for a, m in zip(amps, max_amps)]
    phases_n = [p / math.pi for p in phases]
    max_low = jnp.max(low, axis=(1, 2, 3), keepdims=True) + eps
    return low / max_low, phases_n, amps_n, NormState(max_amps, max_low)


class PhaseNetCore(nn.Module):
    """The 8-block PhaseNet.  Architecture per core.py:24-43."""

    num_img: int = 2
    nbands: int = 4
    dtype: object = None  # compute dtype for the conv blocks

    def setup(self):
        ni = self.num_img
        if ni == 3:
            specs = [
                (ni - 1, 1),
                (ni * 4, 1),
                (ni * 4, 1),
            ] + [(ni * 4, 3)] * 5
        else:
            specs = [(1, 1), (8, 1), (8, 1)] + [(8, 3)] * 5
        self.blocks = [
            PhaseNetBlock(64, pred_out, kernel, self.dtype, name=f"block{i}")
            for i, (pred_out, kernel) in enumerate(specs)
        ]

    def __call__(
        self,
        low: jnp.ndarray,
        phases: Sequence[jnp.ndarray],
        amps: Sequence[jnp.ndarray],
        m: Optional[int] = None,
        train: bool = False,
    ):
        """Args are NORMALIZED net inputs, levels coarse-first (see
        ops.decomp.concat_for_net + normalize_inputs).

        Returns (low_pred, phase_preds, amp_preds): normalized predictions,
        low_pred (B,h,w,1), per-level (B,h,w,nbands), coarse-first."""
        nb = self.nbands
        if m is None:
            m = len(phases)
        cdt = self.dtype

        feat, pred = self.blocks[0](low, train=train)
        predf = pred.astype(jnp.float32)
        alpha = (predf[..., 0:1] + 1.0) / 2.0
        low_pred = alpha * low[..., 0:1] + (1.0 - alpha) * low[..., 1:2]
        if self.num_img == 3:
            fusion_alpha = (predf[..., 1:2] + 1.0) / 2.0
            low_pred = fusion_alpha * low_pred + (1.0 - fusion_alpha) * low[..., 2:3]

        phase_preds: List[jnp.ndarray] = []
        amp_preds: List[jnp.ndarray] = []
        for idx in range(m):
            h, w = phases[idx].shape[1:3]
            feat_r = resize_bilinear(feat, (h, w), align_corners=False)
            pred_r = resize_bilinear(pred, (h, w), align_corners=False)
            pin = phases[idx] if cdt is None else phases[idx].astype(cdt)
            ain = amps[idx] if cdt is None else amps[idx].astype(cdt)
            x = jnp.concatenate([feat_r, pin, ain, pred_r], axis=-1)
            i = min(idx + 1, len(self.blocks) - 1)
            feat, pred = self.blocks[i](x, train=train)

            predf = pred.astype(jnp.float32)
            beta = (predf[..., nb : 2 * nb] + 1.0) / 2.0
            amp = beta * amps[idx][..., nb : 2 * nb] + (1.0 - beta) * amps[idx][
                ..., 0:nb
            ]
            if self.num_img == 3:
                fusion_beta = (predf[..., 2 * nb : 3 * nb] + 1.0) / 2.0
                amp = fusion_beta * amp + (1.0 - fusion_beta) * amps[idx][
                    ..., 2 * nb : 3 * nb
                ]
            phase_preds.append(predf[..., 0:nb])
            amp_preds.append(amp)

        return low_pred, phase_preds, amp_preds


def predictions_to_decomp(
    low_pred: jnp.ndarray,
    phase_preds: Sequence[jnp.ndarray],
    amp_preds: Sequence[jnp.ndarray],
    norm: NormState,
    high: jnp.ndarray,
    total_levels: Optional[int] = None,
) -> Decomp:
    """Denormalize (reverse_normalize, core.py:92-119) and repack the net's
    coarse-first NHWC predictions into a fine-first Decomp for reconstruction.
    `high` is the highpass residual to carry (zeros per core.py:142-145, or
    AdaCoF's highpass in the high_level-swap variant)."""
    m = len(phase_preds)
    total = total_levels if total_levels is not None else m

    phase_out = []
    amp_out = []
    for i in range(m):
        p = phase_preds[i] * math.pi
        a = amp_preds[i] * norm.max_amps[i]
        # NHWC (B,h,w,nbands) -> (B,nbands,h,w)
        phase_out.append(jnp.transpose(p, (0, 3, 1, 2)))
        amp_out.append(jnp.transpose(a, (0, 3, 1, 2)))

    low = (low_pred * norm.max_low)[..., 0]  # (B, h, w)

    # fine-first ordering, padding unpredicted (coarsest-beyond-m) levels is
    # the hierarchical-training case; reconstruction requires all levels, so
    # callers must exchange_levels() those in first (as the reference does).
    phase_out = phase_out[::-1]
    amp_out = amp_out[::-1]
    if m < total:
        raise ValueError(
            "predict fewer levels than the pyramid has: exchange_levels() the "
            "missing ones before reconstruction (hierarchical training)"
        )
    return Decomp(high=high, low=low, phase=tuple(phase_out), amplitude=tuple(amp_out))
