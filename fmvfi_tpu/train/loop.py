"""Training-loop driver: epochs, periodic probes, checkpoints, observability.

One structured system replacing the reference's scattered artifacts
(SURVEY §5): log.txt file handles (train/trainer.py:47), loss_history ->
np.savetxt + matplotlib curves (train/train.py:123-131), per-epoch PSNR probe
logfiles (adacof/TestModule.py:43-64), per-N-step checkpoints
(fusion_net/trainer.py:272), and config.txt dumps (train/train.py:107-111).

- `MetricsWriter`: JSONL stream + CSV summary + loss-curve PNG.
- `PsnrProbe`: fixed probe triplets scored every epoch (the Middlebury-other
  per-epoch PSNR equivalent; probe sets are synthetic here since the
  reference's datasets are not on this mount).
- `fit()`: epoch loop gluing a (state, step_fn) pair from train.trainer to a
  batch iterator, with orbax resume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import numpy as np

import jax


class MetricsWriter:
    def __init__(self, out_dir: str, name: str = "train"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.name = name
        self.path = os.path.join(out_dir, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self.history: Dict[str, list] = {}

    def write(self, step: int, metrics: Dict[str, float], **extra):
        rec = {"step": int(step), "time": time.time(), **extra}
        for k, v in metrics.items():
            v = float(v)
            rec[k] = v
            self.history.setdefault(k, []).append((step, v))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def plot(self, keys: Optional[Sequence[str]] = None):
        """Loss-curve PNG (train/train.py:125-131 equivalent)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = keys or [k for k in self.history if k.endswith("loss") or k == "loss"]
        fig, ax = plt.subplots(figsize=(8, 4))
        for k in keys:
            if k in self.history:
                xs, ys = zip(*self.history[k])
                ax.plot(xs, ys, label=k)
        ax.set_xlabel("step")
        ax.set_ylabel("value")
        ax.legend()
        fig.tight_layout()
        path = os.path.join(self.out_dir, f"{self.name}_curve.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    def close(self):
        self._f.close()


class PsnrProbe:
    """Score fixed triplets with a predict_fn(state, f1, f2) -> pred."""

    def __init__(self, triplets, predict_fn: Callable):
        self.triplets = triplets  # list of (f1, mid, f2) arrays (H, W, 3)
        self.predict_fn = predict_fn

    @classmethod
    def from_middlebury(cls, input_dir: str, gt_dir: str, predict_fn: Callable):
        """Per-epoch Middlebury-other PSNR probe (the reference's training
        regression gate, adacof/trainer.py:33,60 + TestModule.py:43-64)."""
        from ..eval.datasets import middlebury_other

        scenes = middlebury_other(input_dir, gt_dir)
        return cls([scenes[k] for k in sorted(scenes)], predict_fn)

    def __call__(self, state) -> float:
        import jax.numpy as jnp

        psnrs = []
        for f1, mid, f2 in self.triplets:
            pred = self.predict_fn(state, jnp.asarray(f1[None]), jnp.asarray(f2[None]))
            pred = np.asarray(pred)
            mse = np.mean((pred[0] - mid) ** 2)
            psnrs.append(-10 * np.log10(max(mse, 1e-12)))
        return float(np.mean(psnrs))


def fit(
    state,
    step_fn: Callable,
    batches: Iterable,
    out_dir: str,
    epochs: int = 1,
    steps_per_epoch: Optional[int] = None,
    log_every: int = 50,
    ckpt_every: int = 500,
    probe: Optional[PsnrProbe] = None,
    resume: bool = True,
    jit: bool = True,
    make_step: Optional[Callable[[Optional[int]], Callable]] = None,
    m_init: Optional[int] = None,
    m_update: int = 500,
    m_max: int = 10,
    wrap_step: Optional[Callable[[Callable], Callable]] = None,
    image_probe: Optional[Callable] = None,
    image_every: int = 100,
):
    """Run the loop.  `batches` yields (f1, target, f2) NHWC batches forever;
    an epoch is `steps_per_epoch` batches (or one pass if the iterator is
    finite and steps_per_epoch is None).

    Hierarchical-m training (PhaseNet): pass `make_step` (from
    make_phase_trainer) and `m_init`; m increments every `m_update` batches
    within an epoch, capped at `m_max`, and the step is rebuilt (recompiled)
    at each increment — the reference's schedule at
    /root/reference/src/train/trainer.py:162-163.

    `image_probe(state) -> (H, W, 3) array`: rendered to
    <out_dir>/result/step_<N>.png every `image_every` steps (the reference's
    fixed sample-frame renders, train/trainer.py:140-142)."""
    from ..utils.checkpoint import Checkpointer

    writer = MetricsWriter(out_dir)
    ckptr = Checkpointer(os.path.join(out_dir, "checkpoint"))
    if resume and ckptr.latest() is not None:
        state = ckptr.restore(state)

    # `wrap_step` re-applies any outer wrapper (e.g. data_parallel sharding)
    # every time the hierarchical-m schedule rebuilds the step — without it,
    # --data_parallel + --m silently dropped the DP wrapper on rebuild
    _wrap = wrap_step if wrap_step is not None else (lambda f: f)
    it = iter(batches)
    step = int(np.asarray(state.step)) if hasattr(state, "step") else 0

    # resume mid-schedule: replay the epoch structure so epoch numbering,
    # the in-epoch counter n, and the per-epoch m schedule (the reference
    # increments on batch_idx, which RESETS each epoch — trainer.py:162)
    # land exactly where an uninterrupted run would be at the restored step
    if step and steps_per_epoch:
        start_epoch, resume_n = divmod(step, steps_per_epoch)
    else:
        start_epoch, resume_n = 0, 0

    m = m_init
    if make_step is not None and m is not None:
        if step:
            if steps_per_epoch:
                per_epoch = steps_per_epoch // m_update
                inc = start_epoch * per_epoch + resume_n // m_update
            else:
                inc = step // m_update  # single continuous pass
            m = min(m_max, m_init + inc)
        step_fn = make_step(m)
    fn = jax.jit(_wrap(step_fn)) if jit else _wrap(step_fn)

    for epoch in range(start_epoch, epochs):
        n = resume_n if epoch == start_epoch else 0
        while steps_per_epoch is None or n < steps_per_epoch:
            try:
                batch = next(it)
            except StopIteration:
                break
            state, metrics = fn(state, batch)
            step += 1
            n += 1
            if step % log_every == 0:
                writer.write(step, metrics, epoch=epoch, **({"m": m} if m is not None else {}))
            if step % ckpt_every == 0:
                ckptr.save(step, state)
                writer.plot()
            if image_probe is not None and step % image_every == 0:
                import cv2

                img = np.asarray(image_probe(state))
                d = os.path.join(out_dir, "result")
                os.makedirs(d, exist_ok=True)
                cv2.imwrite(
                    os.path.join(d, f"step_{step:06d}.png"),
                    cv2.cvtColor(
                        (img * 255).clip(0, 255).astype(np.uint8),
                        cv2.COLOR_RGB2BGR,
                    ),
                )
            if (
                make_step is not None
                and m is not None
                and n % m_update == 0
                and n > 0
                and m < m_max
            ):
                m += 1
                step_fn = make_step(m)
                fn = jax.jit(_wrap(step_fn)) if jit else _wrap(step_fn)
        if probe is not None:
            p = probe(state)
            writer.write(step, {"probe_psnr": p}, epoch=epoch)
        ckptr.save(step, state)
        writer.plot()

    writer.close()
    return state
