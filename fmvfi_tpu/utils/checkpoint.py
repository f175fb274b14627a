"""Checkpoint save/restore.

The reference checkpoints ad-hoc with torch.save per epoch / every N steps
(train/train.py:116, fusion_net/trainer.py:272).  Here:

- `save_msgpack` / `load_msgpack`: flax.serialization for small weight
  pytrees (the published-model format of this repo, *.msgpack).
- `Checkpointer`: orbax-backed train-state checkpointing with resume —
  step-numbered, atomic, with a `latest()` lookup (the failure-recovery
  story the reference lacked).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_msgpack(path: str, tree: Any) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(lambda x: x, tree)))


def load_msgpack(path: str, like: Any) -> Any:
    """Restore a pytree with the structure of `like` (pass a template from
    model.init or the converter)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


class Checkpointer:
    """Step-numbered orbax checkpointing for TrainState pytrees."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self._dir, f"step_{step:08d}")

    def save(self, step: int, state: Any) -> None:
        self._ckptr.save(self._path(step), state, force=True)
        self._ckptr.wait_until_finished()

    def latest(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self._dir):
            if name.startswith("step_"):
                try:
                    steps.append(int(name[5:]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        return self._ckptr.restore(self._path(step), state_template)
