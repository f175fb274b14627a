"""Host-side input pipeline.

Replacement for /root/reference/src/train/datareader.py's torch Dataset with
a disabled worker pool (num_workers=0, train/train.py:74): a plain-numpy
Vimeo90k triplet reader with the same augmentations (shared random crop,
h/v flips, time reversal — datareader.py:45-69) plus a thread-prefetched
batch iterator that overlaps PNG decode with device compute.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


class Vimeo90kTriplets:
    """vimeo_triplet/sequences/<seq>/<clip>/im{1,2,3}.png reader."""

    def __init__(self, db_dir: str):
        seq_dir = os.path.join(db_dir, "sequences")
        self.triplets = []
        for seq in sorted(os.listdir(seq_dir)):
            sp = os.path.join(seq_dir, seq)
            if not os.path.isdir(sp):
                continue
            for clip in sorted(os.listdir(sp)):
                cp = os.path.join(sp, clip)
                if os.path.isdir(cp):
                    self.triplets.append(cp)
        if not self.triplets:
            raise ValueError(f"no triplets under {seq_dir}")

    def __len__(self):
        return len(self.triplets)

    def load_u8(self, index: int) -> np.ndarray:
        """(3, H, W, 3) uint8 RGB triplet (native-augmentation fast path)."""
        import cv2

        path = self.triplets[index]
        frames = []
        for i in (1, 2, 3):
            bgr = cv2.imread(os.path.join(path, f"im{i}.png"))
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        return np.stack(frames)

    def load(self, index: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return tuple(f.astype(np.float32) / 255.0 for f in self.load_u8(index))


class SyntheticTriplets:
    """In-memory stand-in dataset (tests / demos without Vimeo90k on disk).

    mixed=True cycles through all six motion regimes of eval.synth
    (translation, large motion, rotation, zoom, occlusion, brightness) with
    jittered parameters — the training diet for the bundled demo AdaCoF."""

    def __init__(self, n: int = 64, h: int = 256, w: int = 448, mixed: bool = False):
        from ..eval import synth

        self._items = []
        for i in range(n):
            if not mixed:
                self._items.append(
                    synth.translation_triplet(
                        h, w, dx=float(2 + i % 6), dy=float(i % 3), seed=i
                    )
                )
                continue
            k = i % 6
            if k == 0:
                v = synth.translation_video(3, h, w, step=1.0 + (i % 8), seed=i)
            elif k == 1:
                v = synth.large_motion_video(3, h, w, step=8.0 + 3 * (i % 5), seed=i)
            elif k == 2:
                v = synth.rotation_video(3, h, w, deg_per_frame=0.5 + 0.5 * (i % 4), seed=i)
            elif k == 3:
                v = synth.zoom_video(3, h, w, scale_per_frame=1.005 + 0.005 * (i % 4), seed=i)
            elif k == 4:
                v = synth.occlusion_video(
                    3, h, w, fg_step=2.0 + 2 * (i % 3), bg_step=-1.0 - (i % 2), seed=i
                )
            else:
                v = synth.brightness_video(3, h, w, step=1.0 + (i % 4), seed=i)
            self._items.append((v[0], v[1], v[2]))

    def __len__(self):
        return len(self._items)

    def load(self, index: int):
        return self._items[index]


class MixedSynthStream:
    """Large continuously-jittered mixed-regime synthetic pool.

    Fixes the failure mode of the round-2 demo diet (SyntheticTriplets
    n=64 with DISCRETE displacement steps): the trained AdaCoF interpolated
    its training displacements well but collapsed ~12 dB at intermediate
    ones (tools/sweep_displacement.py).  Here every scene draws its regime
    parameters from CONTINUOUS ranges covering the eval suite
    (eval/synth.benchmark_sets: translation 4 px/f, large motion 24 px/f,
    rotation 1.5 deg/f, zoom 1.02/f, occlusion 6/-2, brightness 2 px @
    0.93 gain) with off-axis motion directions, and the pool is large
    enough (default 768 scenes) that crops/flips make memorization
    unprofitable.  Frames are stored u8 (the native C++ augmentation fast
    path applies), generated on a thread pool."""

    def __init__(
        self,
        n: int = 768,
        h: int = 288,
        w: int = 448,
        seed0: int = 1000,
        workers: int = 8,
        photo_frac: float = 0.0,
    ):
        from concurrent.futures import ThreadPoolExecutor

        self._items = [None] * n

        def gen_photo(i, rng, k):
            """Same continuous regime jitter, natural-photo sources
            (synth.natural_video over the bundled photo pool) — the
            offline stand-in for the reference's Vimeo90k diet."""
            from ..eval import synth

            angle = rng.uniform(0, 2 * np.pi)
            if k == 0:
                step = rng.uniform(0.25, 8.0)
                kw = dict(dx=step * np.cos(angle), dy=step * np.sin(angle))
            elif k == 1:
                step = rng.uniform(8.0, 28.0)
                kw = dict(
                    dx=step * (1.0 if rng.random() < 0.5 else -1.0),
                    dy=rng.uniform(-4, 4),
                )
            elif k == 2:
                kw = dict(deg_per_frame=rng.uniform(0.25, 2.5))
            elif k == 3:
                kw = dict(scale_per_frame=rng.uniform(1.003, 1.028))
            elif k == 4:
                kw = dict(
                    fg_step=rng.uniform(1.0, 8.0)
                    * (1 if rng.random() < 0.5 else -1),
                    dx=rng.uniform(-4.0, 4.0),
                )
            else:
                step = rng.uniform(0.5, 4.0)
                kw = dict(
                    dx=step * np.cos(angle),
                    dy=step * np.sin(angle),
                    gain_per_frame=rng.uniform(0.88, 0.97),
                )
            return synth.natural_video(3, h, w, seed=seed0 + i, **kw)

        def gen(i):
            from ..eval import synth

            rng = np.random.default_rng(seed0 + i)
            k = i % 6
            if rng.random() < photo_frac:
                v = gen_photo(i, rng, k)
                if k == 5:  # same absolute-gain coverage as the synthetic
                    v = v * rng.uniform(0.55, 1.0)  # brightness branch below
                self._items[i] = np.clip(v * 255.0 + 0.5, 0, 255).astype(np.uint8)
                return
            angle = rng.uniform(0, 2 * np.pi)
            if k == 0:  # translation, step in [0.25, 8] px/frame, any direction
                step = rng.uniform(0.25, 8.0)
                f = synth.translation_triplet(
                    h, w,
                    dx=2 * step * np.cos(angle),
                    dy=2 * step * np.sin(angle),
                    seed=seed0 + i,
                )
                v = np.stack(f)
            elif k == 1:  # large motion, 8..28 px/frame (mostly horizontal:
                # the triplet margin grows with |d|, keep dy modest).  The
                # magnitude must NOT be scaled by cos(angle) — that collapses
                # the documented 8-28 px range to [0, 28] with a sparse tail
                # (the r2 coverage-hole failure mode); a random sign keeps
                # both directions while preserving |dx| = 2*step.
                step = rng.uniform(8.0, 28.0)
                f = synth.translation_triplet(
                    h, w,
                    dx=2 * step * (1.0 if rng.random() < 0.5 else -1.0),
                    dy=2 * rng.uniform(-4, 4),
                    seed=seed0 + i,
                )
                v = np.stack(f)
            elif k == 2:
                v = synth.rotation_video(
                    3, h, w, deg_per_frame=rng.uniform(0.25, 2.5), seed=seed0 + i
                )
            elif k == 3:
                v = synth.zoom_video(
                    3, h, w,
                    scale_per_frame=rng.uniform(1.003, 1.028),
                    seed=seed0 + i,
                )
            elif k == 4:
                v = synth.occlusion_video(
                    3, h, w,
                    fg_step=rng.uniform(1.0, 8.0) * (1 if rng.random() < 0.5 else -1),
                    bg_step=rng.uniform(-4.0, 4.0),
                    seed=seed0 + i,
                )
            else:
                v = synth.brightness_video(
                    3, h, w,
                    step=rng.uniform(0.5, 4.0),
                    gain_per_frame=rng.uniform(0.88, 0.97),
                    seed=seed0 + i,
                )
                # random ABSOLUTE starting gain: the eval's 12-frame 0.93^t
                # ramps score triplets down to ~0.5x absolute luminance, but
                # a fresh 3-frame ramp never leaves [0.77, 1] — mid-ramp
                # states were out of the training support, which is exactly
                # where the leg-B gate collapsed (results_r5 brightness
                # per-triplet curves: ~25 dB vs AdaCoF's 47 at gain ~0.7)
                v = v * rng.uniform(0.55, 1.0)
            self._items[i] = np.clip(v * 255.0 + 0.5, 0, 255).astype(np.uint8)

        if photo_frac > 0.0:
            from ..eval import synth

            synth.photo_sources()  # warm the cache before the thread fan-out
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(gen, range(n)))

    def __len__(self):
        return len(self._items)

    def load_u8(self, index: int) -> np.ndarray:
        return self._items[index]

    def load(self, index: int):
        return tuple(
            f.astype(np.float32) / 255.0 for f in self._items[index]
        )


def augment_triplet(
    frames: Sequence[np.ndarray],
    rng: np.random.Generator,
    crop: Optional[int] = 256,
    augment_s: bool = True,
    augment_t: bool = True,
):
    """Shared random crop + flips + time reversal (datareader.py:45-69)."""
    f0, f1, f2 = frames
    if crop is not None:
        h, w = f0.shape[:2]
        if h < crop or w < crop:
            raise ValueError(f"frame {h}x{w} smaller than crop {crop}")
        y = int(rng.integers(0, h - crop + 1))
        x = int(rng.integers(0, w - crop + 1))
        f0, f1, f2 = (f[y : y + crop, x : x + crop] for f in (f0, f1, f2))
    if augment_s:
        if rng.random() < 0.5:
            f0, f1, f2 = (f[:, ::-1] for f in (f0, f1, f2))
        if rng.random() < 0.5:
            f0, f1, f2 = (f[::-1] for f in (f0, f1, f2))
    if augment_t and rng.random() < 0.5:
        f0, f2 = f2, f0
    return np.ascontiguousarray(f0), np.ascontiguousarray(f1), np.ascontiguousarray(f2)


def batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    crop: Optional[int] = 256,
    shuffle: bool = True,
    prefetch: int = 2,
    epochs: Optional[int] = None,
    use_native: Optional[bool] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (frame1, target, frame2) batches, each (B, crop, crop, 3),
    decoded+augmented on a background thread.

    When the dataset exposes `load_u8` and the native C++ augmentation
    library builds (fmvfi_tpu.native), the crop/flip/normalize/batch-assembly
    runs multithreaded in C++ (use_native=None auto-detects)."""
    rng = np.random.default_rng(seed)
    native_mod = None
    if use_native is not False and hasattr(dataset, "load_u8") and crop:
        from .. import native as native_mod_  # noqa

        if native_mod_.available():
            native_mod = native_mod_
        elif use_native:
            raise RuntimeError("native augmentation requested but unavailable")
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        epoch = 0
        try:
            while not stop.is_set() and (epochs is None or epoch < epochs):
                order = (
                    rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
                )
                for s in range(0, len(order) - batch_size + 1, batch_size):
                    if stop.is_set():
                        return
                    idx = order[s : s + batch_size]
                    if native_mod is not None:
                        raw = np.stack([dataset.load_u8(int(i)) for i in idx])
                        hh, ww = raw.shape[2], raw.shape[3]
                        params = np.stack(
                            [
                                [
                                    rng.integers(0, hh - crop + 1),
                                    rng.integers(0, ww - crop + 1),
                                    rng.random() < 0.5,
                                    rng.random() < 0.5,
                                    rng.random() < 0.5,
                                ]
                                for _ in idx
                            ]
                        ).astype(np.int32)
                        batch = native_mod.augment_batch(raw, crop, params)
                    else:
                        items = [
                            augment_triplet(dataset.load(int(i)), rng, crop=crop)
                            for i in idx
                        ]
                        batch = tuple(
                            np.stack([it[j] for it in items]) for j in range(3)
                        )
                    # bounded put that keeps observing `stop`: a plain
                    # q.put(batch) blocks forever once the consumer exits
                    # with the queue full, leaking the thread + its batches
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                epoch += 1
        finally:
            while True:
                try:
                    q.put(None, timeout=0.2)
                    break
                except queue.Full:
                    # evict ONLY once the consumer is known gone (stop set);
                    # a merely-slow consumer must still see every real batch
                    if stop.is_set():
                        try:
                            q.get_nowait()
                        except queue.Empty:
                            pass

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
