"""Video / frame-directory interpolation (frame-rate doubling).

Mirrors /root/reference/src/fusion_net/interpolate_video.py and
src/adacof/interpolate_video.py — but instead of a per-pair Python loop that
re-enters the framework (and, in the reference, reloads PhaseNet from disk
per pair), this decodes on the host, keeps one compiled executable per
resolution bucket, and overlaps host decode with device compute via a
one-deep prefetch.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pyramid import make_filters, max_pyr_height
from .interpolate import FusionWeights, fusion_interpolate, phase_interpolate


def read_video_frames(path: str, resize=None) -> np.ndarray:
    """Decode an mp4/avi into (N, H, W, 3) float32 RGB in [0,1] (host, cv2)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        if resize is not None:
            bgr = cv2.resize(bgr, (resize[1], resize[0]))
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames).astype(np.float32) / 255.0


def read_frame_dir(path: str) -> np.ndarray:
    """Read a sorted directory of PNG/JPG frames into (N, H, W, 3) [0,1]."""
    import cv2

    names = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise ValueError(f"no frames in {path}")
    frames = []
    for n in names:
        bgr = cv2.imread(os.path.join(path, n))
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    return np.stack(frames).astype(np.float32) / 255.0


def write_frame_dir(path: str, frames: Sequence[np.ndarray]) -> None:
    import cv2

    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(frames):
        bgr = cv2.cvtColor((np.asarray(f) * 255).clip(0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(path, f"{i:05d}.png"), bgr)


def _interp_fn(weights, h: int, w: int, method: str,
               variant: int = 0, uncertainty_maps: int = 3):
    if method == "fusion":
        # fusion_interpolate reflect-pads off-/8 inputs internally, so its
        # filter bank must be built at the PADDED resolution
        ph, pw = (-h) % 8, (-w) % 8
        filters = jax.tree.map(
            jnp.asarray,
            make_filters(h + ph, w + pw, max_pyr_height(h + ph, w + pw)),
        )
        jfn = jax.jit(
            lambda wts, flt, a, b: fusion_interpolate(
                wts, a, b, filters=flt,
                variant=variant, uncertainty_maps=uncertainty_maps,
            )
        )
        return lambda a, b: jfn(weights, filters, a, b)
    filters = jax.tree.map(jnp.asarray, make_filters(h, w, max_pyr_height(h, w)))
    if method == "phase":
        jfn = jax.jit(
            lambda wts, flt, a, b: phase_interpolate(wts, a, b, filters=flt)
        )
        return lambda a, b: jfn(weights.phase_net, filters, a, b)
    if method == "adacof":
        from .interpolate import adacof_interpolate

        jfn = jax.jit(lambda wts, a, b: adacof_interpolate(wts, a, b))
        return lambda a, b: jfn(weights.adacof, a, b)
    if method == "baseline":
        from .interpolate import baseline_interpolate

        jfn = jax.jit(
            lambda wts, flt, a, b: baseline_interpolate(wts, a, b, filters=flt)
        )
        return lambda a, b: jfn(weights, filters, a, b)
    raise ValueError(f"unknown method {method}")


def double_frame_rate(
    frames: np.ndarray, weights: FusionWeights, method: str = "fusion",
    variant: int = 0, uncertainty_maps: int = 3, stream: bool = False,
    batch: int = 1,
) -> Iterator[np.ndarray]:
    """Yield the 2x-rate sequence f0, mid01, f1, mid12, f2, ... .

    Device compute for pair i+1 is dispatched before pair i's result is
    fetched (JAX async dispatch), overlapping transfer with compute.

    For the fusion method `stream=True` opts into the STREAMING pipeline
    (fusion_stream_step): the frame shared between consecutive pairs is
    color-converted + pyramid-decomposed once, and the baseline pass-3
    U-Net of pair i batches with the main AdaCoF pass of pair i+1 —
    identical math (tests/test_pipeline.py pins stream == per-pair), fewer
    device passes per frame.  It is NOT the default: despite the lower
    per-frame op count, the carried pyramid decomposition crosses the jit
    boundary each step, forcing every band to materialize in HBM and
    defeating the FFT/elementwise fusion the per-pair graph gets — measured
    0.55 vs 1.07 fps at 1080p on this chip (bench.py --stream).

    `batch` > 1 interpolates that many CONSECUTIVE pairs per device
    dispatch (offline-throughput mode: bigger batches fill the MXU better
    than the latency-oriented stream; the ragged tail is padded to keep one
    compiled executable).  Overrides `stream`."""
    n, h, w, _ = frames.shape
    if n < 2:  # nothing to interpolate between
        for f in frames:
            yield f
        return
    if batch > 1:
        yield from _double_frame_rate_batched(
            frames, weights, method, variant, uncertainty_maps, batch
        )
        return
    if method == "fusion" and stream:
        yield from _double_frame_rate_stream(
            frames, weights, variant, uncertainty_maps
        )
        return
    fn = _interp_fn(weights, h, w, method, variant, uncertainty_maps)
    pending = None  # (original frame to emit first, device result)
    for i in range(n - 1):
        a = jnp.asarray(frames[i][None])
        b = jnp.asarray(frames[i + 1][None])
        result = fn(a, b)  # dispatched asynchronously
        if pending is not None:
            orig, dev = pending
            yield orig
            yield np.asarray(dev)[0]
        pending = (frames[i], result)
    orig, dev = pending
    yield orig
    yield np.asarray(dev)[0]
    yield frames[-1]


def multiply_frame_rate(
    frames: np.ndarray, weights: FusionWeights, method: str = "fusion",
    variant: int = 0, uncertainty_maps: int = 3, factor: int = 2,
    stream: bool = False, batch: int = 1,
) -> Iterator[np.ndarray]:
    """Yield the `factor`x-rate sequence by recursive midpoint doubling.

    `factor` must be a power of two: the models are trained for the t=0.5
    midpoint, so higher rates come from repeated doubling rather than
    arbitrary-t sampling.  Each doubling pass reuses the same compiled
    executable (the spatial shape is unchanged), so a 4x pass costs ~3x the
    device work of a 2x pass on the same clip (N-1 then 2N-2 pairs).  The
    reference supports 2x only (src/fusion_net/interpolate_video.py:84-114).
    """
    if factor < 2 or factor & (factor - 1):
        raise ValueError(f"factor must be a power of two >= 2, got {factor}")
    cur = np.asarray(frames)
    while factor > 2:
        cur = np.stack(
            list(
                double_frame_rate(
                    cur, weights, method, variant, uncertainty_maps,
                    stream=stream, batch=batch,
                )
            )
        )
        factor //= 2
    yield from double_frame_rate(
        cur, weights, method, variant, uncertainty_maps,
        stream=stream, batch=batch,
    )


def _double_frame_rate_batched(
    frames: np.ndarray, weights: FusionWeights, method: str,
    variant: int, uncertainty_maps: int, batch: int,
) -> Iterator[np.ndarray]:
    """Offline-throughput body of double_frame_rate: `batch` consecutive
    pairs per device dispatch, one-deep prefetch, ragged tail padded with
    the last pair (padding results discarded) so every dispatch reuses the
    same compiled executable."""
    n, h, w, _ = frames.shape
    fn = _interp_fn(weights, h, w, method, variant, uncertainty_maps)
    n_pairs = n - 1
    pending = None  # (valid pair indices, device result)
    for s in range(0, n_pairs, batch):
        idx = np.arange(s, min(s + batch, n_pairs))
        valid = idx
        if len(idx) < batch:  # pad the tail to the compiled batch shape
            idx = np.concatenate(
                [idx, np.full(batch - len(idx), n_pairs - 1, dtype=idx.dtype)]
            )
        result = fn(jnp.asarray(frames[idx]), jnp.asarray(frames[idx + 1]))
        if pending is not None:
            p_valid, dev = pending
            out = np.asarray(dev)
            for k, i in enumerate(p_valid):
                yield frames[i]
                yield out[k]
        pending = (valid, result)
    p_valid, dev = pending
    out = np.asarray(dev)
    for k, i in enumerate(p_valid):
        yield frames[i]
        yield out[k]
    yield frames[-1]


def _double_frame_rate_stream(
    frames: np.ndarray, weights: FusionWeights,
    variant: int, uncertainty_maps: int,
) -> Iterator[np.ndarray]:
    """Streaming-fusion body of double_frame_rate (one-step latency: the
    fused middle of pair i is emitted while pair i+1 computes)."""
    from .interpolate import fusion_stream_init, fusion_stream_step

    n, h, w, _ = frames.shape
    ph, pw = (-h) % 8, (-w) % 8
    filters = jax.tree.map(
        jnp.asarray, make_filters(h + ph, w + pw, max_pyr_height(h + ph, w + pw))
    )
    # the carry (~0.4 GB of pyramid buffers at 1080p) is donated so XLA
    # aliases it in place instead of holding old+new copies per in-flight
    # step — without this, async dispatch of a few steps pins multiple GB
    # of HBM and the allocator stalls the stream well below the per-pair
    # path's throughput
    jstep = jax.jit(
        lambda wts, flt, c, f: fusion_stream_step(
            wts, c, f, filters=flt,
            variant=variant, uncertainty_maps=uncertainty_maps,
        ),
        donate_argnums=(2,),
    )

    def dev(i):
        f = frames[i][None]
        if ph or pw:
            f = np.pad(f, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect")
        return jnp.asarray(f)

    jinit = jax.jit(lambda flt, f: fusion_stream_init(f, flt, uncertainty_maps))
    carry = jinit(filters, dev(0))
    carry, _discard = jstep(weights, filters, carry, dev(1))  # primes pair 0
    for i in range(1, n):
        # flush step: the pending pair's output only depends on carried
        # tensors, so the final extra step can feed any frame
        nxt = dev(i + 1) if i + 1 < n else dev(n - 1)
        carry, fused = jstep(weights, filters, carry, nxt)
        yield frames[i - 1]
        yield np.asarray(fused)[0, :h, :w]
    yield frames[-1]


def interpolate_video_file(
    src: str,
    dst_dir: str,
    weights: FusionWeights,
    method: str = "fusion",
    resize=None,
) -> int:
    """Read a video, double its frame rate, write PNGs.  Returns frame count."""
    frames = read_video_frames(src, resize=resize)
    out = list(double_frame_rate(frames, weights, method))
    write_frame_dir(dst_dir, out)
    return len(out)
