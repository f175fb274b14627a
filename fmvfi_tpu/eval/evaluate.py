"""Evaluation harness: sweep datasets, interpolate every triplet, score.

Re-design of /root/reference/src/evaluation/{evaluate.py,interpolate.py,
evaluate_image.py}: per test set, every consecutive triplet (i, i+1, i+2) is
interpolated from frames i and i+2 and scored against frame i+1
(center-cropped to `dim`, default 512 — evaluate.py:73).  Results cache to
.npz keyed by set name (evaluate.py:270-279's resumability, one format).

Datasets here are (N, H, W, 3) float arrays or frame directories; the
reference's Testset mp4s are LFS-absent from this mount, so `synthetic_sets`
provides scored stand-ins with exact ground truth.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..pipeline.video import read_frame_dir, read_video_frames, _interp_fn
from .metrics import all_metrics
from .synth import translation_video

METRIC_NAMES = ("ssim", "lpips_sub", "psnr", "ssd", "l1", "mean_diff", "var_diff")

# one jitted metrics fn per process (a fresh jax.jit per evaluate_frames call
# never hits the executable cache — see pipeline.video._jit_core)
_JMETRICS = None


def _jmetrics():
    global _JMETRICS
    if _JMETRICS is None:
        _JMETRICS = jax.jit(jax.vmap(all_metrics))
    return _JMETRICS


def crop_center(img: np.ndarray, dim: int) -> np.ndarray:
    h, w = img.shape[-3:-1]
    if dim >= min(h, w):
        return img
    y0 = h // 2 - dim // 2
    x0 = w // 2 - dim // 2
    return img[..., y0 : y0 + dim, x0 : x0 + dim, :]


def _upload(batch: np.ndarray) -> jnp.ndarray:
    """Host->device: u8 frames transfer as u8 and normalize ON DEVICE
    (4x less PCIe/tunnel traffic; float frames upload unchanged, so the
    all-float legacy path is bit-identical to before)."""
    if batch.dtype == np.uint8:
        return jnp.asarray(batch).astype(jnp.float32) / 255.0
    return jnp.asarray(batch)


def evaluate_frames(
    frames,
    weights,
    method: str = "fusion",
    dim: int = 512,
    max_num: Optional[int] = None,
    return_preds: bool = False,
    batch_size: int = 4,
    lpips_fn=None,
    variant: int = 0,
    uncertainty_maps: int = 3,
) -> Dict[str, np.ndarray]:
    """Score every (i, i+1, i+2) triplet.  Returns {metric: (n_triplets,)}.

    `frames` is either a whole (N, H, W, 3) array (float [0,1] or uint8) or
    an ITERATOR of (H, W, 3) frames — the streaming form decodes-as-it-
    scores with a 3-frame rolling window, holding at most `batch_size`
    triplets on the host, so a 1080p multi-hundred-frame clip sweep fits a
    small host (the reference's evaluate.py:219-300 holds the full clip;
    so did we until r4).  uint8 frames stay uint8 until device upload.

    `lpips_fn` (from metrics.make_vgg_lpips): adds the real VGG-feature
    LPIPS column (the reference's piq metric, evaluate_image.py:21-28).

    Triplet pairs are STACKED and run through the jitted pipeline at
    batch > 1 (the reference loops one pair at a time and even reloads
    PhaseNet per pair, interpolate_twoframe.py:135-137); metrics are vmapped.
    With return_preds=True the dict also carries "preds": (n, H, W, 3) uint8
    for visualization (avoid with streaming sweeps — it accumulates)."""
    it = iter(frames)  # a 4-D array iterates as (H, W, 3) frames
    jmetrics = _jmetrics()

    out: Dict[str, List[np.ndarray]] = {k: [] for k in METRIC_NAMES}
    preds_all: List[np.ndarray] = []
    fn = None
    h = w = None

    def flush(tri: List[np.ndarray]):
        nonlocal fn, h, w
        f1 = np.stack([t[0] for t in tri])
        tgt = np.stack([t[1] for t in tri])
        f2 = np.stack([t[2] for t in tri])
        if fn is None:
            h, w = f1.shape[1:3]
            fn = _interp_fn(weights, h, w, method, variant, uncertainty_maps)
        preds = fn(_upload(f1), _upload(f2))
        dtgt = _upload(tgt)
        m = jmetrics(preds, dtgt)
        for k in METRIC_NAMES:
            out[k].append(np.asarray(m[k]))
        if lpips_fn is not None:
            out.setdefault("lpips_vgg", []).append(
                np.asarray(
                    [float(lpips_fn(preds[j], dtgt[j])) for j in range(preds.shape[0])]
                )
            )
        if return_preds:
            preds_all.append(
                (np.asarray(preds) * 255.0).clip(0, 255).astype(np.uint8)
            )

    window: List[np.ndarray] = []
    pending: List[np.ndarray] = []
    n_done = 0
    for frame in it:
        window.append(crop_center(np.asarray(frame), dim))
        if len(window) > 3:
            window.pop(0)
        if len(window) == 3:
            pending.append((window[0], window[1], window[2]))
            n_done += 1
            if len(pending) == batch_size:
                flush(pending)
                pending = []
            if max_num is not None and n_done >= max_num:
                break
    if pending:
        flush(pending)

    result = {k: np.concatenate(v) if v else np.zeros(0) for k, v in out.items()}
    if return_preds:
        result["preds"] = (
            np.concatenate(preds_all)
            if preds_all
            else np.zeros((0, h or 0, w or 0, 3), np.uint8)
        )
    return result


def synthetic_sets(
    dim: int = 512,
    n_frames: int = 6,
    include_photo: bool = False,
    seeds: Sequence[int] = (0,),
) -> Dict[str, np.ndarray]:
    """Stand-ins for the LFS-absent Testset clips, one set per motion regime
    (translation / large motion / rotation / zoom / occlusion / brightness —
    the regimes the fusion architecture is motivated by) plus the legacy
    step-translation sets.  `include_photo` adds a real-photograph motion
    set (natural image statistics).

    With multiple `seeds`, each regime is replicated once per seed under
    keys ``<regime>@s<k>`` (independent texture + motion draws); callers
    group by the prefix before ``@`` to report mean +- std per regime.
    With the default single seed, keys stay the historical bare names so
    existing caches/criteria keep their meaning."""
    from .synth import benchmark_sets, photo_video

    multi = len(seeds) > 1

    def _key(name: str, k: int) -> str:
        return f"{name}@s{k}" if multi else name

    sets: Dict[str, np.ndarray] = {}
    for k in seeds:
        off = 100 * int(k)
        for name, frames in benchmark_sets(dim, n_frames, seed_offset=off).items():
            sets[_key(name, k)] = frames
        for s in (1, 10):
            sets[_key(f"synth_step{int(s)}", k)] = translation_video(
                n_frames, dim, dim, step=float(s), seed=int(s) + off
            )
        if include_photo:
            sets[_key("photo", k)] = photo_video(
                n_frames, dim, dim, seed=11 + off
            )
    return sets


# Bump whenever the eval/synth/pipeline CODE changes the meaning of a cached
# number (advisor r4: cache validity depends on code not captured in the
# weights key; with overwrite=False in campaign tools, code changes between
# legs could otherwise silently mix old and new numbers in one table).
_EVAL_PROTOCOL = "r5.1"


def _weights_digest(weights, *config) -> str:
    """Content key for the result cache.  Without it the cache was keyed
    only by (set, method): re-evaluating a different checkpoint into the
    same out_dir silently returned the previous model's numbers.  Hashes
    the FULL leaf bytes (the msgpack trees are a few MB; sha1 over them is
    milliseconds) so the key is content-exact, plus _EVAL_PROTOCOL so code
    changes invalidate rather than alias."""
    import hashlib

    hsh = hashlib.sha1()
    hsh.update(_EVAL_PROTOCOL.encode())
    hsh.update("|".join(map(str, config)).encode())
    for leaf in jax.tree_util.tree_leaves(weights):
        a = np.asarray(leaf)
        hsh.update(f"{a.shape}{a.dtype}".encode())
        hsh.update(np.ascontiguousarray(a).tobytes())
    return hsh.hexdigest()[:10]


def _method_cache_key(weights, method: str, variant: int,
                      uncertainty_maps: int, dim: int, max_num,
                      cache_token: str = "") -> str:
    """Digest over only the weights (and config) the method actually uses,
    so adacof/phase results survive a fusion-checkpoint update: a training
    campaign re-evaluating each new FusionNet against the SAME frozen
    components otherwise recomputes 2/3 of every suite sweep.

    `cache_token` must encode every set-GENERATION parameter that is not
    visible in the set name (advisor r4: synthetic frame content depends on
    n_frames — e.g. translation_video's margin — so two runs into the same
    out_dir with different --n_frames would otherwise alias)."""
    if method == "adacof":
        return _weights_digest(weights.adacof, method, dim, max_num,
                               cache_token)
    if method == "phase":
        return _weights_digest(weights.phase_net, method, dim, max_num,
                               cache_token)
    if method == "baseline":  # uses phase_net + adacof, never the fusion head
        return _weights_digest(
            (weights.phase_net, weights.adacof), method, dim, max_num,
            cache_token
        )
    return _weights_digest(weights, method, variant, uncertainty_maps,
                           dim, max_num, cache_token)


def evaluate_suite(
    weights,
    out_dir: str,
    sets: Optional[Dict[str, np.ndarray]] = None,
    methods: Sequence[str] = ("fusion",),
    dim: int = 512,
    max_num: Optional[int] = 10,
    overwrite: bool = False,
    visualize: bool = True,
    lpips_fn=None,
    variant: int = 0,
    uncertainty_maps: int = 3,
    cache_token: str = "",
) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Run the full benchmark suite; caches per (set, method) to
    `<out_dir>/result_<set>_<method>_<weights-digest>.npz`.  Returns
    {set: {method: {metric: mean}}} and writes a summary.json.

    With visualize=True (the reference always does, evaluate.py:264-266) each
    set also gets target/prediction/|diff| panels per triplet and a stitched
    <set>.avi under <out_dir>/panels_<set>/."""
    from .visualize import panels_to_video, prediction_panel

    os.makedirs(out_dir, exist_ok=True)
    if sets is None:
        sets = synthetic_sets(dim)
    digest_by_method = {
        m: _method_cache_key(weights, m, variant, uncertainty_maps,
                             dim, max_num, cache_token)
        for m in methods
    }
    summary: Dict[str, Dict[str, Dict[str, float]]] = {}
    for name, frames_src in sets.items():
        # a callable set value (load_set(..., stream=True)) yields a fresh
        # frame iterator per method — streamed sets skip visualization
        # (the whole-clip array is never materialized)
        streamed = callable(frames_src)
        frames = frames_src if not streamed else None
        summary[name] = {}
        preds_by_method: Dict[str, np.ndarray] = {}
        want_preds = visualize and not streamed
        for method in methods:
            cache = os.path.join(
                out_dir, f"result_{name}_{method}_{digest_by_method[method]}.npz"
            )
            if os.path.exists(cache) and not overwrite:
                data = dict(np.load(cache))
                if (want_preds and "preds" not in data) or (
                    lpips_fn is not None and "lpips_vgg" not in data
                ):
                    data = evaluate_frames(
                        frames_src() if streamed else frames,
                        weights, method, dim, max_num,
                        return_preds=want_preds, lpips_fn=lpips_fn,
                        variant=variant, uncertainty_maps=uncertainty_maps,
                    )
                    np.savez(cache, **data)
            else:
                data = evaluate_frames(
                    frames_src() if streamed else frames,
                    weights, method, dim, max_num,
                    return_preds=want_preds, lpips_fn=lpips_fn,
                    variant=variant, uncertainty_maps=uncertainty_maps,
                )
                np.savez(cache, **data)
            if "preds" in data:
                preds_by_method[method] = data.pop("preds")
            summary[name][method] = {k: float(v.mean()) for k, v in data.items()}
        if want_preds and preds_by_method:
            cropped = crop_center(frames, dim)
            n_panels = min(p.shape[0] for p in preds_by_method.values())
            panel_paths = []
            for i in range(n_panels):
                path = os.path.join(out_dir, f"panels_{name}", f"panel_{i:03d}.png")
                prediction_panel(
                    cropped[i + 1],
                    {m: p[i] / 255.0 for m, p in preds_by_method.items()},
                    out_path=path,
                )
                panel_paths.append(path)
            if panel_paths:
                panels_to_video(
                    panel_paths, os.path.join(out_dir, f"{name}.avi")
                )
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def load_set(path: str, resize=None, stream: bool = False):
    """Load a test set from a video file or a directory of frames.

    `stream=True` returns a zero-argument CALLABLE producing a fresh uint8
    frame iterator each call (evaluate_suite re-invokes it per method) —
    the whole-clip float32 array never exists on the host, so a real
    1080p multi-clip sweep fits a small machine."""
    if stream:
        from ..pipeline.video import iter_frame_dir, iter_video_frames

        if os.path.isdir(path):
            return lambda: iter_frame_dir(path)
        return lambda: iter_video_frames(path, resize=resize)
    if os.path.isdir(path):
        return read_frame_dir(path)
    return read_video_frames(path, resize=resize)


def evaluate_triplets(
    triplets: Dict[str, tuple],
    weights,
    method: str = "fusion",
    output_dir: Optional[str] = None,
    lpips_fn=None,
    variant: int = 0,
    uncertainty_maps: int = 3,
) -> Dict[str, Dict[str, float]]:
    """Score explicit {scene: (f1, gt, f2)} triplets at native resolution
    (the TestModule.Test contract: per-scene PSNR + 'average' row,
    /root/reference/src/adacof/TestModule.py:43-64).  Scenes are bucketed by
    shape so each resolution compiles once; gt=None scenes are interpolated
    and written but not scored.  With `output_dir`, predictions are saved as
    <output_dir>/<scene>/output.png."""
    import jax.numpy as jnp

    from .metrics import all_metrics

    by_shape: Dict[tuple, List[str]] = {}
    for name, (f1, gt, f2) in triplets.items():
        by_shape.setdefault(f1.shape, []).append(name)

    results: Dict[str, Dict[str, float]] = {}
    for shape, names in by_shape.items():
        h, w, _ = shape
        fn = _interp_fn(weights, h, w, method, variant, uncertainty_maps)
        jm = _jmetrics()
        for name in names:
            f1, gt, f2 = triplets[name]
            pred = fn(jnp.asarray(f1[None]), jnp.asarray(f2[None]))[0]
            if output_dir is not None:
                import cv2

                d = os.path.join(output_dir, name)
                os.makedirs(d, exist_ok=True)
                cv2.imwrite(
                    os.path.join(d, "output.png"),
                    cv2.cvtColor(
                        (np.asarray(pred) * 255).clip(0, 255).astype(np.uint8),
                        cv2.COLOR_RGB2BGR,
                    ),
                )
            if gt is not None:
                m = jm(pred[None], jnp.asarray(gt)[None])
                results[name] = {k: float(v[0]) for k, v in m.items()}
                if lpips_fn is not None:
                    results[name]["lpips_vgg"] = float(
                        lpips_fn(pred, jnp.asarray(gt))
                    )
    if results:
        results["average"] = {
            k: float(np.mean([r[k] for r in results.values()]))
            for k in next(iter(results.values()))
        }
    return results
