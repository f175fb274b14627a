"""AOT export: package an interpolation pipeline as a self-contained
serving artifact (StableHLO program + weight arrays in one .npz).

The reference's only deployment story is "run the python scripts with the
full source tree, torch, CUDA and the checkpoints on the path"
(src/fusion_net/interpolate_twoframe.py; the model classes must be
importable for torch.load).  A TPU-native framework can do better: the
whole pipeline (color transforms, pyramid FFTs, PhaseNet, AdaCoF warps,
FusionNet) is ONE jitted function, so `jax.export` lowers it once to
versioned StableHLO that any process with plain jax — no fmvfi_tpu, no
torch — can deserialize and call, on the platforms chosen at export time.

Weights and pyramid filter banks are passed as ARGUMENTS (not baked as HLO
constants): constants of that size overflow compilers with request-size
limits (observed: HTTP 413 from the remote TPU compiler), and argument
passing lets one artifact serve many checkpoints of the same shape.  The
arrays ride in the same .npz as the program, so the artifact is still one
file.

Format (.npz): `__stablehlo__` (uint8 program bytes), `__meta__` (JSON:
method/shape/arg count), `arg_000...` (the flattened weight+filter leaves,
in call order).

Caveat: the AdaCoF warp dispatches per-backend at TRACE time (Pallas kernel
on TPU, clipped XLA gather elsewhere), so an artifact exported from a CPU
host bakes the XLA-gather warp for every platform — numerically identical,
slower on TPU.  Export ON the TPU (or pass platforms=("tpu",)) from a TPU
process to bake the Pallas kernel.
"""

from __future__ import annotations

import io
import json
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _pipeline_fn(method: str, kernel_size: int, dilation: int,
                 variant: int, uncertainty_maps: int, treedef):
    """fn(leaves..., f1, f2) with weights/filters rebuilt from leaves."""
    from ..pipeline.interpolate import (
        adacof_interpolate,
        fusion_interpolate,
        phase_interpolate,
    )

    def fn(*args):
        *leaves, f1, f2 = args
        weights, filters = jax.tree.unflatten(treedef, leaves)
        if method == "fusion":
            return fusion_interpolate(
                weights, f1, f2, kernel_size=kernel_size, dilation=dilation,
                filters=filters, variant=variant,
                uncertainty_maps=uncertainty_maps,
            )
        if method == "phase":
            return phase_interpolate(
                weights.phase_net, f1, f2, filters=filters
            )
        if method == "adacof":
            return adacof_interpolate(
                weights.adacof, f1, f2, kernel_size=kernel_size,
                dilation=dilation,
            )
        raise ValueError(f"unknown method {method!r}")

    return fn


def export_pipeline(
    weights,
    h: int,
    w: int,
    method: str = "fusion",
    *,
    batch: int = 1,
    kernel_size: int = 5,
    dilation: int = 1,
    variant: int = 0,
    uncertainty_maps: int = 3,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Export one pipeline at a fixed (batch, h, w) as artifact bytes.

    `platforms`: e.g. ("tpu", "cpu") for a multi-platform artifact; None
    exports for the current default platform only."""
    from jax import export as jexport

    from ..ops.pyramid import make_filters, max_pyr_height

    if method == "fusion":
        # fusion_interpolate reflect-pads off-/8 inputs internally, so its
        # filter bank must be built at the PADDED resolution (same rule as
        # pipeline/video._interp_fn)
        fh, fw = h + (-h) % 8, w + (-w) % 8
        filters = jax.tree.map(
            jnp.asarray, make_filters(fh, fw, max_pyr_height(fh, fw))
        )
    elif method == "phase":
        filters = jax.tree.map(
            jnp.asarray, make_filters(h, w, max_pyr_height(h, w))
        )
    else:
        filters = None
    leaves, treedef = jax.tree.flatten((weights, filters))
    leaves = [jnp.asarray(x) for x in leaves]
    fn = _pipeline_fn(
        method, kernel_size, dilation, variant, uncertainty_maps, treedef
    )
    frame = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(jax.jit(fn), **kw)(*leaves, frame, frame)

    buf = io.BytesIO()
    arrays = {
        "__stablehlo__": np.frombuffer(exp.serialize(), dtype=np.uint8),
        "__meta__": np.frombuffer(
            json.dumps(
                {
                    "method": method,
                    "batch": batch,
                    "h": h,
                    "w": w,
                    "n_args": len(leaves),
                    "platforms": list(exp.platforms),
                }
            ).encode(),
            dtype=np.uint8,
        ),
    }
    for i, leaf in enumerate(leaves):
        arrays[f"arg_{i:04d}"] = np.asarray(leaf)
    np.savez(buf, **arrays)
    return buf.getvalue()


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path_or_bytes) -> Callable:
    """Load an artifact; returns `fn(frame1, frame2) -> middle frame` plus
    a `.meta` dict.  Needs only jax + numpy — no fmvfi_tpu, no torch."""
    from jax import export as jexport

    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    data = np.load(src)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    exp = jexport.deserialize(bytearray(data["__stablehlo__"].tobytes()))
    args = [data[f"arg_{i:04d}"] for i in range(meta["n_args"])]

    def fn(f1, f2):
        return exp.call(*args, f1, f2)

    fn.meta = meta
    return fn
