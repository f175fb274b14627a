"""Native host runtime: C++ data-path kernels loaded via ctypes.

Compiled on first use with the system toolchain (g++ -O3 -shared), cached
next to the source.  Falls back cleanly when no compiler is available —
callers check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "augment.cpp")
_SO = os.path.join(_DIR, "_fmvfi_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fPIC",
        "-shared",
        "-pthread",
        "-o",
        _SO,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.fmvfi_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fmvfi_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def augment_batch(
    frames_u8: np.ndarray, crop: int, params: np.ndarray
):
    """frames_u8: (B, 3, H, W, 3) uint8 RGB triplets; params (B, 5) int32 of
    (y0, x0, hflip, vflip, tswap).  Returns three (B, crop, crop, 3) float32
    batches (frame1, target, frame2), time reversal applied."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    frames_u8 = np.ascontiguousarray(frames_u8, dtype=np.uint8)
    params = np.ascontiguousarray(params, dtype=np.int32)
    b, three, h, w, c = frames_u8.shape
    assert three == 3 and c == 3
    outs = [np.empty((b, crop, crop, 3), np.float32) for _ in range(3)]
    lib.fmvfi_augment_batch(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        b,
        crop,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *(o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs),
    )
    return tuple(outs)


def u8_to_f32(src: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    src = np.ascontiguousarray(src, dtype=np.uint8)
    dst = np.empty(src.shape, np.float32)
    lib.fmvfi_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size,
    )
    return dst
