"""ctypes bindings for the native host-ops library (`native/host_ops.cpp`).

Falls back gracefully when the .so hasn't been built — `available()` gates
the fast path in `VideoTransform`. Build with `native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libhost_ops.so")


def _build_if_possible() -> None:
    """One-shot on-demand build (the .so is a build artifact, not in git)."""
    import shutil
    import subprocess

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "host_ops.cpp",
    )
    if not os.path.exists(src) or shutil.which("g++") is None:
        return
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        _build_if_possible()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i32p = ctypes.POINTER(ctypes.c_int)
    lib.crop_resize_normalize_clip.argtypes = [
        c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_i32p, c_i32p, c_i32p, c_i32p,
        c_f32p, ctypes.c_int, ctypes.c_int,
        c_f32p, c_f32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.normalize_clip.argtypes = [
        c_u8p, c_f32p, ctypes.c_int64, c_f32p, c_f32p, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def crop_resize_normalize_clip(
    clip: np.ndarray,
    tops: np.ndarray,
    lefts: np.ndarray,
    chs: np.ndarray,
    cws: np.ndarray,
    out_size: int,
    mean: np.ndarray,
    std: np.ndarray,
    hflip: bool = False,
    num_threads: int = 4,
) -> np.ndarray:
    """clip [T, H, W, 3] uint8, per-frame crop boxes -> [T, S, S, 3] float32."""
    lib = _load()
    assert lib is not None, "native lib not built (run native/build.sh)"
    clip = np.ascontiguousarray(clip)
    T, H, W, C = clip.shape
    assert C == 3
    out = np.empty((T, out_size, out_size, 3), np.float32)
    i32 = lambda a: np.ascontiguousarray(a, np.int32)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    tops, lefts, chs, cws = i32(tops), i32(lefts), i32(chs), i32(cws)
    mean, std = f32(mean), f32(std)
    lib.crop_resize_normalize_clip(
        _ptr(clip, ctypes.c_uint8), T, H, W,
        _ptr(tops, ctypes.c_int), _ptr(lefts, ctypes.c_int),
        _ptr(chs, ctypes.c_int), _ptr(cws, ctypes.c_int),
        _ptr(out, ctypes.c_float), out_size, out_size,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        int(hflip), num_threads,
    )
    return out


def normalize_clip(clip: np.ndarray, mean: np.ndarray, std: np.ndarray, num_threads: int = 4) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native lib not built (run native/build.sh)"
    clip = np.ascontiguousarray(clip)
    out = np.empty(clip.shape, np.float32)
    lib.normalize_clip(
        _ptr(clip, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        int(np.prod(clip.shape[:-1])),
        _ptr(np.ascontiguousarray(mean, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(std, np.float32), ctypes.c_float),
        num_threads,
    )
    return out
