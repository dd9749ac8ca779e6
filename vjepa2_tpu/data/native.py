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


def _build_lib(src_name: str, out_path: str, extra_link=()) -> None:
    """On-demand build (the .so is a build artifact, not in git), safe under
    concurrent spawned loader workers: the compile is serialized by a file
    lock and publishes atomically (compile to a per-process temp file, then
    os.replace), so a sibling can never dlopen a half-written .so."""
    import fcntl
    import shutil
    import subprocess

    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", src_name,
    )
    if not os.path.exists(src) or shutil.which("g++") is None:
        return
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if os.path.exists(out_path):
            return  # a sibling built it while we waited on the lock
        tmp = f"{out_path}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, *extra_link, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, out_path)
        except (OSError, subprocess.SubprocessError):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _build_if_possible() -> None:
    _build_lib("host_ops.cpp", _LIB_PATH)


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
    if hasattr(lib, "crop_resize_u8_clip"):  # older prebuilt .so may lack it
        lib.crop_resize_u8_clip.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_i32p, c_i32p, c_i32p, c_i32p,
            c_u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
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


def crop_resize_clip_u8(
    clip: np.ndarray,
    tops: np.ndarray,
    lefts: np.ndarray,
    chs: np.ndarray,
    cws: np.ndarray,
    out_size: int,
    hflip: bool = False,
    num_threads: int = 4,
) -> np.ndarray:
    """clip [T, H, W, 3] uint8 -> [T, S, S, 3] uint8 (crop+resize only;
    normalization deferred to the device — see `VideoTransform
    (normalize_on_device)`)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "crop_resize_u8_clip"), \
        "native lib missing crop_resize_u8_clip (rebuild: native/build.sh)"
    clip = np.ascontiguousarray(clip)
    T, H, W, C = clip.shape
    assert C == 3
    out = np.empty((T, out_size, out_size, 3), np.uint8)
    i32 = lambda a: np.ascontiguousarray(a, np.int32)
    tops, lefts, chs, cws = i32(tops), i32(lefts), i32(chs), i32(cws)
    lib.crop_resize_u8_clip(
        _ptr(clip, ctypes.c_uint8), T, H, W,
        _ptr(tops, ctypes.c_int), _ptr(lefts, ctypes.c_int),
        _ptr(chs, ctypes.c_int), _ptr(cws, ctypes.c_int),
        _ptr(out, ctypes.c_uint8), out_size, out_size,
        int(hflip), num_threads,
    )
    return out


def supports_u8() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "crop_resize_u8_clip")


# -- native video decoder (`native/video_decode.cpp`, libav*) ---------------

_VDLIB: Optional[ctypes.CDLL] = None
_VDLIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libvideo_decode.so")
_VD_FAILED = False


def _load_vd() -> Optional[ctypes.CDLL]:
    global _VDLIB, _VD_FAILED
    if _VDLIB is not None or _VD_FAILED:
        return _VDLIB
    if not os.path.exists(_VDLIB_PATH):
        _build_vd_if_possible()
    if not os.path.exists(_VDLIB_PATH):
        _VD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(_VDLIB_PATH)
    except OSError:  # libav runtime missing
        _VD_FAILED = True
        return None
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    lib.vd_num_frames.restype = ctypes.c_int64
    lib.vd_num_frames.argtypes = [ctypes.c_void_p]
    lib.vd_fps.restype = ctypes.c_double
    lib.vd_fps.argtypes = [ctypes.c_void_p]
    lib.vd_width.restype = ctypes.c_int
    lib.vd_width.argtypes = [ctypes.c_void_p]
    lib.vd_height.restype = ctypes.c_int
    lib.vd_height.argtypes = [ctypes.c_void_p]
    lib.vd_get_batch.restype = ctypes.c_int
    lib.vd_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vd_last_error.restype = ctypes.c_char_p
    _VDLIB = lib
    return lib


def _build_vd_if_possible() -> None:
    _build_lib("video_decode.cpp", _VDLIB_PATH,
               ("-lavformat", "-lavcodec", "-lavutil", "-lswscale"))


def decoder_available() -> bool:
    return _load_vd() is not None


class NativeVideoDecoder:
    """Random-access libav decoder; ``get_batch`` mirrors decord.

    nthreads: libavcodec decode threads (0 = auto). Loader worker processes
    already parallelize across clips, so a small count avoids
    oversubscription.
    """

    def __init__(self, path: str, nthreads: int = 0):
        lib = _load_vd()
        if lib is None:
            raise RuntimeError("native video decoder not built")
        self._lib = lib
        self._ctx = lib.vd_open(path.encode(), int(nthreads))
        if not self._ctx:
            raise RuntimeError(
                f"vd_open failed: {lib.vd_last_error().decode(errors='replace')}"
            )
        self.path = path
        self.width = lib.vd_width(self._ctx)
        self.height = lib.vd_height(self._ctx)
        self.fps = lib.vd_fps(self._ctx)
        self.num_frames = int(lib.vd_num_frames(self._ctx))

    def get_batch(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.int64)
        n = int(idx.size)
        out = np.empty((n, self.height, self.width, 3), np.uint8)
        ret = self._lib.vd_get_batch(
            self._ctx, _ptr(idx, ctypes.c_int64), n, _ptr(out, ctypes.c_uint8)
        )
        if ret != 0:
            raise RuntimeError(
                f"vd_get_batch failed ({ret}): "
                f"{self._lib.vd_last_error().decode(errors='replace')}"
            )
        return out

    def close(self):
        if self._ctx:
            self._lib.vd_close(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
