"""Video decoding backends (host-side, feeds the TPU input pipeline).

The reference leans on decord's C++ decoder (`src/datasets/video_dataset.py:16`).
Here decoding is pluggable: the native libav decoder (primary —
`native/video_decode.cpp`, keyframe-seek + frame-threaded decode + convert
only wanted frames), OpenCV's VideoCapture, imageio fallback, and a synthetic
generator for tests/benchmarks. All return uint8 [T, H, W, 3] RGB for a list
of frame indices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    import imageio.v3 as iio

    _HAS_IIO = True
except Exception:  # pragma: no cover
    _HAS_IIO = False


class VideoReadError(RuntimeError):
    pass


class VideoReader:
    """Random-access frame reader. ``get_batch(indices)`` mirrors decord."""

    def __init__(self, path: str, backend: Optional[str] = None):
        if not os.path.exists(path):
            raise VideoReadError(f"video path not found: {path}")
        self.path = path
        auto = backend is None
        if auto:
            from vjepa2_tpu.data import native as _native

            if _native.decoder_available():
                backend = "native"
            elif _HAS_CV2:
                backend = "cv2"
            elif _HAS_IIO:
                backend = "imageio"
        self.backend = backend
        if self.backend is None:
            raise VideoReadError("no video decode backend available (native/cv2/imageio)")
        self._len = None
        self._fps = None
        self._native = None
        if self.backend == "native":
            from vjepa2_tpu.data import native as _native

            err = None
            try:
                nat = _native.NativeVideoDecoder(path)
                if nat.num_frames <= 0:
                    nat.close()
                    err = f"native decoder reports no frames for {path}"
                else:
                    self._native = nat
                    self._len = nat.num_frames
                    self._fps = nat.fps or 30.0
            except RuntimeError as e:
                err = str(e)
            if err is not None:
                # per-FILE fallback under auto selection: the system libav
                # can lack codecs that cv2/imageio's bundled ffmpeg has
                # (e.g. AV1/HEVC on older distros) — one exotic file must
                # not kill a run that decoded fine before the native backend
                if auto and _HAS_CV2:
                    self.backend = "cv2"
                    self._init_cv2(path)
                elif auto and _HAS_IIO:
                    self.backend = "imageio"
                    self._init_iio(path)
                else:
                    raise VideoReadError(err)
        elif self.backend == "cv2":
            self._init_cv2(path)
        else:
            self._init_iio(path)

    def _init_cv2(self, path: str) -> None:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise VideoReadError(f"cv2 failed to open {path}")
        self._len = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        cap.release()
        if self._len <= 0:
            raise VideoReadError(f"cv2 reports no frames for {path}")

    def _init_iio(self, path: str) -> None:
        meta = iio.immeta(path, plugin="pyav") if _HAS_IIO else {}
        self._fps = float(meta.get("fps", 30.0))
        self._len = int(meta.get("nframes") or 0)
        if self._len <= 0:
            # fall back to counting (slow, but only metadata-less files)
            self._len = sum(1 for _ in iio.imiter(path))

    def __len__(self) -> int:
        return self._len

    @property
    def avg_fps(self) -> float:
        return self._fps

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        indices = np.asarray(indices, dtype=np.int64)
        if self.backend == "native":
            try:
                return self._native.get_batch(indices)
            except RuntimeError as e:
                raise VideoReadError(str(e)) from e
        if self.backend == "cv2":
            return self._get_batch_cv2(indices)
        return self._get_batch_iio(indices)

    def _get_batch_cv2(self, indices: np.ndarray) -> np.ndarray:
        cap = cv2.VideoCapture(self.path)
        try:
            order = np.argsort(indices)
            sorted_idx = indices[order]
            frames: dict[int, np.ndarray] = {}
            pos = -1
            for want in np.unique(sorted_idx):
                want = int(want)
                if want != pos + 1:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, want)
                ok, frame = cap.read()
                if not ok:
                    # clamp to last decodable frame
                    if frames:
                        frame = frames[max(frames)]
                    else:
                        raise VideoReadError(f"decode failure at frame {want} of {self.path}")
                else:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                frames[want] = frame
                pos = want
            return np.stack([frames[int(i)] for i in indices])
        finally:
            cap.release()

    def _get_batch_iio(self, indices: np.ndarray) -> np.ndarray:
        want = set(int(i) for i in indices)
        frames = {}
        for i, frame in enumerate(iio.imiter(self.path)):
            if i in want:
                frames[i] = np.asarray(frame)[..., :3]
            if len(frames) == len(want):
                break
        if not frames:
            raise VideoReadError(f"no frames decoded from {self.path}")
        last = frames[max(frames)]
        return np.stack([frames.get(int(i), last) for i in indices])


def synthetic_clip(num_frames: int, height: int, width: int, seed: int = 0) -> np.ndarray:
    """Deterministic moving-gradient clip for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(height, width, 3), dtype=np.uint8)
    frames = [np.roll(base, shift=3 * t, axis=1) for t in range(num_frames)]
    return np.stack(frames)
