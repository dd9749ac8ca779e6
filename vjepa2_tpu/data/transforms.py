"""Host-side video transforms (numpy + cv2), reference parity.

Re-implements the pretrain path of the reference transform library
(`app/vjepa/transforms.py`, `src/datasets/utils/video/transforms.py`):
random-resized-crop (with optional motion shift interpolating the crop box
across time, `transforms.py:545-587`), horizontal flip, normalize. Output is
channels-last [T, H, W, C] float32 — the TPU-native layout (no CHW permute).

Eval transforms: resize-short-side + center/uniform crop
(`evals/video_classification_frozen/utils.py:139-175`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)  # workers handle their own parallelism
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _resize_frame(frame: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Bilinear resize of an [H, W, C] uint8/float frame to (h, w)."""
    h, w = size
    if frame.shape[0] == h and frame.shape[1] == w:
        return frame
    if _HAS_CV2:
        return cv2.resize(frame, (w, h), interpolation=cv2.INTER_LINEAR)
    # numpy fallback: nearest (tests only)
    ys = (np.arange(h) * frame.shape[0] / h).astype(int)
    xs = (np.arange(w) * frame.shape[1] / w).astype(int)
    return frame[ys][:, xs]


def resize_clip(clip: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    return np.stack([_resize_frame(f, size) for f in clip])


def _sample_crop_box(H, W, scale, ratio, rng):
    """Sample (top, left, h, w) as torchvision RandomResizedCrop does."""
    area = H * W
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * ar)))
        h = int(round(math.sqrt(target_area / ar)))
        if 0 < w <= W and 0 < h <= H:
            top = rng.integers(0, H - h + 1)
            left = rng.integers(0, W - w + 1)
            return int(top), int(left), h, w
    # fallback: center crop at clamped aspect
    in_ratio = W / H
    if in_ratio < ratio[0]:
        w, h = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = H, int(round(H * ratio[1]))
    else:
        w, h = W, H
    return (H - h) // 2, (W - w) // 2, h, w


def circulant_frame_padding(clip: np.ndarray, target_frames: int) -> np.ndarray:
    """Cyclically repeat a short clip to ``target_frames``
    (reference `src/datasets/utils/video/transforms.py:654`)."""
    T = clip.shape[0]
    if T >= target_frames:
        return clip[:target_frames]
    idx = np.arange(target_frames) % T
    return clip[idx]


def color_jitter(
    clip: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
) -> np.ndarray:
    """Clip-consistent color jitter (reference `transforms.py:ColorJitter`
    semantics: one parameter draw per clip, random op order). Operates on
    float32 [T, H, W, 3] in [0, 1] (or uint8, converted)."""
    x = clip.astype(np.float32)
    if clip.dtype == np.uint8:
        x = x / 255.0
    ops = []
    if brightness > 0:
        b = float(rng.uniform(max(0.0, 1 - brightness), 1 + brightness))
        ops.append(lambda y: y * b)
    if contrast > 0:
        c = float(rng.uniform(max(0.0, 1 - contrast), 1 + contrast))
        ops.append(lambda y: (y - y.mean()) * c + y.mean())
    if saturation > 0:
        s = float(rng.uniform(max(0.0, 1 - saturation), 1 + saturation))

        def _sat(y, s=s):
            gray = y @ np.asarray([0.299, 0.587, 0.114], np.float32)
            return gray[..., None] + (y - gray[..., None]) * s

        ops.append(_sat)
    order = rng.permutation(len(ops))
    for i in order:
        x = ops[i](x)
    x = np.clip(x, 0.0, 1.0)
    return (x * 255.0).astype(np.uint8) if clip.dtype == np.uint8 else x



@dataclass
class VideoTransform:
    """Pretrain-time augmentation (reference `app/vjepa/transforms.py:37-116`).

    With ``use_native=True`` (default when built) the crop + bilinear resize
    + normalize is one fused pass in the C library (`native/host_ops.cpp`),
    threaded across frames.
    """

    crop_size: int = 224
    random_resize_scale: tuple[float, float] = (0.3, 1.0)
    random_resize_aspect_ratio: tuple[float, float] = (0.75, 1.35)
    horizontal_flip: bool = False
    motion_shift: bool = False
    normalize: bool = True
    # Deferred normalization: emit uint8 [T, S, S, 3] (crop/resize/flip only)
    # and let the jit step run (x/255 - mean)/std on the DEVICE, where XLA
    # fuses it into the patch-embed matmul. Clips then stay 1 byte/px through
    # collate, worker IPC, and H2D — 4x less host memory traffic than
    # float32 (the loader host is memory-bound: ~3 GB/s/core on CI boxes).
    # Rounding resize output to uint8 matches the reference's torchvision
    # uint8 resize; deviation vs the float path is < 1/255 per channel.
    normalize_on_device: bool = False
    mean: np.ndarray = None
    std: np.ndarray = None
    use_native: Optional[bool] = None
    native_threads: int = 4
    auto_augment: bool = False
    aa_config: str = "rand-m7-n4-mstd0.5"
    rand_erase_prob: float = 0.0
    color_jitter_strength: float = 0.0  # clip-consistent brightness/contrast/saturation
    pad_frames: Optional[int] = None  # circulant-pad short clips to this length

    def __post_init__(self):
        self.mean = IMAGENET_MEAN if self.mean is None else np.asarray(self.mean, np.float32)
        self.std = IMAGENET_STD if self.std is None else np.asarray(self.std, np.float32)
        if self.normalize_on_device and not self.normalize:
            # the device step (`train/pretrain._device_normalize`) applies
            # (x/255 - mean)/std unconditionally to uint8 clips, so it
            # cannot honor normalize=False — reject rather than silently
            # normalizing anyway
            raise ValueError(
                "normalize_on_device=True requires normalize=True; "
                "use the host float path for un-normalized clips")
        if self.use_native is None:
            from vjepa2_tpu.data import native

            if self.normalize_on_device:
                self.use_native = native.supports_u8()
            else:
                self.use_native = self.normalize and native.available()
        self._rand_augment = None
        self._rand_erase = None
        if self.auto_augment:
            from vjepa2_tpu.data.augment import RandAugment

            self._rand_augment = RandAugment.from_config(self.aa_config)
        if self.rand_erase_prob > 0:
            from vjepa2_tpu.data.augment import RandomErasing

            self._rand_erase = RandomErasing(probability=self.rand_erase_prob)

    def _native_call(self, clip, boxes, hflip):
        from vjepa2_tpu.data import native

        tops, lefts, hs, ws = boxes
        if self.normalize_on_device:
            return native.crop_resize_clip_u8(
                clip, tops, lefts, hs, ws, self.crop_size,
                hflip=hflip, num_threads=self.native_threads,
            )
        return native.crop_resize_normalize_clip(
            clip, tops, lefts, hs, ws, self.crop_size, self.mean, self.std,
            hflip=hflip, num_threads=self.native_threads,
        )

    def __call__(self, clip: np.ndarray, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """clip: [T, H, W, C] uint8 -> [T, S, S, C] float32 normalized."""
        rng = rng or np.random.default_rng()
        if self.pad_frames is not None:
            clip = circulant_frame_padding(clip, self.pad_frames)
        if self._rand_augment is not None and clip.dtype == np.uint8:
            clip = self._rand_augment(clip, rng=rng)
        if self.color_jitter_strength > 0:
            s = self.color_jitter_strength
            clip = color_jitter(clip, rng, brightness=s, contrast=s, saturation=s)
        T, H, W, C = clip.shape
        top, left, h, w = _sample_crop_box(H, W, self.random_resize_scale, self.random_resize_aspect_ratio, rng)

        flip = bool(self.horizontal_flip and rng.random() < 0.5)
        if self.use_native and clip.dtype == np.uint8:
            if self.motion_shift:
                top2, left2, h2, w2 = _sample_crop_box(
                    H, W, self.random_resize_scale, self.random_resize_aspect_ratio, rng
                )
                boxes = (
                    np.linspace(top, top2, T).astype(np.int32),
                    np.linspace(left, left2, T).astype(np.int32),
                    np.linspace(h, h2, T).astype(np.int32),
                    np.linspace(w, w2, T).astype(np.int32),
                )
            else:
                boxes = tuple(np.full(T, v, np.int32) for v in (top, left, h, w))
            out = self._native_call(clip, boxes, flip)
            if self._rand_erase is not None:
                out = self._rand_erase(out, rng=rng)
            return out

        if self.motion_shift:
            # Independent end-box; crop box interpolated across time
            # (reference `random_resized_crop_with_shift`, transforms.py:545).
            top2, left2, h2, w2 = _sample_crop_box(
                H, W, self.random_resize_scale, self.random_resize_aspect_ratio, rng
            )
            tops = np.linspace(top, top2, T).astype(int)
            lefts = np.linspace(left, left2, T).astype(int)
            hs = np.linspace(h, h2, T).astype(int)
            ws = np.linspace(w, w2, T).astype(int)
            frames = [
                _resize_frame(clip[t, tops[t] : tops[t] + hs[t], lefts[t] : lefts[t] + ws[t]],
                              (self.crop_size, self.crop_size))
                for t in range(T)
            ]
            out = np.stack(frames)
        else:
            cropped = clip[:, top : top + h, left : left + w]
            out = resize_clip(cropped, (self.crop_size, self.crop_size))

        if flip:
            out = out[:, :, ::-1]

        if out.dtype == np.uint8:
            if self.normalize_on_device:
                out = np.ascontiguousarray(out)  # stays uint8; device normalizes
            else:
                out = out.astype(np.float32) / 255.0
                if self.normalize:
                    out = (out - self.mean) / self.std
                out = np.ascontiguousarray(out)
        else:
            # an upstream op (color jitter) already produced float [0, 1]:
            # do NOT rescale by 255 again, and normalize on the HOST even
            # under normalize_on_device — the device step only normalizes
            # uint8 clips, so passing the float through would silently train
            # on un-normalized pixels
            out = out.astype(np.float32, copy=False)
            if self.normalize:
                out = (out - self.mean) / self.std
            out = np.ascontiguousarray(out)
        if self._rand_erase is not None:
            out = self._rand_erase(out, rng=rng)
        return out


@dataclass
class EvalVideoTransform:
    """Eval-time: resize short side then take ``num_views_per_clip`` spatial
    views slid along the long side (reference `EvalVideoTransform`)."""

    crop_size: int = 224
    num_views_per_clip: int = 1
    normalize: bool = True
    mean: np.ndarray = None
    std: np.ndarray = None

    def __post_init__(self):
        self.mean = IMAGENET_MEAN if self.mean is None else np.asarray(self.mean, np.float32)
        self.std = IMAGENET_STD if self.std is None else np.asarray(self.std, np.float32)

    def __call__(self, clip: np.ndarray) -> list[np.ndarray]:
        T, H, W, C = clip.shape
        S = self.crop_size
        if H < W:
            nh, nw = S, max(S, int(round(W * S / H)))
        else:
            nh, nw = max(S, int(round(H * S / W))), S
        clip = resize_clip(clip, (nh, nw))

        views = []
        n = self.num_views_per_clip
        if n == 1:
            tops = [(nh - S) // 2]
            lefts = [(nw - S) // 2]
        elif nw > nh:
            lefts = np.linspace(0, nw - S, n).astype(int)
            tops = [0] * n
        else:
            tops = np.linspace(0, nh - S, n).astype(int)
            lefts = [0] * n
        for t, l in zip(tops, lefts):
            v = clip[:, t : t + S, l : l + S].astype(np.float32) / 255.0
            if self.normalize:
                v = (v - self.mean) / self.std
            views.append(np.ascontiguousarray(v))
        return views


@dataclass
class ImageTransform:
    """IN1K-style eval transform: resize short side to crop*256/224, center crop."""

    crop_size: int = 224
    train: bool = False
    random_resize_scale: tuple[float, float] = (0.08, 1.0)
    random_resize_aspect_ratio: tuple[float, float] = (3 / 4, 4 / 3)
    horizontal_flip: bool = True
    normalize: bool = True
    mean: np.ndarray = None
    std: np.ndarray = None

    def __post_init__(self):
        self.mean = IMAGENET_MEAN if self.mean is None else np.asarray(self.mean, np.float32)
        self.std = IMAGENET_STD if self.std is None else np.asarray(self.std, np.float32)

    def __call__(self, img: np.ndarray, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        H, W, C = img.shape
        S = self.crop_size
        if self.train:
            top, left, h, w = _sample_crop_box(
                H, W, self.random_resize_scale, self.random_resize_aspect_ratio, rng
            )
            out = _resize_frame(img[top : top + h, left : left + w], (S, S))
            if self.horizontal_flip and rng.random() < 0.5:
                out = out[:, ::-1]
        else:
            short = int(S * 256 / 224)
            if H < W:
                nh, nw = short, int(round(W * short / H))
            else:
                nh, nw = int(round(H * short / W)), short
            r = _resize_frame(img, (nh, nw))
            top, left = (nh - S) // 2, (nw - S) // 2
            out = r[top : top + S, left : left + S]
        out = out.astype(np.float32) / 255.0
        if self.normalize:
            out = (out - self.mean) / self.std
        return np.ascontiguousarray(out)
