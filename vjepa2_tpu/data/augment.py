"""RandAugment + RandomErasing for video clips
(reference vendors timm-style copies: `src/datasets/utils/video/randaugment.py`,
`randerase.py`; applied per-frame over the clip with shared parameters).

PIL-backed ops on uint8 frames, parameters sampled once per clip so the
augmentation is temporally consistent (the reference applies the same
`create_random_augment` transform to the whole PIL-image list).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _enhance_factor(level: float) -> float:
    return 1.0 + (level / _MAX_LEVEL) * 0.9 * (1 if np.random.rand() < 0.5 else -1)


# Each op: (pil_image, level, rng) -> pil_image
def _op_identity(img, level, rng):
    return img


def _op_autocontrast(img, level, rng):
    return ImageOps.autocontrast(img)


def _op_equalize(img, level, rng):
    return ImageOps.equalize(img)


def _op_invert(img, level, rng):
    return ImageOps.invert(img)


def _op_rotate(img, level, rng):
    deg = (level / _MAX_LEVEL) * 30.0
    return img.rotate(deg, fillcolor=_FILL)


def _op_posterize(img, level, rng):
    bits = 4 - int((level / _MAX_LEVEL) * 4)
    return ImageOps.posterize(img, max(1, bits))


def _op_solarize(img, level, rng):
    thresh = int(256 - (level / _MAX_LEVEL) * 256)
    return ImageOps.solarize(img, thresh)


def _op_solarize_add(img, level, rng):
    add = int((level / _MAX_LEVEL) * 110)
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _op_color(img, level, rng):
    return ImageEnhance.Color(img).enhance(1.0 + (level / _MAX_LEVEL) * 0.9 * rng.choice([-1, 1]))


def _op_contrast(img, level, rng):
    return ImageEnhance.Contrast(img).enhance(1.0 + (level / _MAX_LEVEL) * 0.9 * rng.choice([-1, 1]))


def _op_brightness(img, level, rng):
    return ImageEnhance.Brightness(img).enhance(1.0 + (level / _MAX_LEVEL) * 0.9 * rng.choice([-1, 1]))


def _op_sharpness(img, level, rng):
    return ImageEnhance.Sharpness(img).enhance(1.0 + (level / _MAX_LEVEL) * 0.9 * rng.choice([-1, 1]))


def _op_shear_x(img, level, rng):
    v = (level / _MAX_LEVEL) * 0.3 * rng.choice([-1, 1])
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0), fillcolor=_FILL)


def _op_shear_y(img, level, rng):
    v = (level / _MAX_LEVEL) * 0.3 * rng.choice([-1, 1])
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0), fillcolor=_FILL)


def _op_translate_x(img, level, rng):
    v = (level / _MAX_LEVEL) * 0.45 * img.size[0] * rng.choice([-1, 1])
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0), fillcolor=_FILL)


def _op_translate_y(img, level, rng):
    v = (level / _MAX_LEVEL) * 0.45 * img.size[1] * rng.choice([-1, 1])
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v), fillcolor=_FILL)


RAND_AUGMENT_OPS = {
    "Identity": _op_identity,
    "AutoContrast": _op_autocontrast,
    "Equalize": _op_equalize,
    "Invert": _op_invert,
    "Rotate": _op_rotate,
    "Posterize": _op_posterize,
    "Solarize": _op_solarize,
    "SolarizeAdd": _op_solarize_add,
    "Color": _op_color,
    "Contrast": _op_contrast,
    "Brightness": _op_brightness,
    "Sharpness": _op_sharpness,
    "ShearX": _op_shear_x,
    "ShearY": _op_shear_y,
    "TranslateX": _op_translate_x,
    "TranslateY": _op_translate_y,
}


@dataclass
class RandAugment:
    """rand-m{magnitude}-n{num_layers} config string parsing like timm
    (reference `create_random_augment`, `transforms.py:590`)."""

    num_layers: int = 2
    magnitude: float = 9.0
    magnitude_std: float = 0.5

    @classmethod
    def from_config(cls, config_str: str) -> "RandAugment":
        m = re.findall(r"m(\d+)", config_str)
        n = re.findall(r"n(\d+)", config_str)
        std = re.findall(r"mstd([\d.]+)", config_str)
        return cls(
            num_layers=int(n[0]) if n else 2,
            magnitude=float(m[0]) if m else 9.0,
            magnitude_std=float(std[0]) if std else 0.5,
        )

    def __call__(self, clip: np.ndarray, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """clip [T, H, W, 3] uint8 -> augmented uint8, temporally consistent."""
        rng = rng or np.random.default_rng()
        names = list(RAND_AUGMENT_OPS)
        chosen = [names[i] for i in rng.integers(0, len(names), size=self.num_layers)]
        levels = [
            float(np.clip(rng.normal(self.magnitude, self.magnitude_std), 0, _MAX_LEVEL))
            for _ in chosen
        ]
        out = []
        # shared per-clip op parameters: use one child rng replayed per frame
        seeds = rng.integers(0, 2**31, size=self.num_layers)
        for frame in clip:
            img = Image.fromarray(frame)
            for name, level, seed in zip(chosen, levels, seeds):
                img = RAND_AUGMENT_OPS[name](img, level, np.random.default_rng(seed))
            out.append(np.asarray(img))
        return np.stack(out)


@dataclass
class RandomErasing:
    """Per-clip random erasing (reference `randerase.py:40`), same box across
    frames ('cube' mode)."""

    probability: float = 0.25
    min_area: float = 0.02
    max_area: float = 1 / 3
    min_aspect: float = 0.3

    def __call__(self, clip: np.ndarray, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """clip [T, H, W, C] float or uint8 -> erased copy."""
        rng = rng or np.random.default_rng()
        if rng.random() > self.probability:
            return clip
        T, H, W, C = clip.shape
        area = H * W
        out = clip.copy()
        for _ in range(10):
            target = rng.uniform(self.min_area, self.max_area) * area
            ar = np.exp(rng.uniform(np.log(self.min_aspect), np.log(1 / self.min_aspect)))
            h = int(round(np.sqrt(target * ar)))
            w = int(round(np.sqrt(target / ar)))
            if h < H and w < W:
                top = rng.integers(0, H - h)
                left = rng.integers(0, W - w)
                noise = rng.normal(size=(h, w, C))
                if clip.dtype == np.uint8:
                    noise = np.clip(noise * 64 + 128, 0, 255).astype(np.uint8)
                out[:, top : top + h, left : left + w] = noise
                break
        return out
