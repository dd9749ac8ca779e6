"""Hub preprocessor (reference `evals/hub/preprocessor.py:13`).

``vjepa2_preprocessor()`` returns the eval video transform: resize short
side to crop_size, center crop, /255, imagenet-normalize — emitting
channels-last float32 [T, S, S, 3] ready for the encoder.
"""

from __future__ import annotations

import numpy as np

from vjepa2_tpu.data.transforms import EvalVideoTransform


class Preprocessor:
    def __init__(self, crop_size: int = 256):
        self._t = EvalVideoTransform(crop_size=crop_size, num_views_per_clip=1)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        """clip: [T, H, W, 3] uint8 -> [T, S, S, 3] float32 normalized."""
        return self._t(np.asarray(clip))[0]


def vjepa2_preprocessor(crop_size: int = 256) -> Preprocessor:
    return Preprocessor(crop_size=crop_size)
