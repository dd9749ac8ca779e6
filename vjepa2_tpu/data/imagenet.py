"""ImageNet-1K folder dataset (reference `src/datasets/imagenet1k.py`).

ImageFolder layout: root/<wnid>/<img>. Optional subset via a txt file of
"<wnid> ..." lines (reference `ImageNetSubset`, `imagenet1k.py:60-108`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class ImageFolder:
    IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, root: str, transform=None, subset_file: Optional[str] = None, train: bool = True):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(self.IMG_EXTS):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[c]))

        if subset_file is not None:
            keep_classes = set()
            with open(subset_file) as f:
                for line in f:
                    parts = line.strip().split()
                    if parts:
                        keep_classes.add(parts[0])
            keep_idx = {self.class_to_idx[c] for c in keep_classes if c in self.class_to_idx}
            self.samples = [(p, y) for p, y in self.samples if y in keep_idx]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        from PIL import Image

        path, label = self.samples[index]
        img = np.asarray(Image.open(path).convert("RGB"))
        if self.transform is not None:
            img = self.transform(img)
        return img, label
