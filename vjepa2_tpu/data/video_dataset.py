"""Map-style video dataset (reference `src/datasets/video_dataset.py`).

CSV (space- or ``::``-delimited ``path label``) or ``.npy`` manifests,
per-dataset frames-per-clip, fps/duration/frame_step-resolved clip sampling,
multi-clip segment sampling for evals, still-image fallback, and
retry-with-random-resample on decode failure.

Runs on host workers; emits numpy — device placement happens in the loader.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from vjepa2_tpu.data.video import VideoReadError, VideoReader

logger = logging.getLogger(__name__)


class ConcatIndices:
    """Global index -> (dataset_idx, local_idx) (reference `dataloader.py:19-37`)."""

    def __init__(self, sizes: Sequence[int]):
        self.cumsum = np.cumsum([0] + list(sizes))

    def __getitem__(self, idx: int) -> tuple[int, int]:
        d = int(np.searchsorted(self.cumsum, idx, side="right") - 1)
        return d, int(idx - self.cumsum[d])

    @property
    def total(self) -> int:
        return int(self.cumsum[-1])


class VideoDataset:
    def __init__(
        self,
        data_paths: Sequence[str],
        datasets_weights: Optional[Sequence[float]] = None,
        frames_per_clip: int = 16,
        dataset_fpcs: Optional[Sequence[int]] = None,
        fps: Optional[int] = None,
        frame_step: Optional[int] = 4,
        duration: Optional[float] = None,
        num_clips: int = 1,
        transform=None,
        shared_transform=None,
        random_clip_sampling: bool = True,
        allow_clip_overlap: bool = False,
        filter_short_videos: bool = False,
        filter_long_videos: int = int(1e9),
        seed: int = 0,
    ):
        if sum(v is not None for v in (fps, duration, frame_step)) != 1:
            raise ValueError("specify exactly one of fps, duration, frame_step")
        if isinstance(data_paths, str):
            data_paths = [data_paths]
        self.data_paths = list(data_paths)
        self.fps = fps
        self.frame_step = frame_step
        self.duration = duration
        self.num_clips = num_clips
        self.transform = transform
        self.shared_transform = shared_transform
        self.random_clip_sampling = random_clip_sampling
        self.allow_clip_overlap = allow_clip_overlap
        self.filter_short_videos = filter_short_videos
        self.filter_long_videos = filter_long_videos
        self.rng = np.random.default_rng(seed)

        self.dataset_fpcs = (
            list(dataset_fpcs) if dataset_fpcs is not None else [frames_per_clip] * len(self.data_paths)
        )
        if len(self.dataset_fpcs) != len(self.data_paths):
            raise ValueError("dataset_fpcs must match data_paths")

        samples, labels, sizes = [], [], []
        for path in self.data_paths:
            if path.endswith(".csv"):
                try:
                    df = pd.read_csv(path, header=None, delimiter=" ")
                except pd.errors.ParserError:
                    df = pd.read_csv(path, header=None, delimiter="::", engine="python")
                samples += list(df.values[:, 0])
                labels += list(df.values[:, 1])
                sizes.append(len(df))
            elif path.endswith(".npy"):
                data = np.load(path, allow_pickle=True)
                data = [str(x) for x in data]
                samples += data
                labels += [0] * len(data)
                sizes.append(len(data))
            else:
                raise ValueError(f"unsupported manifest {path}")
        self.samples = samples
        self.labels = labels
        self.num_samples_per_dataset = sizes
        self.per_dataset_indices = ConcatIndices(sizes)

        self.sample_weights = None
        if datasets_weights is not None:
            w = []
            for dw, ns in zip(datasets_weights, sizes):
                w += [dw / ns] * ns
            self.sample_weights = np.asarray(w)

    def __len__(self) -> int:
        return len(self.samples)

    def fpc_for_index(self, index: int) -> int:
        d, _ = self.per_dataset_indices[index]
        return self.dataset_fpcs[d]

    def __getitem__(self, index: int):
        for _ in range(100):
            sample = self.samples[index]
            try:
                if str(sample).split(".")[-1].lower() in ("jpg", "jpeg", "png"):
                    out = self._get_image(index)
                else:
                    out = self._get_video(index)
                if out is not None:
                    return out
            except (VideoReadError, OSError) as e:
                logger.warning("decode failure for %s: %s", sample, e)
            index = int(self.rng.integers(0, len(self)))
        raise RuntimeError("too many consecutive decode failures")

    # -- video --------------------------------------------------------------
    def _get_video(self, index: int):
        sample = self.samples[index]
        d, _ = self.per_dataset_indices[index]
        fpc = self.dataset_fpcs[d]
        buffer, clip_indices = self._load_video(sample, fpc)
        if buffer is None or len(buffer) == 0:
            return None
        label = self.labels[index]
        if self.shared_transform is not None:
            buffer = self.shared_transform(buffer)
        clips = [buffer[i * fpc : (i + 1) * fpc] for i in range(self.num_clips)]
        if self.transform is not None:
            clips = [self.transform(c, rng=self.rng) for c in clips]
        return clips, label, clip_indices

    def _load_video(self, path: str, fpc: int):
        if os.path.exists(path) and os.path.getsize(path) > self.filter_long_videos:
            return None, None
        vr = VideoReader(path)
        fstp = self.frame_step
        if self.duration is not None:
            fstp = max(1, int(self.duration * math.ceil(vr.avg_fps) / fpc))
        elif self.fps is not None:
            fstp = max(1, int(math.ceil(vr.avg_fps)) // self.fps)
        clip_len = int(fpc * fstp)
        if self.filter_short_videos and len(vr) < clip_len:
            return None, None

        partition_len = len(vr) // self.num_clips
        all_indices, clip_indices = [], []
        for i in range(self.num_clips):
            if partition_len > clip_len:
                end_indx = clip_len
                if self.random_clip_sampling:
                    end_indx = int(self.rng.integers(clip_len, partition_len))
                start_indx = end_indx - clip_len
                indices = np.linspace(start_indx, end_indx, num=fpc)
                indices = np.clip(indices, start_indx, end_indx - 1).astype(np.int64)
                indices = indices + i * partition_len
            elif not self.allow_clip_overlap:
                npts = max(1, partition_len // fstp)
                indices = np.linspace(0, partition_len, num=npts)
                indices = np.concatenate((indices, np.ones(fpc - npts) * partition_len))
                indices = np.clip(indices, 0, partition_len - 1).astype(np.int64)
                indices = indices + i * partition_len
            else:
                sample_len = min(clip_len, len(vr)) - 1
                npts = max(1, sample_len // fstp)
                indices = np.linspace(0, sample_len, num=npts)
                indices = np.concatenate((indices, np.ones(fpc - npts) * sample_len))
                indices = np.clip(indices, 0, sample_len - 1).astype(np.int64)
                clip_step = 0
                if len(vr) > clip_len and self.num_clips > 1:
                    clip_step = (len(vr) - clip_len) // (self.num_clips - 1)
                indices = indices + i * clip_step
            clip_indices.append(indices)
            all_indices.extend(list(indices))

        buffer = vr.get_batch(all_indices)
        return buffer, clip_indices

    # -- image fallback ------------------------------------------------------
    def _get_image(self, index: int):
        from PIL import Image

        sample = self.samples[index]
        d, _ = self.per_dataset_indices[index]
        fpc = self.dataset_fpcs[d]
        img = np.asarray(Image.open(sample).convert("RGB"))
        buffer = np.repeat(img[None], fpc, axis=0)
        clip_indices = [np.arange(fpc, dtype=np.int32)]
        if self.shared_transform is not None:
            buffer = self.shared_transform(buffer)
        clips = [buffer]
        if self.transform is not None:
            clips = [self.transform(buffer, rng=self.rng)]
        return clips, self.labels[index], clip_indices
