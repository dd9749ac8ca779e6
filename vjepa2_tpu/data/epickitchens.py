"""EPIC-Kitchens-100 action-anticipation dataset
(reference `evals/action_anticipation_frozen/epickitchens.py`).

The reference streams webdataset shards with node/worker splitting; here the
same sample semantics are served map-style from an annotation CSV:

  video_path,start_sec,stop_sec,verb,noun,action[,fps]

For each annotation we sample an anticipation point/time in the configured
ranges and decode the context clip that *precedes* the anticipated action
(reference `decode_videos_to_clips`, `epickitchens.py:81-153`). Label spaces
can be filtered to train-set actions (`epickitchens.py:217-274`).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from vjepa2_tpu.data.video import VideoReadError, VideoReader

logger = logging.getLogger(__name__)


def build_action_label_space(train_annotations: pd.DataFrame) -> dict:
    """Unified verb/noun/action label spaces filtered to train-set actions."""
    verbs = sorted(train_annotations["verb"].unique())
    nouns = sorted(train_annotations["noun"].unique())
    pairs = sorted({(v, n) for v, n in zip(train_annotations["verb"], train_annotations["noun"])})
    return {
        "verb_to_idx": {v: i for i, v in enumerate(verbs)},
        "noun_to_idx": {n: i for i, n in enumerate(nouns)},
        "action_to_idx": {p: i for i, p in enumerate(pairs)},
    }


@dataclass
class AnticipationSample:
    clip: np.ndarray  # [T, H, W, 3]
    anticipation_time: float  # seconds into the future
    verb: int
    noun: int
    action: int


class EpicKitchensAnticipation:
    def __init__(
        self,
        annotations_csv: str,
        label_space: Optional[dict] = None,
        frames_per_clip: int = 16,
        frame_step: int = 4,
        anticipation_time_range: tuple[float, float] = (1.0, 1.0),
        anticipation_point_range: tuple[float, float] = (0.1, 0.1),
        transform=None,
        seed: int = 0,
    ):
        self.df = pd.read_csv(annotations_csv)
        required = {"video_path", "start_sec", "stop_sec", "verb", "noun"}
        missing = required - set(self.df.columns)
        if missing:
            raise ValueError(f"annotation csv missing columns: {missing}")
        self.label_space = label_space or build_action_label_space(self.df)
        self.fpc = frames_per_clip
        self.frame_step = frame_step
        self.at_range = anticipation_time_range
        self.ap_range = anticipation_point_range
        self.transform = transform
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.df)

    @property
    def num_verbs(self):
        return len(self.label_space["verb_to_idx"])

    @property
    def num_nouns(self):
        return len(self.label_space["noun_to_idx"])

    @property
    def num_actions(self):
        return len(self.label_space["action_to_idx"])

    def valid_action_classes(self) -> set:
        return set(self.label_space["action_to_idx"].values())

    def __getitem__(self, index: int) -> AnticipationSample:
        for _ in range(50):
            row = self.df.iloc[index]
            try:
                return self._load(row)
            except (VideoReadError, OSError, ValueError) as e:
                logger.warning("anticipation sample failed (%s); resampling", e)
                index = int(self.rng.integers(0, len(self)))
        raise RuntimeError("too many anticipation decode failures")

    def _load(self, row) -> AnticipationSample:
        vr = VideoReader(str(row["video_path"]))
        fps = vr.avg_fps
        # anticipation point: fraction into the action segment used as the
        # anticipated moment; anticipation time: how long before it the
        # context clip ends.
        ap = float(self.rng.uniform(*self.ap_range))
        at = float(self.rng.uniform(*self.at_range))
        action_t = float(row["start_sec"]) + ap * (float(row["stop_sec"]) - float(row["start_sec"]))
        context_end = max(0.0, action_t - at)
        end_frame = int(context_end * fps)
        span = self.fpc * self.frame_step
        start_frame = max(0, end_frame - span)
        indices = np.linspace(start_frame, max(start_frame + 1, end_frame - 1), num=self.fpc).astype(
            np.int64
        )
        clip = vr.get_batch(indices)
        if self.transform is not None:
            clip = self.transform(clip, rng=self.rng)

        ls = self.label_space
        verb = ls["verb_to_idx"].get(row["verb"], 0)
        noun = ls["noun_to_idx"].get(row["noun"], 0)
        action = ls["action_to_idx"].get((row["verb"], row["noun"]), 0)
        return AnticipationSample(clip, at, verb, noun, action)


def anticipation_collate(samples: Sequence[AnticipationSample]):
    clips = np.stack([s.clip for s in samples])
    at = np.asarray([s.anticipation_time for s in samples], np.float32)
    verbs = np.asarray([s.verb for s in samples])
    nouns = np.asarray([s.noun for s in samples])
    actions = np.asarray([s.action for s in samples])
    return clips, at, verbs, nouns, actions
