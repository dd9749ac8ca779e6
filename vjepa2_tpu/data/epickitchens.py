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


# ---------------------------------------------------------------------------
# Streaming pipeline (reference webdataset path, `epickitchens.py:156-216`):
# shard = one video; per-epoch seeded shard resampling -> node split ->
# worker split -> per-annotation clip decode -> partial batches.
# ---------------------------------------------------------------------------


class ResampledVideoShards:
    """Per-epoch seeded permutation of shard (video) paths
    (reference `ResampledShards`, `epickitchens.py:156-174`: train shuffles
    with generator seed == epoch; val iterates in order)."""

    def __init__(self, paths: Sequence[str], training: bool = True, epoch: int = 0):
        self.paths = np.asarray(list(paths), dtype=object)
        self.training = training
        self.epoch = epoch

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __iter__(self):
        if self.training:
            order = np.random.default_rng(self.epoch).permutation(len(self.paths))
            yield from self.paths[order]
        else:
            yield from self.paths


def split_by_node(shards, rank: int, world_size: int):
    """Rank-strided shard slice (reference `split_by_node`, `:63-78`)."""
    import itertools

    if world_size > 1:
        return itertools.islice(shards, rank, None, world_size)
    return iter(shards)


class EpicKitchensShardStream:
    """Streaming anticipation loader over per-video shards.

    Uses the same annotation CSV as the map-style dataset
    (video_path,start_sec,stop_sec,verb,noun). One pass decodes each shard's
    annotations in order (reference `decode_videos_to_clips`,
    `epickitchens.py:81-153`) and emits partial batches — sampling semantics
    match the reference webdataset pipeline, unlike the map-style fallback
    which shuffles at annotation granularity.
    """

    def __init__(
        self,
        annotations_csv: str,
        label_space: Optional[dict] = None,
        frames_per_clip: int = 16,
        fps: float = 5.0,
        anticipation_time_range: tuple[float, float] = (0.25, 1.75),
        anticipation_point_range: tuple[float, float] = (0.0, 0.25),
        transform=None,
        batch_size: int = 8,
        rank: int = 0,
        world_size: int = 1,
        worker_id: int = 0,
        num_workers: int = 1,
        training: bool = True,
        partial_batches: bool = True,
        seed: int = 0,
    ):
        self.df = pd.read_csv(annotations_csv)
        self.label_space = label_space or build_action_label_space(self.df)
        self.by_video = {k: g for k, g in self.df.groupby("video_path")}
        self.shards = ResampledVideoShards(sorted(self.by_video), training=training)
        self.fpc = frames_per_clip
        self.fps = fps
        self.at_range = anticipation_time_range
        self.ap_range = anticipation_point_range
        self.transform = transform
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.worker_id = worker_id
        self.num_workers = num_workers
        self.training = training
        self.partial_batches = partial_batches
        self.seed = seed

    def set_epoch(self, epoch: int):
        self.shards.set_epoch(epoch)

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

    def _iter_shards(self):
        import itertools

        node = split_by_node(self.shards, self.rank, self.world_size)
        if self.num_workers > 1:  # wds.split_by_worker equivalent
            node = itertools.islice(node, self.worker_id, None, self.num_workers)
        yield from node

    def _decode_shard(self, path: str, rng: np.random.Generator):
        ano = self.by_video[path]
        try:
            vr = VideoReader(str(path))
            vfps = vr.avg_fps
            fstp = max(1, int(vfps / self.fps))
            nframes = int(self.fpc * fstp)
        except (VideoReadError, OSError) as e:  # log_and_continue (`:57-60`)
            logger.warning("skipping unreadable shard %s: %s", path, e)
            return
        for _, row in ano.iterrows():
            sf = float(row["start_sec"]) * vfps
            ef = float(row["stop_sec"]) * vfps
            at = float(rng.uniform(*self.at_range))
            aframes = int(at * vfps)
            ap = float(rng.uniform(*self.ap_range))
            # anticipation frame between start and stop, minus the horizon
            # (reference `epickitchens.py:126-137`)
            af = int(sf * ap + (1 - ap) * ef - aframes)
            indices = np.arange(af - nframes, af, fstp).astype(np.int64)
            indices[indices < 0] = 0  # pad with first frame
            try:
                clip = vr.get_batch(indices)
            except (VideoReadError, OSError, IndexError) as e:
                logger.warning("skipping bad annotation in %s: %s", path, e)
                continue
            if self.transform is not None:
                clip = self.transform(clip, rng=rng)
            ls = self.label_space
            yield AnticipationSample(
                clip,
                at,
                ls["verb_to_idx"].get(row["verb"], 0),
                ls["noun_to_idx"].get(row["noun"], 0),
                ls["action_to_idx"].get((row["verb"], row["noun"]), 0),
            )

    def __iter__(self):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.shards.epoch, self.rank, self.worker_id])
        )
        buf: list[AnticipationSample] = []
        for path in self._iter_shards():
            for sample in self._decode_shard(path, rng):
                buf.append(sample)
                if len(buf) == self.batch_size:
                    yield anticipation_collate(buf)
                    buf = []
        if buf and self.partial_batches:
            yield anticipation_collate(buf)
