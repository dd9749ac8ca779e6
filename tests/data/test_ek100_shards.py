"""EK100 streaming shard pipeline: epoch-seeded resampling + node/worker
splitting (reference `evals/action_anticipation_frozen/epickitchens.py:63-174`).
Proves with generated shards x simulated nodes: disjoint per-node coverage,
full union, epoch-dependent order, worker splitting."""

import os

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

from vjepa2_tpu.data.epickitchens import (
    EpicKitchensShardStream,
    ResampledVideoShards,
    split_by_node,
)
from vjepa2_tpu.data.video import synthetic_clip


def write_video(path, num_frames=40, size=(64, 48), fps=10):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    for f in synthetic_clip(num_frames, size[1], size[0]):
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()


@pytest.fixture(scope="module")
def shard_manifest(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ek100_shards"))
    rows = []
    for i in range(4):  # 4 videos = 4 shards
        vp = os.path.join(root, f"video{i}.mp4")
        write_video(vp)
        for j in range(3):  # 3 annotations per video
            rows.append(dict(
                video_path=vp, start_sec=1.0 + j, stop_sec=1.5 + j,
                verb=f"v{j}", noun=f"n{i % 2}",
            ))
    csv = os.path.join(root, "annotations.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def test_node_split_disjoint_full_coverage():
    shards = ResampledVideoShards([f"s{i}" for i in range(7)], training=True, epoch=3)
    node0 = list(split_by_node(iter(shards), 0, 2))
    node1 = list(split_by_node(iter(shards), 1, 2))
    assert not set(node0) & set(node1)
    assert set(node0) | set(node1) == {f"s{i}" for i in range(7)}


def test_epoch_resampling_changes_order():
    shards = ResampledVideoShards([f"s{i}" for i in range(16)], training=True)
    shards.set_epoch(0)
    o0 = list(shards)
    shards.set_epoch(1)
    o1 = list(shards)
    assert o0 != o1 and sorted(o0) == sorted(o1)
    shards.set_epoch(0)
    assert list(shards) == o0  # seeded: same epoch -> same order
    val = ResampledVideoShards([f"s{i}" for i in range(16)], training=False)
    assert list(val) == [f"s{i}" for i in range(16)]


def test_stream_batches_and_node_disjointness(shard_manifest):
    def collect(rank, world):
        stream = EpicKitchensShardStream(
            shard_manifest, frames_per_clip=4, fps=5, batch_size=2,
            rank=rank, world_size=world, training=True,
        )
        stream.set_epoch(2)
        clips_seen, labels = 0, []
        for clips, at, verbs, nouns, actions in stream:
            assert clips.shape[1:] == (4, 48, 64, 3)
            assert np.all(at >= 0.25) and np.all(at <= 1.75)
            clips_seen += len(clips)
            labels.extend(zip(verbs.tolist(), nouns.tolist(), actions.tolist()))
        return clips_seen, labels

    n0, _ = collect(0, 2)
    n1, _ = collect(1, 2)
    total, _ = collect(0, 1)
    # 4 shards x 3 annotations; node split is by shard -> 6 + 6 = 12
    assert n0 + n1 == total == 12


def test_worker_split_within_node(shard_manifest):
    def shard_paths(worker_id, num_workers):
        s = EpicKitchensShardStream(
            shard_manifest, frames_per_clip=4, batch_size=2,
            worker_id=worker_id, num_workers=num_workers, training=False,
        )
        return list(s._iter_shards())

    w0, w1 = shard_paths(0, 2), shard_paths(1, 2)
    assert not set(w0) & set(w1)
    assert len(w0) + len(w1) == 4


def test_partial_batches(shard_manifest):
    stream = EpicKitchensShardStream(
        shard_manifest, frames_per_clip=4, batch_size=5, training=False,
    )
    sizes = [len(b[0]) for b in stream]
    assert sum(sizes) == 12
    assert sizes[-1] == 12 % 5 or sizes[-1] == 5
