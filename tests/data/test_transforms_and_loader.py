"""Transforms, video dataset (real encoded videos via cv2), and loader tests."""

import os

import numpy as np
import pytest

from vjepa2_tpu.data.loader import DataLoader, default_collate
from vjepa2_tpu.data.transforms import EvalVideoTransform, ImageTransform, VideoTransform
from vjepa2_tpu.data.video import VideoReader, synthetic_clip
from vjepa2_tpu.data.video_dataset import ConcatIndices, VideoDataset

cv2 = pytest.importorskip("cv2")


def write_video(path, num_frames=32, size=(64, 48), fps=16):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, size)
    clip = synthetic_clip(num_frames, size[1], size[0])
    for f in clip:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()
    return clip


@pytest.fixture(scope="module")
def video_manifest(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    paths = []
    for i in range(3):
        p = str(d / f"v{i}.mp4")
        write_video(p, num_frames=40 + 8 * i)
        paths.append(p)
    csv = str(d / "train.csv")
    with open(csv, "w") as f:
        for i, p in enumerate(paths):
            f.write(f"{p} {i}\n")
    return csv, paths


def test_video_reader(video_manifest):
    _, paths = video_manifest
    vr = VideoReader(paths[0])
    assert len(vr) == 40
    batch = vr.get_batch([0, 5, 10, 39])
    assert batch.shape == (4, 48, 64, 3)
    # frame content differs across time (synthetic clip rolls)
    assert np.abs(batch[0].astype(int) - batch[3].astype(int)).mean() > 1


def test_video_transform_shapes():
    clip = synthetic_clip(8, 72, 96)
    t = VideoTransform(crop_size=32, horizontal_flip=True)
    out = t(clip, rng=np.random.default_rng(0))
    assert out.shape == (8, 32, 32, 3)
    assert out.dtype == np.float32
    assert -4 < out.mean() < 4  # normalized range


def test_video_transform_motion_shift():
    clip = synthetic_clip(6, 72, 96)
    t = VideoTransform(crop_size=32, motion_shift=True)
    out = t(clip, rng=np.random.default_rng(0))
    assert out.shape == (6, 32, 32, 3)


def test_eval_transform_views():
    clip = synthetic_clip(4, 60, 100)
    t = EvalVideoTransform(crop_size=32, num_views_per_clip=3)
    views = t(clip)
    assert len(views) == 3
    assert all(v.shape == (4, 32, 32, 3) for v in views)
    assert not np.allclose(views[0], views[2])


def test_image_transform():
    img = synthetic_clip(1, 80, 90)[0]
    t = ImageTransform(crop_size=32, train=False)
    out = t(img)
    assert out.shape == (32, 32, 3)


def test_video_dataset_and_loader(video_manifest):
    csv, _ = video_manifest
    ds = VideoDataset(
        data_paths=[csv],
        frames_per_clip=8,
        frame_step=2,
        fps=None,
        transform=VideoTransform(crop_size=32),
    )
    assert len(ds) == 3
    clips, label, clip_indices = ds[1]
    assert clips[0].shape == (8, 32, 32, 3)
    assert label == 1

    loader = DataLoader(ds, sampler=[0, 1, 2], batch_size=2, num_workers=0)
    batches = list(loader)
    assert len(batches) == 1  # drop_last
    clips_b, labels_b, ci_b = batches[0]
    assert clips_b[0].shape == (2, 8, 32, 32, 3)
    assert labels_b.shape == (2,)


def test_loader_workers_out_of_order(video_manifest):
    csv, _ = video_manifest
    ds = VideoDataset(data_paths=[csv], frames_per_clip=4, frame_step=2, fps=None,
                      transform=VideoTransform(crop_size=32))
    loader = DataLoader(ds, sampler=[0, 1, 2, 0, 1, 2], batch_size=2, num_workers=2,
                        ordered=False)
    batches = list(loader)
    assert len(batches) == 3
    # ordered mode reorders deterministically
    loader2 = DataLoader(ds, sampler=[0, 1, 2, 0], batch_size=2, num_workers=2, ordered=True)
    b2 = list(loader2)
    assert len(b2) == 2
    assert b2[0][1].tolist() == [0, 1]


def test_concat_indices():
    ci = ConcatIndices([10, 20, 5])
    assert ci[0] == (0, 0)
    assert ci[9] == (0, 9)
    assert ci[10] == (1, 0)
    assert ci[29] == (1, 19)
    assert ci[30] == (2, 0)
    assert ci.total == 35


def test_dataset_fps_resolution(video_manifest):
    csv, _ = video_manifest
    ds = VideoDataset(data_paths=[csv], frames_per_clip=8, frame_step=None, fps=8,
                      transform=VideoTransform(crop_size=32))
    clips, _, ci = ds[0]
    # source fps 16, want 8 -> frame step 2
    steps = np.diff(ci[0])
    assert (steps >= 1).all() and steps.mean() >= 1.5


def test_rand_augment_and_erase():
    from vjepa2_tpu.data.augment import RandAugment, RandomErasing

    clip = synthetic_clip(4, 48, 48)
    ra = RandAugment.from_config("rand-m7-n4-mstd0.5")
    assert ra.num_layers == 4 and ra.magnitude == 7.0
    out = ra(clip, rng=np.random.default_rng(0))
    assert out.shape == clip.shape and out.dtype == np.uint8
    # temporal consistency: same op applied to identical frames -> same result
    same = np.repeat(clip[:1], 4, axis=0)
    out2 = ra(same, rng=np.random.default_rng(1))
    assert np.array_equal(out2[0], out2[3])

    re_ = RandomErasing(probability=1.0)
    erased = re_(clip.astype(np.float32), rng=np.random.default_rng(0))
    assert (erased != clip).any()
    # same box across frames
    changed = (erased != clip.astype(np.float32)).any(axis=-1)
    assert np.array_equal(changed[0], changed[1])


def test_video_transform_with_aug():
    clip = synthetic_clip(4, 72, 96)
    t = VideoTransform(crop_size=32, auto_augment=True, rand_erase_prob=1.0)
    out = t(clip, rng=np.random.default_rng(0))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == np.float32


def test_epickitchens_anticipation(video_manifest, tmp_path):
    import pandas as pd
    from vjepa2_tpu.data.epickitchens import (
        EpicKitchensAnticipation,
        anticipation_collate,
        build_action_label_space,
    )

    _, paths = video_manifest
    df = pd.DataFrame(
        {
            "video_path": [paths[0], paths[1], paths[2]],
            "start_sec": [1.5, 1.2, 2.0],
            "stop_sec": [2.2, 2.0, 2.4],
            "verb": ["take", "put", "take"],
            "noun": ["cup", "cup", "plate"],
        }
    )
    csv = str(tmp_path / "annotations.csv")
    df.to_csv(csv, index=False)
    ds = EpicKitchensAnticipation(csv, frames_per_clip=4, frame_step=2,
                                  transform=VideoTransform(crop_size=32))
    assert len(ds) == 3
    assert ds.num_verbs == 2 and ds.num_nouns == 2 and ds.num_actions == 3
    s = ds[0]
    assert s.clip.shape == (4, 32, 32, 3)
    assert s.anticipation_time == 1.0
    clips, at, v, n, a = anticipation_collate([ds[i] for i in range(3)])
    assert clips.shape == (3, 4, 32, 32, 3) and at.shape == (3,)
    assert set(a.tolist()) <= ds.valid_action_classes()


def test_circulant_frame_padding():
    from vjepa2_tpu.data.transforms import circulant_frame_padding

    clip = np.arange(3 * 2 * 2 * 3, dtype=np.uint8).reshape(3, 2, 2, 3)
    out = circulant_frame_padding(clip, 8)
    assert out.shape[0] == 8
    np.testing.assert_array_equal(out[3], clip[0])
    np.testing.assert_array_equal(out[7], clip[1])
    np.testing.assert_array_equal(circulant_frame_padding(clip, 2), clip[:2])


def test_color_jitter_clip_consistent():
    from vjepa2_tpu.data.transforms import color_jitter

    rng = np.random.default_rng(0)
    clip = (np.random.RandomState(0).rand(4, 8, 8, 3) * 255).astype(np.uint8)
    out = color_jitter(clip, rng)
    assert out.shape == clip.shape and out.dtype == np.uint8
    # same op applied to all frames: per-frame ratio of means is constant
    r = out.astype(np.float32).mean(axis=(1, 2, 3)) / clip.astype(np.float32).mean(axis=(1, 2, 3))
    assert np.allclose(r, r[0], rtol=0.35)  # saturation/contrast vary per content
    # deterministic under a fixed rng
    out2 = color_jitter(clip, np.random.default_rng(0))
    np.testing.assert_array_equal(out, out2)


def test_video_transform_jitter_and_padding():
    from vjepa2_tpu.data.transforms import VideoTransform

    t = VideoTransform(crop_size=16, color_jitter_strength=0.4, pad_frames=8,
                       use_native=False)
    clip = (np.random.RandomState(1).rand(3, 32, 32, 3) * 255).astype(np.uint8)
    out = t(clip, rng=np.random.default_rng(0))
    assert out.shape == (8, 16, 16, 3)
