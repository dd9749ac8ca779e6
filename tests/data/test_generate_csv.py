"""Manifest generator -> VideoDataset round trip (tools/generate_train_csv.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vjepa2_tpu.data.video import synthetic_clip

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_video(path, num_frames=12, size=(48, 32)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    for f in synthetic_clip(num_frames, size[1], size[0]):
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()


def test_scan_and_load(tmp_path):
    root = tmp_path / "videos"
    for cls in ("jump", "run"):
        for i in range(2):
            write_video(str(root / cls / f"v{i}.mp4"))
    out = str(tmp_path / "train_paths.csv")
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "generate_train_csv.py"),
         "--video-dir", str(root), "--out", out],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 4
    labels = sorted({int(ln.rsplit(" ", 1)[1]) for ln in lines})
    assert labels == [0, 1]

    from vjepa2_tpu.data.video_dataset import VideoDataset

    ds = VideoDataset(data_paths=[out], frames_per_clip=4, frame_step=2)
    clips, label, _ = ds[0]
    assert np.asarray(clips[0]).shape[0] == 4
