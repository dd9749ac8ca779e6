"""DROID robot-trajectory dataset (reference `app/vjepa_droid/droid.py`).

Per-trajectory directories hold `trajectory.h5` (robot state + camera
extrinsics) and MP4 recordings. A sample is a random fps-resampled window
from a randomly chosen camera view: (clips [T,H,W,C], actions [T-1,7],
states [T,7], extrinsics [T,6], frame indices). Actions are pose deltas with
rotation-matrix relative angles; optional camera-frame pose transform via
inverse extrinsics.
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from vjepa2_tpu.data.video import VideoReader

logger = logging.getLogger(__name__)

try:
    import h5py
except Exception:  # pragma: no cover
    h5py = None

try:
    from scipy.spatial.transform import Rotation
except Exception:  # pragma: no cover
    Rotation = None


def poses_to_diffs(poses: np.ndarray) -> np.ndarray:
    """[T, 7] absolute poses -> [T-1, 7] deltas (reference `droid.py:137-147`)."""
    xyz = poses[:, :3]
    thetas = poses[:, 3:6]
    mats = Rotation.from_euler("xyz", thetas, degrees=False).as_matrix()
    xyz_diff = xyz[1:] - xyz[:-1]
    angle_diff = np.stack(
        [
            Rotation.from_matrix(mats[t + 1] @ mats[t].T).as_euler("xyz", degrees=False)
            for t in range(len(mats) - 1)
        ]
    )
    closed = poses[:, -1:]
    return np.concatenate([xyz_diff, angle_diff, closed[1:] - closed[:-1]], axis=1)


def transform_to_camera_frame(poses: np.ndarray, extrinsics: np.ndarray) -> np.ndarray:
    """Express poses in the camera frame via inverse extrinsics
    (reference `droid.py:149-176`)."""
    gripper = poses[:, -1:]
    p6 = poses[:, :-1]

    def to_T(p):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("xyz", p[3:6], degrees=False).as_matrix()
        T[:3, 3] = p[:3]
        return T

    out = []
    for p, e in zip(p6, extrinsics):
        M = np.linalg.inv(to_T(e)) @ to_T(p)
        angle = Rotation.from_matrix(M[:3, :3]).as_euler("xyz", degrees=False)
        out.append(np.concatenate([M[:3, 3], angle]))
    return np.concatenate([np.stack(out), gripper], axis=1)


class DROIDVideoDataset:
    def __init__(
        self,
        data_path: str,
        camera_views: Sequence[str] = ("left_mp4_path", "right_mp4_path"),
        frameskip: int = 2,
        frames_per_clip: int = 16,
        fps: Optional[int] = 5,
        transform=None,
        camera_frame: bool = False,
        seed: int = 0,
    ):
        if h5py is None:
            raise ImportError("h5py required for DROID dataset")
        self.camera_views = list(camera_views)
        self.frameskip = frameskip
        self.frames_per_clip = frames_per_clip
        self.fps = fps
        self.transform = transform
        self.camera_frame = camera_frame
        self.rng = np.random.default_rng(seed)
        self.samples = list(pd.read_csv(data_path, header=None, delimiter=" ").values[:, 0])

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int):
        for _ in range(100):
            path = self.samples[index]
            try:
                return self._load(path)
            except Exception as e:
                logger.info("failed to load droid trajectory %s: %s", path, e)
                index = int(self.rng.integers(0, len(self)))
        raise RuntimeError("too many consecutive DROID load failures")

    def _metadata(self, path: str) -> dict:
        for fname in os.listdir(path):
            if fname.endswith(".json"):
                with open(os.path.join(path, fname)) as f:
                    return json.load(f)
        raise FileNotFoundError(f"no metadata json in {path}")

    def _load(self, path: str):
        meta = self._metadata(path)
        traj = h5py.File(os.path.join(path, "trajectory.h5"), "r")
        view = self.camera_views[int(self.rng.integers(0, len(self.camera_views)))]
        mp4_name = meta[view].split("recordings/MP4/")[-1]
        camera_name = mp4_name.split(".")[0]
        extr = np.asarray(traj["observation"]["camera_extrinsics"][f"{camera_name}_left"])
        states = np.concatenate(
            [
                np.asarray(traj["observation"]["robot_state"]["cartesian_position"]),
                np.asarray(traj["observation"]["robot_state"]["gripper_position"])[:, None],
            ],
            axis=1,
        )
        vr = VideoReader(os.path.join(path, "recordings/MP4", mp4_name))
        vfps = vr.avg_fps
        fpc = self.frames_per_clip
        fps = self.fps if self.fps is not None else vfps
        fstp = math.ceil(vfps / fps)
        nframes = int(fpc * fstp)
        if len(vr) < nframes:
            raise ValueError(f"video too short: {len(vr)} < {nframes}")

        ef = int(self.rng.integers(nframes, len(vr)))
        sf = ef - nframes
        indices = np.arange(sf, sf + nframes, fstp).astype(np.int64)

        states = states[indices][:: self.frameskip]
        extr = extr[indices][:: self.frameskip]
        if self.camera_frame:
            states = transform_to_camera_frame(states, extr)
        actions = poses_to_diffs(states)

        buffer = vr.get_batch(indices)
        if self.transform is not None:
            buffer = self.transform(buffer, rng=self.rng)
        return buffer, actions, states, extr, indices


def droid_collate(samples):
    clips = np.stack([s[0] for s in samples])
    actions = np.stack([s[1] for s in samples]).astype(np.float32)
    states = np.stack([s[2] for s in samples]).astype(np.float32)
    extr = np.stack([s[3] for s in samples]).astype(np.float32)
    return clips, actions, states, extr
