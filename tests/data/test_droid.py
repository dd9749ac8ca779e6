"""DROID trajectory dataset test with synthetic h5 + mp4 trajectories."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")
scipy = pytest.importorskip("scipy")

from vjepa2_tpu.data.droid import (
    DROIDVideoDataset,
    droid_collate,
    poses_to_diffs,
    transform_to_camera_frame,
)
from vjepa2_tpu.data.transforms import VideoTransform
from vjepa2_tpu.data.video import synthetic_clip


def make_trajectory(root, name, num_frames=40, size=(64, 48)):
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "recordings/MP4"), exist_ok=True)
    mp4 = os.path.join(d, "recordings/MP4", "cam0.mp4")
    w = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    for f in synthetic_clip(num_frames, size[1], size[0]):
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()

    rng = np.random.RandomState(0)
    with h5py.File(os.path.join(d, "trajectory.h5"), "w") as h5:
        obs = h5.create_group("observation")
        rs = obs.create_group("robot_state")
        rs.create_dataset("cartesian_position", data=rng.rand(num_frames, 6))
        rs.create_dataset("gripper_position", data=rng.rand(num_frames))
        ce = obs.create_group("camera_extrinsics")
        ce.create_dataset("cam0_left", data=rng.rand(num_frames, 6))
    with open(os.path.join(d, "metadata.json"), "w") as f:
        json.dump({"left_mp4_path": "recordings/MP4/cam0.mp4"}, f)
    return d


@pytest.fixture(scope="module")
def droid_manifest(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("droid"))
    dirs = [make_trajectory(root, f"traj{i}") for i in range(2)]
    csv = os.path.join(root, "train.csv")
    with open(csv, "w") as f:
        for d in dirs:
            f.write(d + " 0\n")
    return csv


def test_droid_dataset(droid_manifest):
    ds = DROIDVideoDataset(
        droid_manifest,
        camera_views=["left_mp4_path"],
        frames_per_clip=8,
        frameskip=2,
        fps=5,
        transform=VideoTransform(crop_size=32),
    )
    assert len(ds) == 2
    clips, actions, states, extr, idx = ds[0]
    T = clips.shape[0]
    assert clips.shape[1:] == (32, 32, 3)
    assert states.shape == (T // 2 if T % 2 == 0 else (T + 1) // 2, 7) or states.shape[1] == 7
    assert actions.shape[0] == states.shape[0] - 1 and actions.shape[1] == 7
    assert extr.shape[1] == 6
    batch = droid_collate([ds[0], ds[1]])
    assert batch[0].shape[0] == 2


def test_poses_to_diffs_roundtrip():
    from vjepa2_tpu.planning.rotations import compose_pose
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    poses = rng.uniform(-0.3, 0.3, size=(4, 7))
    poses[:, 6] = np.clip(poses[:, 6], 0, 1)
    diffs = poses_to_diffs(poses)
    # applying diff t to pose t should recover pose t+1 (xyz and rotation)
    nxt = np.asarray(compose_pose(jnp.asarray(poses[0]), jnp.asarray(diffs[0])))
    np.testing.assert_allclose(nxt[:3], poses[1, :3], atol=1e-5)
    np.testing.assert_allclose(nxt[3:6], poses[1, 3:6], atol=1e-4)


def test_camera_frame_transform():
    rng = np.random.RandomState(2)
    poses = rng.uniform(-0.3, 0.3, size=(3, 7))
    extr = rng.uniform(-0.3, 0.3, size=(3, 6))
    out = transform_to_camera_frame(poses, extr)
    assert out.shape == (3, 7)
    np.testing.assert_allclose(out[:, 6], poses[:, 6])  # gripper untouched
