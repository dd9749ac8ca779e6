"""Minimal jit-friendly rotation utilities (extrinsic-xyz Euler).

Replaces scipy.spatial.transform.Rotation in the planning loop (reference
`notebooks/utils/mpc_utils.py:166-190` round-trips through scipy on CPU per
CEM step; here pose composition stays on device inside the jitted loop).
Convention matches scipy `Rotation.from_euler("xyz", ...)` (extrinsic):
R = Rz @ Ry @ Rx.
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_xyz_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """euler [..., 3] (x, y, z angles, radians) -> [..., 3, 3]."""
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    # R = Rz(c) @ Ry(b) @ Rx(a)
    row0 = jnp.stack([cc * cb, cc * sb * sa - sc * ca, cc * sb * ca + sc * sa], axis=-1)
    row1 = jnp.stack([sc * cb, sc * sb * sa + cc * ca, sc * sb * ca - cc * sa], axis=-1)
    row2 = jnp.stack([-sb, cb * sa, cb * ca], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] extrinsic-xyz angles (gimbal lock unguarded)."""
    b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def compose_pose(pose: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """New end-effector pose after a delta action (reference `compute_new_pose`).

    pose, action: [..., 7] = (xyz, euler_xyz, gripper).
    new_rotation = R(delta) @ R(pose); gripper clipped to [0, 1].
    """
    new_xyz = pose[..., :3] + action[..., :3]
    R = euler_xyz_to_matrix(pose[..., 3:6])
    dR = euler_xyz_to_matrix(action[..., 3:6])
    new_angle = matrix_to_euler_xyz(dR @ R)
    new_grip = jnp.clip(pose[..., 6:7] + action[..., 6:7], 0.0, 1.0)
    return jnp.concatenate([new_xyz, new_angle, new_grip], axis=-1)


def pose_diff(start: jnp.ndarray, end: jnp.ndarray) -> jnp.ndarray:
    """Delta action taking ``start`` to ``end`` (reference
    `mpc_utils.py:poses_to_diff`): xyz/gripper differences plus the relative
    rotation R(end) @ R(start)^T as extrinsic-xyz angles. Inverse of
    `compose_pose` up to gripper clipping."""
    xyz = end[..., :3] - start[..., :3]
    Rs = euler_xyz_to_matrix(start[..., 3:6])
    Re = euler_xyz_to_matrix(end[..., 3:6])
    theta = matrix_to_euler_xyz(Re @ jnp.swapaxes(Rs, -1, -2))
    grip = end[..., 6:7] - start[..., 6:7]
    return jnp.concatenate([xyz, theta, grip], axis=-1)
