from vjepa2_tpu.planning.cem import CEMConfig, make_cem
from vjepa2_tpu.planning.rotations import (
    compose_pose,
    euler_xyz_to_matrix,
    matrix_to_euler_xyz,
    pose_diff,
)
from vjepa2_tpu.planning.world_model import WorldModel

__all__ = [
    "CEMConfig",
    "make_cem",
    "compose_pose",
    "euler_xyz_to_matrix",
    "matrix_to_euler_xyz",
    "pose_diff",
    "WorldModel",
]
