"""Batched on-device math ops: integrators, rotations, linear-control algebra."""

from safe_control_gym_tpu.ops.integrators import rk4_step, euler_step, discretize
from safe_control_gym_tpu.ops.rotations import rot_x, rot_y, rot_z, rot_xyz, euler_jacobian

__all__ = [
    "rk4_step",
    "euler_step",
    "discretize",
    "rot_x",
    "rot_y",
    "rot_z",
    "rot_xyz",
    "euler_jacobian",
]
