"""TPU-native vectorized environments.

Functional counterpart of the reference's ``safe_control_gym/envs/`` layer:
every environment is a pair of pure functions ``reset(key) -> (state, obs,
info)`` and ``step(state, action) -> (state, obs, reward, done, info)`` over
PyTrees, built by a factory from a static config.  Batch, device, and host
parallelism are applied outside via vmap / shard_map (see
``safe_control_gym_tpu.parallel``).
"""

from safe_control_gym_tpu.envs.benchmark import Task, Cost, EnvSpaces, FnEnv
from safe_control_gym_tpu.envs.cartpole import make_cartpole, CartPoleConfig
from safe_control_gym_tpu.envs.gym_adapter import GymEnv, make_gym_env
from safe_control_gym_tpu.envs.quadrotor import make_quadrotor, QuadrotorConfig, QuadType

__all__ = [
    "Task",
    "Cost",
    "EnvSpaces",
    "FnEnv",
    "GymEnv",
    "make_cartpole",
    "CartPoleConfig",
    "make_gym_env",
    "make_quadrotor",
    "QuadrotorConfig",
    "QuadType",
]
