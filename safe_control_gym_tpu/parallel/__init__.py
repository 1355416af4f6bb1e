"""Device-mesh parallelism.

TPU-native replacement for the reference's process-based env parallelism
(safe_control_gym/envs/env_wrappers/vectorized_env/): instead of B env
instances sharded over worker processes connected by pipes
(subproc_vec_env.py:17-263), the env batch is a sharded global PyTree on a
``jax.sharding.Mesh``; stepping is one jitted SPMD program; global episode
statistics ride ICI collectives (psum) instead of pickled pipe messages.
"""

from safe_control_gym_tpu.parallel.vector import VecEnv, make_vec_env
from safe_control_gym_tpu.parallel.rollout import rollout, RolloutCarry, EpisodeStats
from safe_control_gym_tpu.parallel.mesh import make_mesh, shard_batch
from safe_control_gym_tpu.parallel.distributed import (
    host_mesh,
    initialize as distributed_initialize,
    sharded_init_fn,
)
from safe_control_gym_tpu.parallel.episode_stats import RecordEpisodeStatistics
from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout
from safe_control_gym_tpu.parallel.fast_quad_planar import FastPlanarQuadRollout

__all__ = [
    "VecEnv",
    "make_vec_env",
    "rollout",
    "RolloutCarry",
    "EpisodeStats",
    "make_mesh",
    "shard_batch",
    "host_mesh",
    "distributed_initialize",
    "sharded_init_fn",
    "RecordEpisodeStatistics",
    "FastQuadRollout",
    "FastPlanarQuadRollout",
]
