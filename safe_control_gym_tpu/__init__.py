"""safe-control-gym-tpu: a TPU-native re-design of the safe-control-gym benchmark suite.

The reference (ekumenlabs/safe-control-gym, IROS-2022 fork of utiasDSL
safe-control-gym v0.5.0) is a CPU codebase built around PyBullet physics,
CasADi symbolic models, and process-level env parallelism.  This package
re-builds the same capabilities TPU-first:

* environments are pure JAX functions over PyTrees (closed-form dynamics +
  explicit RK4), jit/vmap'ed over thousands of env instances in lockstep
  (replaces ``BenchmarkEnv``/PyBullet, reference
  ``safe_control_gym/envs/benchmark_env.py`` and
  ``envs/gym_pybullet_drones/``);
* constraints, disturbances, domain randomization and episode bookkeeping are
  batched on-device ops carried in the env-state PyTree (replaces
  ``envs/constraints.py``, ``envs/disturbances.py``);
* parallelism is a device mesh + ``shard_map`` with XLA collectives
  (replaces ``SubprocVecEnv`` pipes, reference
  ``envs/env_wrappers/vectorized_env/``);
* model-based controllers use ``jax.jacfwd``/scan-based Riccati and
  fixed-iteration SQP solvers (replaces CasADi/IPOPT).
"""

from safe_control_gym_tpu.utils.registration import make, register, get_config, registry

__version__ = "0.1.0"

__all__ = ["make", "register", "get_config", "registry", "__version__"]

# Register built-in environments and controllers on import, mirroring the
# reference's entry-point registry (reference: safe_control_gym/__init__.py,
# utils/registration.py:89-167).
from safe_control_gym_tpu import _registry_entries  # noqa: E402,F401
