"""No device-array closure constants in traced hot paths.

A jax.Array captured by a traced function is embedded as an MLIR constant
at LOWERING time via a device_get.  Over a remote-tunnel backend (the axon
dev setup; any disaggregated PJRT runtime) each such fetch costs seconds to
minutes — three of them once made env.reset's lowering take 250 s while the
compiled program itself ran in 0.1 s.  Build-time constants must therefore
stay NumPy (embedded for free from host memory).

This test lowers the framework's hot entry points with an instrumented
constant handler and asserts ZERO jax.Array constants get embedded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jax._src.array as _arr
import jax._src.interpreters.mlir as mlir

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor


class _Counter:
    def __init__(self):
        self.shapes = []

    def __enter__(self):
        self._orig = _arr._array_mlir_constant_handler

        def patched(val, *a, **k):
            self.shapes.append(tuple(val.shape))
            return self._orig(val, *a, **k)

        mlir.register_constant_handler(_arr.ArrayImpl, patched)
        return self

    def __exit__(self, *exc):
        mlir.register_constant_handler(_arr.ArrayImpl, self._orig)
        return False


def _assert_clean(counter, tag):
    assert not counter.shapes, (
        f"{tag}: {len(counter.shapes)} device-array constant(s) embedded at "
        f"lowering (shapes {counter.shapes[:8]}). Keep build-time closure "
        f"constants NumPy — each device constant costs a device_get per "
        f"trace (minutes over a remote tunnel)."
    )


def _quad3d_env(**over):
    cfg = dict(quad_type=3, task="traj_tracking", ctrl_freq=60, pyb_freq=60,
               episode_len_sec=2.0, cost="rl_reward", randomized_init=True)
    cfg.update(over)
    return make_quadrotor(QuadrotorConfig(**cfg))


def test_env_reset_step_no_device_constants():
    env = _quad3d_env()
    with _Counter() as c:
        jax.jit(env.reset).lower(jax.random.key(0))
    _assert_clean(c, "env.reset")
    state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
    with _Counter() as c:
        jax.jit(env.step).lower(state, jnp.zeros(4))
    _assert_clean(c, "env.step")


def test_level2_firmware_fused_no_device_constants():
    import yaml

    from safe_control_gym_tpu.competition import getting_started as gs
    from safe_control_gym_tpu.controllers.firmware import FirmwareWrapper

    import os
    lv = os.path.join(os.path.dirname(gs.__file__), "levels", "level2.yaml")
    with open(lv) as f:
        level = yaml.safe_load(f)["quadrotor_config"]
    env_func = lambda: make_quadrotor(
        gs._env_config_from_level(dict(level), 500, 500))
    w = FirmwareWrapper(env_func, 500, 25, fused=True)
    with _Counter() as c:
        obs, _ = w.reset(seed=2)
        a = np.asarray(w.env.spaces.action_low, np.float64).copy()
        w.step(0.0, a)  # first step compiles the fused scan
    _assert_clean(c, "fused firmware step")


def test_rl_train_steps_no_device_constants():
    from safe_control_gym_tpu.controllers.ddpg import DDPG
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.controllers.sac import SAC

    env = _quad3d_env()
    ppo = PPO(env, seed=0, rollout_batch_size=8, rollout_steps=8,
              opt_epochs=1, mini_batch_size=32)
    with _Counter() as c:
        ppo.learn(max_env_steps=64)
    _assert_clean(c, "PPO train step")

    sac = SAC(env, seed=0, warm_up_steps=8)
    with _Counter() as c:
        sac.learn(max_env_steps=32)
    _assert_clean(c, "SAC train step")

    ddpg = DDPG(env, seed=0, warm_up_steps=8)
    with _Counter() as c:
        ddpg.learn(max_env_steps=32)
    _assert_clean(c, "DDPG train step")
