"""End-to-end runs of the five BASELINE.json benchmark configs.

Configs 1 and 3 have dedicated oracle-fidelity tests (test_dynamics.py);
here every config — including the constrained/disturbed/randomized ones —
runs batched under jit with masked auto-reset and must be (a) finite, (b)
bitwise-deterministic under a fixed seed, and (c) exercising its declared
features (constraint values present, disturbances active, gates progressing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard


B, STEPS = 64, 40


def _run(env, action_fn, steps=STEPS, seed=0):
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(seed))
    step = jax.jit(vec.step)
    infos = None
    rews = []
    for t in range(steps):
        state, obs, rew, done, info = step(state, action_fn(t, obs))
        rews.append(rew)
        infos = info
    return np.asarray(obs), np.stack([np.asarray(r) for r in rews]), infos


def test_config2_cartpole_tracking_constrained_noisy():
    env = make_cartpole(CartPoleConfig(
        ctrl_freq=50, pyb_freq=50, episode_len_sec=3,
        task="traj_tracking",
        task_info={"trajectory_type": "circle", "num_cycles": 1,
                   "trajectory_plane": "zx", "trajectory_position_offset": [0, 0],
                   "trajectory_scale": 0.2},
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
            {"constraint_form": "default_constraint", "constrained_variable": "input"},
        ),
        disturbances={"observation": ({"disturbance_func": "white_noise", "std": 0.01},)},
    ))
    act = lambda t, obs: jnp.zeros((B, 1))
    obs1, rews1, info = _run(env, act)
    obs2, rews2, _ = _run(env, act)
    assert np.isfinite(obs1).all() and np.isfinite(rews1).all()
    assert np.array_equal(obs1, obs2) and np.array_equal(rews1, rews2)
    assert "constraint_values" in info
    # Observation white noise must actually perturb obs vs the clean env.
    obs_clean, _, _ = _run(
        make_cartpole(CartPoleConfig(
            ctrl_freq=50, pyb_freq=50, episode_len_sec=3,
            task="traj_tracking",
            task_info={"trajectory_type": "circle", "num_cycles": 1,
                       "trajectory_plane": "zx", "trajectory_position_offset": [0, 0],
                       "trajectory_scale": 0.2},
        )),
        act,
    )
    assert not np.array_equal(obs1, obs_clean)


def test_config4_quad3d_figure8_constrained_impulse():
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=3,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0.0, 0.0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", randomized_inertial_prop=True, randomized_init=True,
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
            {"constraint_form": "default_constraint", "constrained_variable": "input"},
        ),
        disturbances={"dynamics": ({"disturbance_func": "impulse", "magnitude": 0.005,
                                    "duration": 10, "decay_rate": 0.8},)},
        done_on_out_of_bound=True,
    ))
    hover = float(env.u_goal[0])
    act = lambda t, obs: jnp.full((B, 4), hover)
    obs1, rews1, info = _run(env, act)
    obs2, rews2, _ = _run(env, act)
    assert np.isfinite(obs1).all()
    assert np.array_equal(obs1, obs2) and np.array_equal(rews1, rews2)
    assert "constraint_values" in info and "mse" in info
    # Different seeds -> different randomized physics -> different outcomes.
    obs3, _, _ = _run(env, act, seed=1)
    assert not np.array_equal(obs1, obs3)


def test_config5_quad3d_gate_course_randomized():
    import os
    import yaml

    levels = os.path.join(os.path.dirname(__file__), "..",
                          "safe_control_gym_tpu", "competition", "levels")
    with open(os.path.join(levels, "level2.yaml")) as f:
        level = yaml.safe_load(f)["quadrotor_config"]
    keys = {f.name for f in QuadrotorConfig.__dataclass_fields__.values()}
    cfg = {k: v for k, v in level.items() if k in keys}
    cfg.update(quad_type=3, ctrl_freq=30, pyb_freq=30, episode_len_sec=4)
    env = make_quadrotor(QuadrotorConfig(**cfg))
    hover = float(env.u_goal[0])
    act = lambda t, obs: jnp.full((B, 4), hover)
    obs1, rews1, info = _run(env, act)
    assert np.isfinite(obs1).all()
    assert "current_target_gate_id" in info
    assert "collision" in info
    # Gate poses are randomized per env: the fuzzed target-gate positions
    # reported while out of range must differ across the batch.
    pos = np.asarray(info["current_target_gate_pos"])
    assert pos.std(axis=0).max() > 1e-4
