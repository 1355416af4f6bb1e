"""Gym-style stateful adapter (envs/gym_adapter.py): the reference's
imperative single-env API — reset() -> (obs, info), step(action) -> (obs,
rew, done, info), seed/render/close (benchmark_env.py:383,463) — over the
functional engine, trajectory-equal to driving the FnEnv directly."""

import jax
import numpy as np

from safe_control_gym_tpu.envs import (
    CartPoleConfig,
    GymEnv,
    QuadrotorConfig,
    make_cartpole,
    make_gym_env,
    make_quadrotor,
)


def _cartpole_cfg(**kw):
    base = dict(ctrl_freq=50, pyb_freq=50, episode_len_sec=0.2,
                task="stabilization", randomized_init=True)
    base.update(kw)
    return CartPoleConfig(**base)


def test_reference_control_loop_runs():
    """A verbatim reference-style loop: reset -> step until done, numpy
    in/out, TimeLimit.truncated at the horizon."""
    env = make_gym_env(_cartpole_cfg(), seed=7)
    obs, info = env.reset()
    assert isinstance(obs, np.ndarray) and obs.shape == (4,)
    done, steps = False, 0
    while not done:
        obs, rew, done, info = env.step(env.action_space.sample())
        assert isinstance(rew, float) and isinstance(done, bool)
        steps += 1
        assert steps <= env.CTRL_STEPS
    assert steps == env.CTRL_STEPS  # stabilization: ends at the time limit
    assert bool(info["TimeLimit.truncated"])
    env.close()


def test_adapter_matches_functional_env():
    """Adapter trajectories equal driving the functional env by hand with
    the same key schedule."""
    cfg = _cartpole_cfg(randomized_inertial_prop=True)
    env = make_gym_env(cfg, seed=3)
    fn = make_cartpole(cfg)

    obs_a, _ = env.reset()
    state, obs_b, _ = jax.jit(fn.reset)(jax.random.fold_in(jax.random.key(3), 0))
    np.testing.assert_allclose(obs_a, np.asarray(obs_b), rtol=1e-6)

    act = np.asarray([0.7], np.float32)
    for _ in range(5):
        obs_a, rew_a, done_a, _ = env.step(act)
        state, obs_b, rew_b, done_b, _ = jax.jit(fn.step)(state, act)
        np.testing.assert_allclose(obs_a, np.asarray(obs_b), rtol=1e-6)
        assert done_a == bool(done_b)


def test_episode_stream_and_reseed():
    """Default: successive resets draw new randomization (the reference
    continues its RNG); reseed_on_reset replays the seed every episode
    (benchmark_env.py:210-215)."""
    env = make_gym_env(_cartpole_cfg(), seed=11)
    o1, _ = env.reset()
    o2, _ = env.reset()
    assert not np.allclose(o1, o2)
    env.seed(11)
    o1b, _ = env.reset()
    np.testing.assert_array_equal(o1, o1b)

    env_r = make_gym_env(_cartpole_cfg(), seed=11, reseed_on_reset=True)
    r1, _ = env_r.reset()
    r2, _ = env_r.reset()
    np.testing.assert_array_equal(r1, r2)


def test_quadrotor_adapter_and_render():
    cfg = QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=1,
        task="stabilization",
        task_info={"stabilization_goal": [0, 0, 1],
                   "stabilization_goal_tolerance": 0.05},
        cost="rl_reward", normalized_rl_action_space=True,
    )
    env = GymEnv(make_quadrotor(cfg), seed=0)
    obs, _ = env.reset()
    assert obs.shape == (12,)
    obs, rew, done, info = env.step(np.zeros(4, np.float32))
    assert np.isfinite(rew)
    frame = env.render()
    assert frame.dtype == np.uint8 and frame.ndim == 3 and frame.shape[2] == 3

    cp = make_gym_env(_cartpole_cfg(), seed=0)
    cp.reset()
    frame = cp.render()
    assert frame.dtype == np.uint8 and frame.ndim == 3
