"""Controller tests: LQR stabilizes, iLQR improves, PID tracks, PPO runs."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.lqr import LQR
from safe_control_gym_tpu.controllers.ilqr import iLQR
from safe_control_gym_tpu.controllers.pid import PID


def _run_episode(env, controller, T=None, seed=0):
    state, obs, _ = jax.jit(env.reset)(jax.random.key(seed))
    step = jax.jit(env.step)
    controller.reset()
    total = 0.0
    xs = []
    for t in range(T or env.max_episode_steps):
        a = controller.select_action(np.asarray(obs))
        state, obs, r, d, info = step(state, jnp.asarray(a))
        total += float(r)
        xs.append(np.asarray(state.x))
        if bool(d):
            break
    return total, np.stack(xs)


def test_lqr_stabilizes_cartpole():
    env = make_cartpole(
        CartPoleConfig(
            task="stabilization",
            cost="quadratic",
            randomized_init=True,
            episode_len_sec=5,
        )
    )
    lqr = LQR(env, q_lqr=[1.0], r_lqr=[0.1])
    _, xs = _run_episode(env, lqr)
    # Settles near the goal state.
    assert np.abs(xs[-1]).max() < 0.05, f"final state {xs[-1]}"


def test_lqr_stabilizes_quad2d():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="stabilization",
            cost="quadratic",
            task_info={"stabilization_goal": [0, 1], "stabilization_goal_tolerance": 0.01},
            randomized_init=False,
            init_state={"init_x": 0.2, "init_z": 0.7},
            episode_len_sec=4,
            ctrl_freq=50,
            pyb_freq=50,
        )
    )
    lqr = LQR(env, q_lqr=[1.0], r_lqr=[0.1])
    _, xs = _run_episode(env, lqr)
    err = np.abs(xs[-1] - env.x_goal)
    assert err[0] < 0.05 and err[2] < 0.05, f"final err {err}"


def test_ilqr_improves_and_stabilizes_cartpole():
    env = make_cartpole(
        CartPoleConfig(
            task="stabilization",
            cost="quadratic",
            randomized_init=False,
            init_state={"init_theta": 0.2, "init_x": -0.3},
            episode_len_sec=4,
        )
    )
    ctrl = iLQR(env, q_lqr=[1.0], r_lqr=[0.1], max_iterations=8)
    res = ctrl.learn()
    assert np.isfinite(res["cost"])
    _, xs = _run_episode(env, ctrl)
    assert np.abs(xs[-1][[0, 2]]).max() < 0.1, f"final state {xs[-1]}"


def test_pid_tracks_quad3d():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=3,
            task="stabilization",
            cost="rl_reward",
            task_info={"stabilization_goal": [0.3, -0.2, 1.0], "stabilization_goal_tolerance": 0.05},
            randomized_init=False,
            init_state={"init_z": 0.5},
            episode_len_sec=4,
            ctrl_freq=50,
            pyb_freq=100,
        )
    )
    pid = PID(env)
    _, xs = _run_episode(env, pid)
    final_pos = xs[-1][[0, 2, 4]]
    assert np.linalg.norm(final_pos - np.array([0.3, -0.2, 1.0])) < 0.1, final_pos


def test_pid_hover_quad2d():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="stabilization",
            task_info={"stabilization_goal": [0.0, 1.0], "stabilization_goal_tolerance": 0.05},
            randomized_init=False,
            init_state={"init_z": 0.8},
            episode_len_sec=3,
            ctrl_freq=50,
            pyb_freq=100,
        )
    )
    pid = PID(env)
    _, xs = _run_episode(env, pid)
    assert abs(xs[-1][2] - 1.0) < 0.05, f"z = {xs[-1][2]}"
