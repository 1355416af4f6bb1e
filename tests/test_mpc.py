"""MPC family tests: nonlinear MPC, LinearMPC, constraint satisfaction,
batched solving."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.linear_mpc import LinearMPC
from safe_control_gym_tpu.controllers.mpc import MPC

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



def _closed_loop(env, ctrl, T):
    state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    ctrl.reset()
    actions = []
    for _ in range(T):
        a = ctrl.select_action(np.asarray(obs))
        actions.append(a)
        state, obs, r, d, info = step(state, jnp.asarray(a))
    return np.asarray(state.x), np.stack(actions)


def test_mpc_stabilizes_cartpole_with_constraints():
    env = make_cartpole(
        CartPoleConfig(
            task="stabilization",
            cost="quadratic",
            randomized_init=False,
            init_state={"init_theta": 0.2, "init_x": -0.3},
            episode_len_sec=4,
            constraints=(
                {"constraint_form": "default_constraint", "constrained_variable": "input"},
                {"constraint_form": "default_constraint", "constrained_variable": "state"},
            ),
        )
    )
    mpc = MPC(env, horizon=40, q_mpc=[1.0], r_mpc=[0.1], al_iters=2, inner_iters=5,
              terminal_lqr_cost=True)
    x, actions = _closed_loop(env, mpc, 150)
    assert abs(x[2]) < 0.05, f"theta {x}"  # pole upright
    assert abs(x[0]) < 0.5, f"cart pos {x}"
    # Input constraints respected (|F| <= 10).
    assert np.abs(actions).max() <= 10.0 + 1e-4


def test_mpc_respects_tight_input_constraint():
    env = make_cartpole(
        CartPoleConfig(
            task="stabilization",
            cost="quadratic",
            randomized_init=False,
            init_state={"init_theta": 0.15},
            episode_len_sec=4,
            constraints=(
                {
                    "constraint_form": "bounded_constraint",
                    "constrained_variable": "input",
                    "lower_bounds": [-2.0],
                    "upper_bounds": [2.0],
                },
            ),
        )
    )
    mpc = MPC(env, horizon=40, q_mpc=[1.0], r_mpc=[0.1], al_iters=3, inner_iters=5,
              terminal_lqr_cost=True)
    x, actions = _closed_loop(env, mpc, 120)
    # AL keeps the planned inputs within (near) the tightened bounds.
    assert np.abs(actions).max() <= 2.0 + 0.05, np.abs(actions).max()
    assert abs(x[2]) < 0.1, x


def test_linear_mpc_quad2d():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="stabilization",
            cost="quadratic",
            task_info={"stabilization_goal": [0, 1], "stabilization_goal_tolerance": 0.01},
            randomized_init=False,
            init_state={"init_x": 0.3, "init_z": 0.6},
            episode_len_sec=3,
            ctrl_freq=50,
            pyb_freq=50,
        )
    )
    lmpc = LinearMPC(env, horizon=20, q_mpc=[1.0], r_mpc=[0.1], al_iters=1,
                     inner_iters=4, terminal_lqr_cost=True)
    x, _ = _closed_loop(env, lmpc, 150)
    assert abs(x[0]) < 0.05 and abs(x[2] - 1.0) < 0.05, x


def test_mpc_batched_solve():
    env = make_cartpole(
        CartPoleConfig(task="stabilization", cost="quadratic", randomized_init=False)
    )
    mpc = MPC(env, horizon=20, q_mpc=[1.0], r_mpc=[0.1], al_iters=1, inner_iters=4)
    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)) * 0.1)
    us, costs = mpc.solve_batch(x0s)
    assert us.shape == (16, 20, 1)
    assert np.all(np.isfinite(np.asarray(costs)))
