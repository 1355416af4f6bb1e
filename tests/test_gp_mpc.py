"""GP-MPC: residual learning improves the prior model; solver runs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.gp_mpc import GPMPC
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



def test_gp_mpc_learns_residual_and_controls():
    # Env with a mass the prior (nominal) model gets wrong — the GP must pick
    # up the residual (the reference's motivating setting, gp_mpc.py:44-203).
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="stabilization",
            cost="quadratic",
            task_info={"stabilization_goal": [0, 1], "stabilization_goal_tolerance": 0.01},
            randomized_init=False,
            init_state={"init_z": 0.9},
            inertial_prop={"M": 0.041, "Iyy": 1.4e-5},  # true mass
            episode_len_sec=2,
            ctrl_freq=25,
            pyb_freq=50,
        )
    )
    # Prior uses the nominal cf2x mass (0.03454) via the symbolic model; the
    # env's true mass is 0.041 -> systematic z-acceleration residual.
    gpmpc = GPMPC(env, horizon=10, q_mpc=[1.0], r_mpc=[0.1], num_samples=150,
                  num_inducing=40, gp_iters=80, al_iters=1, inner_iters=4,
                  terminal_lqr_cost=True)
    res = gpmpc.learn()
    assert res["train_points"] > 10

    # GP-corrected one-step prediction must beat the prior on held-out data.
    key = jax.random.key(9)
    state, obs, _ = jax.jit(env.reset)(key)
    step = jax.jit(env.step)
    prior_err, gp_err = 0.0, 0.0
    x_prev = jnp.asarray(np.asarray(state.x), jnp.float32)
    for i in range(40):
        u = jnp.clip(
            gpmpc._u_eq2 * (1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, i), (2,))),
            jnp.asarray(env.spaces.action_low), jnp.asarray(env.spaces.action_high),
        )
        state, obs, r, d, info = step(state, u)
        x_next = jnp.asarray(np.asarray(state.x), jnp.float32)
        prior_err += float(jnp.sum((gpmpc._fd_prior(x_prev, u) - x_next) ** 2))
        gp_err += float(jnp.sum((gpmpc._fd_gp(gpmpc.gp_state, x_prev, u) - x_next) ** 2))
        x_prev = x_next
        if bool(d):
            break
    assert gp_err < prior_err * 0.5, f"GP {gp_err} vs prior {prior_err}"

    # Closed loop with the GP-corrected MPC stabilizes toward the goal.
    state, obs, _ = jax.jit(env.reset)(jax.random.key(1))
    gpmpc.reset()
    for t in range(50):
        a = gpmpc.select_action(np.asarray(obs))
        state, obs, r, d, info = step(state, jnp.asarray(a))
    x = np.asarray(state.x)
    assert abs(x[2] - 1.0) < 0.25, f"z={x[2]}"
