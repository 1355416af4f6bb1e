"""GP-MPC: residual learning improves the prior model; solver runs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.gp_mpc import GPMPC
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



def test_gp_mpc_margins_mixed_rows_and_horizon_growth():
    """Probabilistic tightening with a MIXED constraint set (quadratic +
    input box + symmetric + linear, interleaved in spec order): per-row
    margins must land on the right OUTPUT rows (through ``row_order``) and
    grow along the prediction horizon via the prior closed-loop propagation
    (reference precompute_probabilistic_limits, gp_mpc.py:286-358)."""
    from safe_control_gym_tpu.ops.gp import gp_predict
    from safe_control_gym_tpu.ops.linalg import dlqr_gain

    nx, nu = 6, 2
    P_quad = np.diag([1.0, 0.2, 1.0, 0.2, 0.5, 0.1])
    constraints = [
        # quadratic FIRST: the round-2 code wrote linear margins to output
        # rows 0..nc_lin-1, which lands them here instead.
        {"constraint_form": "quadratic_constraint", "constrained_variable": "state",
         "P": P_quad.tolist(), "b": 25.0},
        {"constraint_form": "default_constraint", "constrained_variable": "input"},
        {"constraint_form": "symmetric_constraint", "constrained_variable": "state",
         "bound": [2.0, 2.0], "active_dims": [0, 2]},
        {"constraint_form": "linear_constraint", "constrained_variable": "state",
         "A": np.eye(nx).tolist(), "b": (np.ones(nx) * 3.0).tolist()},
    ]
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="stabilization",
            cost="quadratic",
            task_info={"stabilization_goal": [0, 1], "stabilization_goal_tolerance": 0.01},
            randomized_init=False,
            init_state={"init_z": 0.9},
            episode_len_sec=2,
            ctrl_freq=25,
            pyb_freq=50,
            constraints=constraints,
        )
    )
    gpmpc = GPMPC(env, horizon=8, q_mpc=[1.0], r_mpc=[0.1], num_samples=60,
                  num_inducing=30, gp_iters=40, al_iters=1, inner_iters=3)
    gpmpc.learn()
    cc = gpmpc._cc
    assert len(cc.quadratics) == 1 and len(cc.symmetrics) == 1

    x0 = np.zeros(nx, np.float32)
    x0[2] = 0.9
    us = np.tile(np.asarray(gpmpc._u_eq2)[None], (gpmpc.T, 1)) * 1.05
    margins = np.asarray(gpmpc.probabilistic_margins(x0, us))
    assert margins.shape == (gpmpc.T, cc.num_constraints)

    # NumPy oracle: independent rollout + covariance propagation + explicit
    # stacked-order assembly and row_order permutation.
    K, _ = dlqr_gain(gpmpc._Ad, gpmpc._Bd, gpmpc.Q, gpmpc.R)
    A_cl = np.asarray(gpmpc._Ad - gpmpc._Bd @ K, np.float64)
    xs = [x0.astype(np.float64)]
    for u in us:
        xs.append(np.asarray(
            gpmpc._fd_gp(gpmpc.gp_state, jnp.asarray(xs[-1], jnp.float32),
                         jnp.asarray(u, jnp.float32))))
    S = np.zeros((nx, nx))
    expect = []
    for k in range(gpmpc.T):
        std = np.sqrt(np.clip(np.diag(S), 0, None))
        parts = [np.abs(np.asarray(cc.A_x)) @ std]
        for q in cc.quadratics:
            parts.append(np.asarray(
                [0.0 if q.on_input else np.abs(2 * q.P @ xs[k]) @ std]))
        for s_ in cc.symmetrics:
            parts.append(np.abs(np.asarray(s_.F)) @ std)
        expect.append(np.concatenate(parts)[cc.row_order] * gpmpc.z_score)
        z = np.concatenate([xs[k], us[k]])[gpmpc.input_mask][None]
        _, var = gp_predict(gpmpc.gp_state, jnp.asarray(z, jnp.float32))
        v_full = np.zeros(nx)
        v_full[gpmpc.target_mask] = np.asarray(var[0], np.float64)
        S = A_cl @ S @ A_cl.T + np.diag(v_full)
    expect = np.stack(expect)
    np.testing.assert_allclose(margins, expect, rtol=2e-3, atol=1e-6)

    # Row mapping: the quadratic constraint is OUTPUT row 0 (spec order) and
    # must carry the gradient-based margin, NOT a linear-block row.
    assert margins[1:, 0].min() > 0, "quadratic row got no margin"
    # Input-box rows (output rows 1..2*nu) see no state uncertainty.
    np.testing.assert_allclose(margins[:, 1:1 + 2 * nu], 0.0, atol=1e-9)
    # Horizon growth: accumulated covariance must tighten later nodes more.
    state_rows = margins[:, 1 + 2 * nu]  # first symmetric row
    assert state_rows[0] == 0.0  # x0 is measured
    assert np.all(np.diff(state_rows[: gpmpc.T]) > -1e-9)
    assert state_rows[-1] > state_rows[1] * 1.5, state_rows


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
