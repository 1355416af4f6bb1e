"""Numerical-fidelity tests: JAX engine vs. the NumPy CPU oracle.

BASELINE north-star: trajectories under fixed seed must match the analytic
RK4 reference (CartPole + Quadrotor).  On CPU in float32/float64 we demand
near-ulp agreement; a separate test asserts exact bitwise equality of the
single-step transition in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, cartpole_fc, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import (
    QuadrotorConfig,
    QuadType,
    cmd2pwm,
    make_quadrotor,
    pwm2rpm,
    quad_fc_1d,
    quad_fc_2d,
    quad_fc_3d,
)
from safe_control_gym_tpu.ops.integrators import rk4_step

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from oracles import numpy_reference as oracle


def test_cartpole_fc_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = rng.normal(size=4)
        u = rng.normal(size=1) * 10
        got = np.asarray(cartpole_fc(jnp.asarray(x), jnp.asarray(u), 1.0, 0.1, 1.0))
        want = oracle.cartpole_fc(x, u, 1.0, 0.1, 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_quad_fc_matches_oracle():
    rng = np.random.default_rng(1)
    mass, j = 0.03454, np.array([1.4e-5, 1.4e-5, 2.17e-5])
    for _ in range(25):
        f = np.abs(rng.normal(size=4)) * 0.1
        x1 = rng.normal(size=2)
        np.testing.assert_allclose(
            np.asarray(quad_fc_1d(jnp.asarray(x1), jnp.asarray(f), mass, 0.0)),
            oracle.quad1d_fc(x1, f, mass),
            rtol=1e-5,
            atol=1e-6,
        )
        x2 = rng.normal(size=6) * 0.3
        np.testing.assert_allclose(
            np.asarray(quad_fc_2d(jnp.asarray(x2), jnp.asarray(f), mass, j[1], 0.0, 0.0)),
            oracle.quad2d_fc(x2, f, mass, j[1]),
            rtol=1e-5,
            atol=1e-6,
        )
        x3 = rng.normal(size=12) * 0.3
        np.testing.assert_allclose(
            np.asarray(
                quad_fc_3d(jnp.asarray(x3), jnp.asarray(f), jnp.asarray(mass), jnp.asarray(j), jnp.zeros(3))
            ),
            oracle.quad3d_fc(x3, f, mass, j),
            rtol=1e-4,
            atol=1e-5,
        )


def test_rk4_float64_single_step_ulp_level():
    """In float64 on CPU, one RK4 step matches the oracle to a few ulp.

    Exact bit equality vs NumPy is not attainable (XLA:CPU contracts
    multiply-adds into FMAs; NumPy does not), so the fidelity bar is
    <= 4 ulp per step; bitwise *self*-consistency of the engine (same seed,
    any batch layout) is asserted in test_vector.py.
    """
    with jax.enable_x64():
        x = jnp.asarray(np.array([0.1, -0.2, 0.05, 0.3]), jnp.float64)
        u = jnp.asarray(np.array([3.7]), jnp.float64)
        fc = lambda a, b: cartpole_fc(a, b, 1.0, 0.1, 1.0)
        got = np.asarray(jax.jit(lambda a, b: rk4_step(fc, a, b, 0.02))(x, u))
    want = oracle.rk4(
        lambda a, b: oracle.cartpole_fc(a, b, 1.0, 0.1, 1.0),
        np.asarray(x, np.float64),
        np.asarray(u, np.float64),
        0.02,
    )
    np.testing.assert_array_max_ulp(got, want, maxulp=4)


def test_actuation_pipeline_matches_oracle():
    for nu in (1, 2, 4):
        thrust = np.linspace(0.02, 0.2, nu)
        got = np.asarray(pwm2rpm(cmd2pwm(jnp.asarray(thrust), jnp.float32)) ** 2) * oracle.KF
        want = oracle.thrust_to_forces(thrust, dtype=np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("quad_type", [1, 2, 3])
def test_quadrotor_env_trajectory_matches_oracle(quad_type):
    """BASELINE config 1/3-style: full env rollout vs oracle, fixed seed,
    no disturbances, randomized inertia + init state."""
    nu = {1: 1, 2: 2, 3: 4}[quad_type]
    cfg = QuadrotorConfig(
        quad_type=quad_type,
        ctrl_freq=60,
        pyb_freq=240,
        episode_len_sec=2,
        task="stabilization",
        cost="quadratic",
        randomized_init=True,
        randomized_inertial_prop=True,
        done_on_out_of_bound=False,
        dtype=jnp.float64,
    )
    with jax.enable_x64():
        env = make_quadrotor(cfg)
        key = jax.random.key(42)
        state, obs, _ = jax.jit(env.reset)(key)
        x0 = np.asarray(state.x)
        mass = float(state.mass)
        j_diag = np.asarray(state.j_diag)
        T = 30
        rng = np.random.default_rng(7)
        hover = mass * 9.8 / nu
        thrusts = hover * (1.0 + 0.05 * rng.standard_normal((T, nu)))
        # Pre-clip to the PWM-derived action bounds so the env's clip is a
        # no-op and the oracle sees identical thrusts.
        thrusts = np.clip(thrusts, env.spaces.action_low, env.spaces.action_high)
        step = jax.jit(env.step)
        xs = [x0]
        s = state
        for t in range(T):
            s, obs, r, d, info = step(s, jnp.asarray(thrusts[t]))
            xs.append(np.asarray(s.x))
        got = np.stack(xs)
    # Oracle applies the same clip (inside bounds here) and pipeline.
    want = oracle.quad_rollout(
        quad_type, x0, thrusts, 1.0 / 240, 4, mass, j_diag
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_cartpole_env_trajectory_matches_oracle():
    """BASELINE config 1: CartPole stabilization, RK4 dt=0.02, no
    constraints/disturbances."""
    cfg = CartPoleConfig(
        ctrl_freq=50,
        pyb_freq=50,
        episode_len_sec=5,
        task="stabilization",
        cost="quadratic",
        randomized_init=True,
        randomized_inertial_prop=True,
        done_on_out_of_bound=False,
        dtype=jnp.float64,
    )
    with jax.enable_x64():
        env = make_cartpole(cfg)
        state, obs, _ = jax.jit(env.reset)(jax.random.key(3))
        x0 = np.asarray(state.x)
        pl, pm, cm = float(state.pole_length), float(state.pole_mass), float(state.cart_mass)
        T = 100
        rng = np.random.default_rng(5)
        forces = rng.uniform(-5, 5, size=(T, 1))
        step = jax.jit(env.step)
        xs = [x0]
        s = state
        for t in range(T):
            s, obs, r, d, info = step(s, jnp.asarray(forces[t]))
            xs.append(np.asarray(s.x))
        got = np.stack(xs)
    want = oracle.cartpole_rollout(x0, forces, 0.02, 1, pl, pm, cm)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_reset_determinism_and_key_independence():
    """Same key => identical episode; different keys => different params."""
    env = make_quadrotor(
        QuadrotorConfig(quad_type=2, randomized_inertial_prop=True, randomized_init=True)
    )
    s1, o1, _ = jax.jit(env.reset)(jax.random.key(9))
    s2, o2, _ = jax.jit(env.reset)(jax.random.key(9))
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert float(s1.mass) == float(s2.mass)
    s3, o3, _ = jax.jit(env.reset)(jax.random.key(10))
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))
    assert float(s1.mass) != float(s3.mass)
