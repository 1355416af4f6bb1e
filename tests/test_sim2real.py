"""Sim2real tooling tests (reference dev-sim2real analysis scripts)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from safe_control_gym_tpu.competition.sim2real import (
    align_trials,
    average_runs,
    fit_quad3d_params,
    load_flight_csv,
)

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



def _fake_trial(t0=0.0, n=100, hz=50.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = t0 + np.arange(n) / hz
    state = np.stack([np.sin(t), np.cos(t), t * 0.1], -1)
    return {"t": t, "state": state + noise * rng.standard_normal(state.shape)}


def test_align_and_average():
    trials = [_fake_trial(t0=5.0, noise=0.01, seed=i) for i in range(4)]
    grid, stack = align_trials(trials)
    assert stack.shape[0] == 4 and grid[0] == 0.0
    avg = average_runs(trials)
    # Averaging beats any single noisy trial against the clean signal.
    clean = _fake_trial(noise=0.0)["state"][: len(avg["t"])]
    err_avg = np.abs(avg["state"] - clean).mean()
    err_one = np.abs(stack[0] - clean).mean()
    assert err_avg < err_one
    assert avg["std"].mean() > 0


def test_load_flight_csv_both_formats(tmp_path):
    # reference average-run format (time,x,y,z,qx,qy,qz,qw)
    p1 = tmp_path / "avg.csv"
    with open(p1, "w") as f:
        f.write("time,x,y,z,qx,qy,qz,qw\n")
        for i in range(5):
            f.write(f"{i*0.1},{i*0.01},0,1,0,0,0,1\n")
    d = load_flight_csv(str(p1))
    assert d["state"].shape == (5, 7) and d["control"] is None

    # drone_logger format
    from safe_control_gym_tpu.utils.drone_logger import DroneLogger

    log = DroneLogger(logging_freq_hz=50, duration_sec=0.1)
    for i in range(5):
        log.log(0, i / 50, np.arange(16, dtype=float), np.arange(12, dtype=float))
    log.save_as_csv("trial", str(tmp_path))
    import glob

    csv = glob.glob(str(tmp_path / "trial_drone0.csv"))[0]
    d2 = load_flight_csv(csv)
    assert d2["state"].shape[1] == 16 and d2["control"].shape[1] == 12


def test_fit_quad3d_params_recovers_truth():
    """Generate a flight with known (mass, kf_scale); the batched fit must
    recover both to a few percent."""
    from safe_control_gym_tpu.envs.quadrotor import J_DIAG, quad_fc_3d
    from safe_control_gym_tpu.ops.integrators import rk4_step

    true_mass, true_kf = 0.031, 1.12
    dt, T = 1 / 60, 120
    x0 = jnp.zeros(12).at[4].set(1.0)
    key = jax.random.key(0)
    hover = true_mass * 9.8 / 4 / true_kf
    acts = hover * (1 + 0.2 * jax.random.normal(key, (T, 4)))

    def body(x, u):
        fc = lambda xx, uu: quad_fc_3d(xx, uu * true_kf, true_mass,
                                       jnp.asarray(J_DIAG), jnp.zeros(3))
        x = rk4_step(fc, x, u, dt)
        return x, jnp.stack([x[0], x[2], x[4]])

    _, pos = jax.lax.scan(body, x0, acts)

    fit = fit_quad3d_params(np.asarray(pos), np.asarray(acts), dt,
                            np.asarray(x0), num_candidates=2048)
    # The observable is thrust/mass, so the ratio must match tightly even
    # where the pair is only weakly identifiable.
    assert abs(fit["kf_scale"] / fit["mass"] - true_kf / true_mass) \
        / (true_kf / true_mass) < 0.05, fit
    # Open-loop rollouts with 20% thrust noise diverge quickly; the fit's
    # residual stays bounded while a clearly-wrong pair does not.
    assert fit["rmse"] < 0.3, fit
