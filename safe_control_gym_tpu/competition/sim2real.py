"""Sim2real analysis tools: trial alignment, averaging, batched system ID.

TPU-native counterpart of the reference's ``dev-sim2real`` tooling
(reference dev-sim2real/{sim_data_utils.py,trial_data_utils.py,
save_average_run.py,compare_sim2real.py}): load recorded flights, align and
average repeated trials, and fit simulator physical parameters to a real
trajectory.

The reference fits parameters by wrapping its (slow, sequential) firmware
simulator in ``scipy.optimize.basinhopping``/``differential_evolution``
(compare_sim2real.py:23,190).  Here the fit is a **batched rollout**: the
analytic dynamics are vmapped over thousands of candidate parameter sets and
scanned over the recorded action sequence in one XLA program — the whole
"global optimization" is a single device launch followed by an argmin.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_flight_csv",
    "align_trials",
    "average_runs",
    "fit_quad3d_params",
]


def load_flight_csv(path: str) -> Dict[str, np.ndarray]:
    """Load a flight CSV into {"t", "state", "control"} arrays.

    Accepts the drone_logger CSV contract (header ``t,<16 state>,<12 ctrl>``,
    utils/drone_logger.py) and the reference's average-run format
    (``time,x,y,z,qx,qy,qz,qw``, sim_data_utils.py:3-11) — distinguished by
    column count.
    """
    raw = np.genfromtxt(path, delimiter=",", names=True)
    cols = raw.dtype.names
    data = np.stack([raw[c] for c in cols], axis=-1)
    t = data[:, 0]
    if data.shape[1] == 8:  # reference average-run: time, xyz, quaternion
        return {"t": t, "state": data[:, 1:], "control": None}
    return {"t": t, "state": data[:, 1:17], "control": data[:, 17:]}


def _resample(t_src, y_src, t_dst):
    out = np.empty((len(t_dst), y_src.shape[1]))
    for k in range(y_src.shape[1]):
        out[:, k] = np.interp(t_dst, t_src, y_src[:, k])
    return out


def align_trials(trials: Sequence[Dict[str, np.ndarray]],
                 hz: Optional[float] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-base each trial's clock and resample onto a common grid.

    Counterpart of trial_data_utils.align_data: returns (t, stack) where
    ``stack`` is (n_trials, T, dims).  The grid spans the shortest trial at
    ``hz`` (default: the median sample rate of the first trial).
    """
    zeroed = [(tr["t"] - tr["t"][0], tr["state"]) for tr in trials]
    t_end = min(t[-1] for t, _ in zeroed)
    if hz is None:
        dt = np.median(np.diff(zeroed[0][0]))
        hz = 1.0 / max(dt, 1e-6)
    grid = np.arange(0.0, t_end, 1.0 / hz)
    stack = np.stack([_resample(t, y, grid) for t, y in zeroed])
    return grid, stack


def average_runs(trials: Sequence[Dict[str, np.ndarray]],
                 hz: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Average repeated trials (reference save_average_run.py): returns the
    mean trajectory plus the per-sample std envelope."""
    grid, stack = align_trials(trials, hz=hz)
    return {"t": grid, "state": stack.mean(0), "std": stack.std(0)}


def fit_quad3d_params(
    pos_traj: np.ndarray,
    actions: np.ndarray,
    dt: float,
    init_state: np.ndarray,
    mass_range: Tuple[float, float] = (0.025, 0.045),
    kf_scale_range: Tuple[float, float] = (0.7, 1.3),
    num_candidates: int = 4096,
    seed: int = 0,
) -> Dict[str, float]:
    """Fit (mass, thrust-coefficient scale) to a recorded flight.

    ``pos_traj``: (T, 3) measured positions; ``actions``: (T, 4) per-motor
    forces commanded at rate 1/dt; ``init_state``: (12,) initial full state.

    Re-design of compare_sim2real.py's basinhopping loop: sample
    ``num_candidates`` parameter pairs, roll *all* of them out with
    vmap(scan) in one device program, and take the RMSE argmin.  Returns the
    best parameters and their position RMSE.
    """
    from safe_control_gym_tpu.envs.quadrotor import J_DIAG, quad_fc_3d
    from safe_control_gym_tpu.ops.integrators import rk4_step

    T = min(len(pos_traj), len(actions))
    pos_ref = jnp.asarray(pos_traj[:T], jnp.float32)
    acts = jnp.asarray(actions[:T], jnp.float32)
    x0 = jnp.asarray(init_state, jnp.float32)
    j_diag = jnp.asarray(J_DIAG, jnp.float32)

    key = jax.random.key(seed)
    k_m, k_kf = jax.random.split(key)
    masses = jax.random.uniform(k_m, (num_candidates,), jnp.float32, *mass_range)
    kf_scales = jax.random.uniform(k_kf, (num_candidates,), jnp.float32, *kf_scale_range)

    def rollout_rmse(mass, kf_scale):
        def body(x, u):
            fc = lambda xx, uu: quad_fc_3d(xx, uu * kf_scale, mass, j_diag,
                                           jnp.zeros(3, jnp.float32))
            x = rk4_step(fc, x, u, dt)
            return x, jnp.stack([x[0], x[2], x[4]])

        _, pos = jax.lax.scan(body, x0, acts)
        return jnp.sqrt(jnp.mean(jnp.sum((pos - pos_ref) ** 2, axis=-1)))

    rmse = jax.jit(jax.vmap(rollout_rmse))(masses, kf_scales)
    best = int(jnp.argmin(rmse))
    return {
        "mass": float(masses[best]),
        "kf_scale": float(kf_scales[best]),
        "rmse": float(rmse[best]),
        "candidates": num_candidates,
    }
