"""Model Predictive Contouring Control (MPCC) for gate racing.

TPU-native counterpart of reference competition/mpcc_controller.py (Romero
TRO'22-style): the drone races along a planned reference path parameterized
by progress theta; the optimizer trades contouring/lag error against
progress speed, with Gaussian "speed bump" weights near gates
(mpcc_controller.py:319-569).

Replacements for the reference's CasADi+IPOPT with runtime C codegen
(nlp_opts 'jit': True, mpcc_controller.py:789-806):

  * extended state [quad(12), theta, theta_dot], controls [f1..f4, theta_dd];
  * the path lookup p(theta) / tangent(theta) is a dense precomputed table
    interpolated with jnp.interp — differentiable, fixed-shape;
  * the NLP is solved by fixed-iteration iLQR (ops/trajopt.py); warm start by
    solution shifting (mpcc_controller.py:837-849);
  * XLA compilation replaces the CasADi JIT C compile at bring-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.quadrotor import GRAVITY_ACC, J_DIAG, MASS, quad_fc_3d
from safe_control_gym_tpu.ops.integrators import rk4_step
from safe_control_gym_tpu.ops.trajopt import ilqr_solve


class MPCCController:
    def __init__(
        self,
        trajectory,  # PiecewiseTrajectory from the planner
        dt: float,
        horizon: int = 20,
        q_contour: float = 60.0,
        q_lag: float = 60.0,
        mu_progress: float = 6.0,
        r_thrust: float = 8.0,
        r_theta_dd: float = 0.02,
        q_att: float = 2.0,
        gate_thetas=(),  # progress values at gate crossings
        gate_bump_amp: float = 4.0,
        gate_bump_sigma: float = 0.25,
        theta_dot_max: float = 4.0,
        mass: float = MASS,
        table_points: int = 600,
        ilqr_iters: int = 12,
    ):
        self.dt = dt
        self.T = horizon
        self.mass = mass
        ts, pos, vel, s = trajectory.arclength_table(table_points)
        # Parameterize by trajectory time: theta in [0, duration].
        self.theta_grid = jnp.asarray(ts - ts[0], jnp.float32)
        self.path_pos = jnp.asarray(pos[:, :3], jnp.float32)
        # Tangents from central position differences, NOT velocities: the
        # retimed plan starts/ends at rest, and normalizing a ~zero velocity
        # yields a garbage direction that corrupts the lag/contour error
        # decomposition near theta=0 (observed as the optimizer "climbing"
        # off the path at race start).
        p3 = pos[:, :3]
        tang = np.gradient(p3, axis=0)
        tang = tang / np.maximum(np.linalg.norm(tang, axis=-1, keepdims=True), 1e-9)
        self.path_tan = jnp.asarray(tang, jnp.float32)
        self.path_vel = np.asarray(vel[:, :3], np.float32)
        self.theta_max = float(self.theta_grid[-1])
        self.gate_thetas = jnp.asarray(np.asarray(gate_thetas, np.float32))
        self.params = dict(
            q_contour=q_contour, q_lag=q_lag, mu=mu_progress, r_thrust=r_thrust,
            r_theta_dd=r_theta_dd, q_att=q_att, bump_amp=gate_bump_amp,
            bump_sigma=gate_bump_sigma, theta_dot_max=theta_dot_max,
        )
        self.ilqr_iters = ilqr_iters
        self.hover = mass * GRAVITY_ACC / 4.0
        self._us_prev = None
        self._solve = jax.jit(self._make_solver())

    def reference_at(self, theta, theta_dot=1.0):
        """(pos, vel) on the planned path at progress ``theta`` — host-side
        lookup for trackers that follow the path geometry at the optimizer's
        chosen speed (velocity scales with theta_dot; theta is
        time-parameterized, so theta_dot = 1 is the plan's own schedule)."""
        grid = np.asarray(self.theta_grid)
        th = float(np.clip(theta, 0.0, self.theta_max))
        p = np.array([np.interp(th, grid, np.asarray(self.path_pos)[:, i])
                      for i in range(3)])
        v = np.array([np.interp(th, grid, self.path_vel[:, i])
                      for i in range(3)]) * float(theta_dot)
        return p, v

    def _lookup(self, theta):
        th = jnp.clip(theta, 0.0, self.theta_max)
        p = jnp.stack(
            [jnp.interp(th, self.theta_grid, self.path_pos[:, i]) for i in range(3)]
        )
        t = jnp.stack(
            [jnp.interp(th, self.theta_grid, self.path_tan[:, i]) for i in range(3)]
        )
        return p, t / jnp.maximum(jnp.linalg.norm(t), 1e-6)

    def _make_solver(self):
        P = self.params
        T = self.T
        dt = self.dt
        mass = self.mass
        j_diag = jnp.asarray(J_DIAG, jnp.float32)

        def fc(x, u):
            quad = quad_fc_3d(
                x[:12], u[:4], jnp.asarray(mass, jnp.float32), j_diag,
                jnp.zeros(3, jnp.float32),
            )
            return jnp.concatenate([quad, x[13:14], u[4:5]])

        # Trust-region the internal rollout: iLQR line-search candidates can
        # visit |theta| ~ pi/2 where the Euler kinematics blow up (tan/sec),
        # poisoning the whole solve with NaNs.  Clip attitude/rates/velocity
        # after each internal step; the optimum stays far inside the box.
        _lim = jnp.asarray(
            [5.0, 8.0, 5.0, 8.0, 5.0, 8.0, 1.2, 1.2, 3.2, 25.0, 25.0, 25.0],
            jnp.float32,
        )

        def fd(x, u):
            xn = rk4_step(fc, x, u, dt)
            return jnp.concatenate([jnp.clip(xn[:12], -_lim, _lim), xn[12:]])

        def stage_cost(x, u, k):
            pos = jnp.stack([x[0], x[2], x[4]])
            theta, theta_dot = x[12], x[13]
            p_ref, t_hat = self._lookup(theta)
            e = pos - p_ref
            e_lag = jnp.dot(e, t_hat)
            e_cont = e - e_lag * t_hat
            # Gate speed bumps: contour weight grows near gates
            # (mpcc_controller.py gaussian weights near gate thetas).
            if self.gate_thetas.shape[0]:
                bump = 1.0 + P["bump_amp"] * jnp.sum(
                    jnp.exp(-0.5 * ((theta - self.gate_thetas) / P["bump_sigma"]) ** 2)
                )
            else:
                bump = 1.0
            cost = (
                P["q_contour"] * bump * jnp.sum(e_cont**2)
                + P["q_lag"] * e_lag**2
                - P["mu"] * theta_dot * dt
                + P["r_thrust"] * jnp.sum((u[:4] - self.hover) ** 2)
                + P["r_theta_dd"] * u[4] ** 2
                + P["q_att"] * (x[6] ** 2 + x[7] ** 2)
                # Soft bounds on progress speed and thrust positivity.
                + 10.0 * jnp.maximum(theta_dot - P["theta_dot_max"], 0.0) ** 2
                + 10.0 * jnp.maximum(-theta_dot, 0.0) ** 2
                + 100.0 * jnp.sum(jnp.maximum(-u[:4], 0.0) ** 2)
                + 100.0 * jnp.sum(jnp.maximum(u[:4] - 4 * self.hover, 0.0) ** 2)
            )
            return cost

        def term_cost(x):
            return stage_cost(x, jnp.concatenate([jnp.full(4, self.hover), jnp.zeros(1)]), T) * 2.0

        def solve(x0_ext, us_init):
            res = ilqr_solve(fd, stage_cost, term_cost, x0_ext, us_init, iters=self.ilqr_iters)
            return res.xs, res.us, res.cost

        return solve

    def reset(self):
        self._us_prev = None

    def solve(self, obs, theta, theta_dot):
        """One MPCC solve.  obs: 12D quad state.  Returns (next reference
        state for FULLSTATE command, planned xs, new theta/theta_dot)."""
        # Re-anchor progress to the drone's actual position: the virtual
        # theta integrator otherwise runs ahead whenever the tracker lags
        # (the solver then re-solves from an ever-growing lag state and
        # degenerates; observed as a vertical runaway under the 25 Hz
        # firmware loop).  Closest path point in a local window around the
        # carried theta, never jumping more than the window per tick.
        pos = np.asarray([obs[0], obs[2], obs[4]], np.float32)
        grid = np.asarray(self.theta_grid)
        win = (grid >= theta - 0.3) & (grid <= theta + 0.8)
        if win.any():
            d = np.linalg.norm(np.asarray(self.path_pos)[win] - pos, axis=-1)
            theta = float(grid[win][int(d.argmin())])
        x0 = jnp.concatenate(
            [jnp.asarray(obs[:12], jnp.float32),
             jnp.asarray([theta, theta_dot], jnp.float32)]
        )
        if self._us_prev is None:
            # Cold start with positive progress acceleration: the all-hover
            # trajectory is a saddle (zero gradient through four integrator
            # stages) that the line search cannot leave on its own.
            us_init = jnp.tile(
                jnp.concatenate([jnp.full(4, self.hover), jnp.ones(1)])[None],
                (self.T, 1),
            )
        else:
            us_init = jnp.concatenate([self._us_prev[1:], self._us_prev[-1:]], 0)
        xs, us, cost = self._solve(x0, us_init)
        self._us_prev = us
        x_next = np.asarray(xs[1])
        return x_next, np.asarray(xs), float(x_next[12]), float(x_next[13])
