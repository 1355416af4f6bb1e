"""Model Predictive Contouring Control (MPCC) for gate racing.

TPU-native counterpart of reference competition/mpcc_controller.py (Romero
TRO'22-style): the drone races along a planned reference path parameterized
by progress theta; the optimizer trades contouring/lag error against
progress speed.

Reference-parity structure (round 2):

  * extended state [quad(12), rate-bounded thrusts rbf(4), theta, theta_dot]
    with inputs [delta_rbf(4), theta_dd] — thrust SLEW is the decision
    variable, matching the reference's rate-bounded actuator model
    (mpcc_controller.py:250-318); the commanded thrust profile is therefore
    C0-smooth, which the stock-gain Mellinger tracker needs;
  * inequality bounds handled by the augmented-Lagrangian outer loop
    (ops/trajopt.al_ilqr_solve) with warm-started multipliers, replacing the
    soft quadratic penalties of round 1: per-motor thrust min/max, thrust
    slew, inclination <= 60 deg, |body rate|, 0 <= theta_dot <= max,
    |theta_dd| (mpcc_controller.py:745-790 opti.subject_to set);
  * cost = lag + variable-weight contour (Gaussian kernels around gates and
    obstacles baked into a per-theta table, mpcc_controller.py:536-560)
    + body-orientation-rate + progress-acc + thrust-slew quadratics
    − speed-bump-modulated progress incentive (the incentive collapses when
    the vehicle nears a gate above the speed threshold,
    mpcc_controller.py:360-400);
  * the path lookup p(theta)/tangent(theta) is a dense precomputed table
    interpolated with jnp.interp — differentiable, fixed-shape;
  * fixed-iteration AL-iLQR under one jit replaces CasADi+IPOPT with runtime
    C codegen (nlp_opts 'jit': True, mpcc_controller.py:789-806); warm start
    by solution shifting (mpcc_controller.py:837-849).

theta stays TIME-parameterized against the TOPP-retimed plan (theta_dot = 1
rides the plan's own speed schedule); the reference parameterizes by
arc-length instead — equivalent up to the (known) plan speed profile, which
``speed_of`` exposes for the m/s-denominated speed-bump terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.gates import (
    DRONE_RADIUS,
    GATE_INNER_HALF,
    GATE_OUTER_HALF,
    GATE_SLAB_HALF,
    OBSTACLE_RADIUS,
)
from safe_control_gym_tpu.envs.quadrotor import GRAVITY_ACC, J_DIAG, MASS, quad_fc_3d
from safe_control_gym_tpu.ops.integrators import rk4_step
from safe_control_gym_tpu.ops.trajopt import al_ilqr_solve


# Extended-state layout (shared by the class and the module-level solver).
_RBF = slice(12, 16)
_TH = 16
_THD = 17

# Trust-region for the internal rollout: iLQR line-search candidates can
# visit |theta| ~ pi/2 where the Euler kinematics blow up (tan/sec),
# poisoning the whole solve with NaNs.  Clip attitude/rates/velocity after
# each internal step; the optimum stays far inside the box.
_ROLLOUT_LIM = np.asarray(
    [5.0, 8.0, 5.0, 8.0, 5.0, 8.0, 1.2, 1.2, 3.2, 25.0, 25.0, 25.0],
    np.float32,
)


@partial(jax.jit, static_argnames=("al_iters", "inner_iters"))
def _mpcc_solve(tables, scal, x0_ext, us_init, mu0, frames, bands,
                *, al_iters, inner_iters):
    """One MPCC AL-iLQR solve, compiled ONCE per (shapes, iteration counts).

    All per-plan data (path tables, weights, frame poses) enters as traced
    arguments instead of closure constants: every episode builds a fresh
    MPCCController (fresh plan), and a per-instance closure would force a
    full recompile per episode — ~20 s on CPU, most of an episode's wall
    time.  Shapes are stable across plans (fixed table_points/horizon), so
    the second and later episodes hit the jit cache.
    """
    j_diag = jnp.asarray(J_DIAG, jnp.float32)
    dt = scal["dt"]
    grid = tables["theta_grid"]

    def lookup(theta):
        th = jnp.clip(theta, 0.0, scal["theta_max"])
        p = jnp.stack(
            [jnp.interp(th, grid, tables["path_pos"][:, i]) for i in range(3)]
        )
        t = jnp.stack(
            [jnp.interp(th, grid, tables["path_tan"][:, i]) for i in range(3)]
        )
        w = jnp.interp(th, grid, tables["contour_w"])
        spd = jnp.interp(th, grid, tables["path_speed"])
        return p, t / jnp.maximum(jnp.linalg.norm(t), 1e-6), w, spd

    def fc(x, u):
        # Quad driven by the CURRENT rate-bounded thrusts; thrust slew and
        # the theta double-integrator are exact Euler chains (reference
        # mpcc_controller.py:295-298 uses the same forward-Euler form).
        quad = quad_fc_3d(
            x[:12], x[_RBF], scal["mass"], j_diag, jnp.zeros(3, jnp.float32)
        )
        return jnp.concatenate([quad, u[:4], x[_THD:_THD + 1], u[4:5]])

    lim = jnp.asarray(_ROLLOUT_LIM)

    def fd(x, u):
        xn = rk4_step(fc, x, u, dt)
        return jnp.concatenate([jnp.clip(xn[:12], -lim, lim), xn[12:]])

    obst_xy = tables["obst_xy"]
    gate_positions = tables["gate_positions"]

    def repulsion_cost(pos):
        """Hinge^2 on proximity to gate-frame material and obstacle
        cylinders.  Gate margin math mirrors envs/gates.py
        gate_frame_margin (incl. the support leg); obstacles use their
        NOMINAL xy (never measured in flight) with a radius that covers the
        +-0.15 pose randomization.  Piecewise-linear kinks are fine under
        iLQR's Gauss-Newton treatment of the hinge^2."""
        cost = jnp.zeros(())
        if frames.shape[0]:
            rel = pos[None, :2] - frames[:, :2]
            c, s = jnp.cos(frames[:, 2]), jnp.sin(frames[:, 2])
            uu = rel[:, 0] * c + rel[:, 1] * s
            nn = -rel[:, 0] * s + rel[:, 1] * c
            ww = pos[2] - frames[:, 3]
            uw = jnp.maximum(jnp.abs(uu), jnp.abs(ww))
            f_slab = jnp.abs(nn) - (GATE_SLAB_HALF + DRONE_RADIUS)
            f_outer = uw - (GATE_OUTER_HALF + DRONE_RADIUS)
            f_inner = (GATE_INNER_HALF - DRONE_RADIUS) - uw
            frame_m = jnp.maximum(jnp.maximum(f_slab, f_outer), f_inner)
            leg_m = jnp.maximum(
                jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2 + 1e-12)
                - (OBSTACLE_RADIUS + DRONE_RADIUS),
                pos[2] - (frames[:, 3] - GATE_OUTER_HALF),
            )
            m = jnp.minimum(frame_m, leg_m)
            cost = cost + scal["w_rep"] * jnp.sum(
                jnp.maximum(bands - m, 0.0) ** 2
            )
        if obst_xy.shape[0]:
            d = jnp.sqrt(
                jnp.sum((pos[None, :2] - obst_xy) ** 2, axis=-1) + 1e-12
            )
            cost = cost + scal["w_rep"] * jnp.sum(
                jnp.maximum(scal["obst_rep_r"] - d, 0.0) ** 2
            )
        return cost

    def stage_cost(x, u, k):
        pos = jnp.stack([x[0], x[2], x[4]])
        theta, theta_dot = x[_TH], x[_THD]
        p_ref, t_hat, w_contour, plan_spd = lookup(theta)
        e = pos - p_ref
        e_lag = jnp.dot(e, t_hat)
        e_cont = e - e_lag * t_hat

        # Progress incentive with the reference's speed-bump modulation
        # (mpcc_controller.py:360-400): near a gate, above the speed
        # threshold, the incentive collapses (goes negative) and the
        # optimizer brakes.
        v_ms = theta_dot * plan_spd
        if gate_positions.shape[0]:
            d2 = jnp.sum((pos[None] - gate_positions) ** 2, axis=-1)
            proximity = jnp.exp(
                -0.5 * jnp.min(d2) / scal["speed_bump_sigma"] ** 2
            )
        else:
            proximity = jnp.zeros(())
        speed_factor = jnp.exp(
            1.0 + scal["speed_bump_k"]
            * (v_ms - scal["speed_bump_threshold"])
            / scal["speed_bump_threshold"]
        )
        incentive_w = scal["mu"] * (
            1.0 - proximity * jnp.minimum(speed_factor, 10.0)
        )

        return (
            scal["q_lag"] * e_lag**2
            + w_contour * jnp.sum(e_cont**2)
            + scal["q_body_rate"] * (x[9] ** 2 + x[10] ** 2)
            + scal["r_theta_dd"] * u[4] ** 2
            + scal["r_delta"] * jnp.sum(u[:4] ** 2)
            - incentive_w * theta_dot * dt
            + repulsion_cost(pos)
        )

    def term_cost(x):
        z = jnp.zeros(5, x.dtype)
        return stage_cost(x, z, 0) * 2.0

    def constraint_fn(x, u):
        """g <= 0 rows (mpcc_controller.py:745-790 subject_to set)."""
        rbf = x[_RBF]
        rate2 = scal["rate_max"] ** 2
        return jnp.concatenate([
            scal["f_min"] - rbf,                   # per-motor floor (4)
            rbf - scal["f_max"],                   # per-motor ceiling (4)
            jnp.abs(u[:4]) - scal["slew_max"],     # thrust slew (4)
            jnp.stack([
                jnp.abs(x[6]) - scal["incl_max"],  # |roll|
                jnp.abs(x[7]) - scal["incl_max"],  # |pitch|
                x[9] ** 2 + x[10] ** 2 - rate2,    # |body rate|^2
                -x[_THD],                          # theta_dot >= 0
                x[_THD] - scal["theta_dot_max"],
                jnp.abs(u[4]) - scal["theta_dd_max"],
            ]),
        ])

    res, mu = al_ilqr_solve(
        fd, stage_cost, term_cost, constraint_fn, x0_ext, us_init,
        al_iters=al_iters, inner_iters=inner_iters, mu0=mu0,
    )
    return res.xs, res.us, res.cost, mu


class MPCCController:
    def __init__(
        self,
        trajectory,  # PiecewiseTrajectory from the planner
        dt: float,
        horizon: int = 20,
        q_contour_min: float = 25.0,   # MPCC_CONTOUR_ERROR_WEIGHT_MIN
        q_contour_max: float = 45.0,   # MPCC_CONTOUR_ERROR_WEIGHT_MAX
        contour_sigma: float = 0.4,    # MPCC_CONTOUR_ERROR_GAUSSIAN_SIGMA (m)
        q_lag: float = 45.0,           # MPCC_LAG_ERROR_WEIGHT
        q_body_rate: float = 1.4,      # MPCC_BODY_ORIENTATION_RATE_WEIGHT_DIAG
        mu_progress: float = 6.0,      # progress incentive (dt-scaled form)
        r_delta: float = 0.05,         # thrust-slew quadratic
        r_theta_dd: float = 0.08,      # MPCC_CONTOUR_RATE_CHANGE_WEIGHT
        speed_bump_k: float = 5.0,     # MPCC_SPEED_BUMP_K
        speed_bump_threshold: float = 1.2,  # m/s
        speed_bump_sigma: float = 0.4,      # m
        gate_thetas=(),                # progress values at gate crossings
        gate_positions=(),             # (G, 3) gate centers for kernels
        obstacle_positions=(),         # (O, 2 or 3) obstacle xy for kernels
        gate_frames=None,              # (G, 4) x,y,yaw,height for repulsion
        w_rep: float = 800.0,          # frame-repulsion hinge weight
        rep_band: float = 0.12,        # repulsion standoff vs MEASURED frames (m)
        fuzzy_extra: float = 0.15,     # extra standoff while a pose is unmeasured
        obst_rep_r: float = 0.34,      # obstacle repulsion radius vs NOMINAL (m)
        theta_dot_max: float = 1.5,
        theta_dd_max: float = 4.0,
        slew_max: float = 2.0,         # N/s per motor
        incl_max: float = np.deg2rad(60.0),
        rate_max: float = 10.0,        # rad/s, |p|,|q| bound
        mass: float = MASS,
        table_points: int = 600,
        al_iters: int = 2,
        inner_iters: int = 6,
        warm_al_iters: int = 1,
        warm_inner_iters: int = 3,
        warm_after: int = 8,
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
        # Plan speed profile |v|(theta): converts plan-relative theta_dot to
        # m/s for the reference's speed-bump terms.
        self.path_speed = jnp.asarray(
            np.linalg.norm(self.path_vel, axis=-1), jnp.float32
        )
        self.theta_max = float(self.theta_grid[-1])
        self.gate_thetas = jnp.asarray(np.asarray(gate_thetas, np.float32))
        gates3 = np.asarray(gate_positions, np.float32).reshape(-1, 3)
        self.gate_positions = jnp.asarray(gates3)
        # Frame poses for the repulsion hinge (x, y, yaw, aperture height).
        # The planned path can only guarantee clearance vs NOMINAL poses;
        # levels 2/3 randomize them by +-0.15 m/axis, so the optimizer itself
        # must keep the predicted trajectory ``rep_band`` clear of the
        # best-known frame material (measured pose once the env reveals it in
        # range, nominal + ``fuzzy_extra`` standoff before).  Root cause of
        # the round-3 seed-5 collision and the 1e-6-perturbation crash at
        # gate 0: 5 mm flown clearance with no cost term defending it.
        self.frames0 = (np.asarray(gate_frames, np.float32).reshape(-1, 4)
                        if gate_frames is not None
                        else np.zeros((0, 4), np.float32))
        self.rep_band = float(rep_band)
        self.fuzzy_extra = float(fuzzy_extra)
        self._obst_xy = np.asarray(obstacle_positions, np.float32).reshape(-1, 2)
        self._w_rep = float(w_rep)
        self._obst_rep_r = float(obst_rep_r)

        # Variable contour weight baked into a per-theta table
        # (mpcc_controller.py:536-560): MIN everywhere, +Gaussian kernels of
        # amplitude (MAX-MIN) around each gate (3D) and obstacle (2D).
        w = np.full(p3.shape[0], q_contour_min, np.float32)
        amp = q_contour_max - q_contour_min
        for g in gates3:
            d2 = np.sum((p3 - g[None]) ** 2, axis=-1)
            w += amp * np.exp(-0.5 * d2 / contour_sigma**2)
        for o in np.asarray(obstacle_positions, np.float32).reshape(-1, 2):
            d2 = np.sum((p3[:, :2] - o[None]) ** 2, axis=-1)
            w += amp * np.exp(-0.5 * d2 / contour_sigma**2)
        self.contour_w = jnp.asarray(w)

        self.params = dict(
            q_lag=q_lag, q_body_rate=q_body_rate, mu=mu_progress,
            r_delta=r_delta, r_theta_dd=r_theta_dd,
            speed_bump_k=speed_bump_k, speed_bump_threshold=speed_bump_threshold,
            speed_bump_sigma=speed_bump_sigma,
            theta_dot_max=theta_dot_max, theta_dd_max=theta_dd_max,
            slew_max=slew_max, incl_max=float(incl_max), rate_max=rate_max,
        )
        self.al_iters = al_iters
        self.inner_iters = inner_iters
        # Warm-solve iteration cut: after ``warm_after`` consecutive
        # warm-started solves the shifted (us, mu) pair is already near the
        # new optimum, and 1x3 iterations track it at a quarter of the 2x6
        # cold-solve cost — the dominant share of the 25 Hz control step's
        # wall time (measured ~107 ms/solve on the TPU tunnel, ~90 ms on
        # CPU, for a 20-step horizon).  Both iteration configs are separate
        # jit cache entries compiled once per process.
        self.warm_al_iters = warm_al_iters
        self.warm_inner_iters = warm_inner_iters
        self.warm_after = int(warm_after)
        self._n_solves = 0
        self.hover = mass * GRAVITY_ACC / 4.0
        self.f_min = 0.25 * self.hover   # per-motor thrust floor
        self.f_max = 3.0 * self.hover    # per-motor ceiling (PWM-limit scale)
        self._us_prev = None
        self._mu_prev = None
        # Per-plan data for the SHARED jitted solver (see _mpcc_solve): all
        # arrays and scalars enter as traced arguments so fresh controllers
        # (fresh plans, same shapes) reuse the compiled executable.
        f32 = jnp.float32
        self._tables = dict(
            theta_grid=self.theta_grid,
            path_pos=self.path_pos,
            path_tan=self.path_tan,
            contour_w=self.contour_w,
            path_speed=self.path_speed,
            gate_positions=self.gate_positions,
            obst_xy=jnp.asarray(self._obst_xy),
        )
        self._scal = dict(
            dt=jnp.asarray(self.dt, f32),
            mass=jnp.asarray(self.mass, f32),
            theta_max=jnp.asarray(self.theta_max, f32),
            f_min=jnp.asarray(self.f_min, f32),
            f_max=jnp.asarray(self.f_max, f32),
            w_rep=jnp.asarray(self._w_rep, f32),
            obst_rep_r=jnp.asarray(self._obst_rep_r, f32),
            **{k: jnp.asarray(v, f32) for k, v in self.params.items()},
        )

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

    def tangent_at(self, theta):
        """Host-side unit path tangent at progress ``theta`` (for the stage's
        along-track setpoint tether)."""
        grid = np.asarray(self.theta_grid)
        th = float(np.clip(theta, 0.0, self.theta_max))
        tan = np.asarray(self.path_tan)
        t = np.array([np.interp(th, grid, tan[:, i]) for i in range(3)])
        return t / max(np.linalg.norm(t), 1e-9)

    def _lookup(self, theta):
        th = jnp.clip(theta, 0.0, self.theta_max)
        p = jnp.stack(
            [jnp.interp(th, self.theta_grid, self.path_pos[:, i]) for i in range(3)]
        )
        t = jnp.stack(
            [jnp.interp(th, self.theta_grid, self.path_tan[:, i]) for i in range(3)]
        )
        w = jnp.interp(th, self.theta_grid, self.contour_w)
        spd = jnp.interp(th, self.theta_grid, self.path_speed)
        return p, t / jnp.maximum(jnp.linalg.norm(t), 1e-6), w, spd

    # Extended-state layout.
    _RBF = slice(12, 16)
    _TH = 16
    _THD = 17

    @property
    def n_constraints(self):
        return 18

    def reset(self):
        self._us_prev = None
        self._mu_prev = None
        self._n_solves = 0

    def solve(self, obs, theta, theta_dot, rbf=None, frames=None, bands=None):
        """One MPCC solve.  obs: 12D quad state.  Returns (next reference
        state for FULLSTATE command, planned xs, new theta/theta_dot).

        ``frames``: (G, 4) best-known gate frame poses (x, y, yaw, height)
        for the repulsion hinge — measured where the env has revealed them,
        nominal otherwise.  ``bands``: (G,) per-gate standoff; defaults to
        the unmeasured-pose standoff (rep_band + fuzzy_extra) everywhere."""
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
        if rbf is None:
            rbf = self._us_prev_rbf if self._us_prev is not None else np.full(4, self.hover)
        x0 = jnp.concatenate(
            [jnp.asarray(obs[:12], jnp.float32),
             jnp.asarray(rbf, jnp.float32).reshape(4),
             jnp.asarray([theta, theta_dot], jnp.float32)]
        )
        if self._us_prev is None:
            # Cold start with positive progress acceleration: the all-zero
            # slew trajectory is a saddle the line search cannot leave.
            us_init = jnp.tile(
                jnp.concatenate([jnp.zeros(4), jnp.ones(1)])[None], (self.T, 1)
            )
            mu0 = jnp.zeros((self.T, self.n_constraints), jnp.float32)
        else:
            us_init = jnp.concatenate([self._us_prev[1:], self._us_prev[-1:]], 0)
            mu0 = jnp.concatenate([self._mu_prev[1:], self._mu_prev[-1:]], 0)
        if frames is None:
            frames = self.frames0
        if bands is None:
            bands = np.full(
                self.frames0.shape[0], self.rep_band + self.fuzzy_extra,
                np.float32,
            )
        warm = (self._us_prev is not None
                and self._n_solves >= self.warm_after)
        xs, us, cost, mu = _mpcc_solve(
            self._tables, self._scal, x0, us_init, mu0,
            jnp.asarray(frames, jnp.float32).reshape(-1, 4),
            jnp.asarray(bands, jnp.float32).reshape(-1),
            al_iters=self.warm_al_iters if warm else self.al_iters,
            inner_iters=self.warm_inner_iters if warm else self.inner_iters,
        )
        self._n_solves += 1
        self._us_prev = us
        self._mu_prev = mu
        x_next = np.asarray(xs[1])
        # Carry the rate-bounded thrust state between solves.
        self._us_prev_rbf = x_next[12:16]
        return x_next, np.asarray(xs), float(x_next[self._TH]), float(x_next[self._THD])
