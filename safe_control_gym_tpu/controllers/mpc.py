"""Nonlinear MPC.

TPU-native counterpart of the reference's MPC
(safe_control_gym/controllers/mpc/mpc.py): RK4-discretized dynamics over a
horizon T, quadratic tracking cost (Q, R from q_mpc/r_mpc diagonals,
mpc.py:68-71), state/input constraints with tolerance (mpc.py:230-258), warm
start by shifting the previous solution (mpc.py:303-310), references sliced
from X_GOAL with terminal repeat (get_references, mpc.py:327-345).

The IPOPT multiple-shooting NLP (mpc.py:259-312) is replaced by a
fixed-iteration augmented-Lagrangian iLQR (ops/trajopt.py): shapes and
iteration counts are static, so one ``select_action`` is a single compiled
XLA program, and ``solve_batch`` runs one MPC instance *per env* in lockstep
under vmap — the TPU-native form of "parallel MPC" the reference cannot
express.  Soft-constraint mode maps to a fixed small penalty weight
(reference: 10000 * slack^2, mpc.py:235-250) instead of AL updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.envs.benchmark import Task
from safe_control_gym_tpu.ops.linalg import get_cost_weight_matrix
from safe_control_gym_tpu.ops.trajopt import al_ilqr_solve, ilqr_solve


class MPC(BaseController):
    def __init__(
        self,
        env,
        horizon: int = 5,
        q_mpc=(1.0,),
        r_mpc=(1.0,),
        warmstart: bool = True,
        soft_constraints: bool = False,
        constraint_tol: float = 1e-6,
        al_iters: int = 3,
        inner_iters: int = 6,
        soft_penalty: float = 10000.0,
        terminal_lqr_cost: bool = False,
        **kwargs,
    ):
        super().__init__(env, **kwargs)
        self.model = env.symbolic
        self.T = horizon
        self.dt = self.model.dt
        nx, nu = self.model.nx, self.model.nu
        self.Q = jnp.asarray(get_cost_weight_matrix(list(q_mpc), nx), jnp.float32)
        self.R = jnp.asarray(get_cost_weight_matrix(list(r_mpc), nu), jnp.float32)
        self.warmstart = warmstart
        self.soft_constraints = soft_constraints
        self.constraint_tol = constraint_tol
        self.al_iters = al_iters
        self.inner_iters = inner_iters
        self.soft_penalty = soft_penalty
        self.task = Task(env.config.task)
        self.u_eq = jnp.asarray(env.u_goal, jnp.float32)
        self.traj = jnp.asarray(
            env.x_goal if env.x_goal.ndim == 2 else np.tile(env.x_goal, (1, 1)),
            jnp.float32,
        )  # (N, nx)
        self.traj_step = 0
        self._prev_us = None
        self._prev_mu = None

        # Constraint program from the env (compiled form replaces the
        # reference's symbolic constraint re-wrap, mpc.py:83-96).
        self._cc = getattr(env, "constraints", None)
        from safe_control_gym_tpu.envs.constraints import build_constraints

        self._cc = build_constraints(env.config.constraints, env.spaces)

        # Exact input-box bounds extracted from the constraint program: the
        # applied (first) action is projected onto them, matching IPOPT's
        # exact input-bound feasibility (AL satisfies them approximately).
        self._u_lo, self._u_hi = self._input_box_bounds()

        # Optional infinite-horizon terminal cost: P from the DARE at the
        # goal — removes the finite-horizon myopia of a plain Q terminal
        # (an improvement the reference lacks; off by default for parity).
        self.P_term = self.Q
        if terminal_lqr_cost:
            from safe_control_gym_tpu.ops.integrators import discretize_linear_system
            from safe_control_gym_tpu.ops.linalg import solve_discrete_are

            x_ref0 = self.traj[0]
            A, B = self.model.df_func(x_ref0, self.u_eq)
            Ad, Bd = discretize_linear_system(A, B, self.dt)
            self.P_term = solve_discrete_are(Ad, Bd, self.Q, self.R)

        self._solve = jax.jit(self._make_solver())

    def _make_solver(self):
        model, T = self.model, self.T
        Q, R, u_eq, P = self.Q, self.R, self.u_eq, self.P_term
        tol = self.constraint_tol
        cc = self._cc

        fd = lambda x, u: model.fd_func(x, u)

        if cc is not None:
            # Raw (unrounded) values: the solver needs constraint gradients.
            constraint_fn = lambda x, u: cc.get_values_raw(x, u) + tol
        else:
            constraint_fn = None

        def solve(x0, ref, us_init, mu0):
            """ref: (T+1, nx) goal states; us_init: (T, nu); mu0: (T, nc)
            warm-started AL multipliers (zeros on the first solve)."""

            def stage_cost(x, u, k):
                dx = x - ref[k]
                du = u - u_eq
                return 0.5 * dx @ Q @ dx + 0.5 * du @ R @ du

            def term_cost(x):
                dx = x - ref[T]
                return 0.5 * dx @ P @ dx

            if constraint_fn is None:
                res = ilqr_solve(
                    fd, stage_cost, term_cost, x0, us_init,
                    iters=self.al_iters * self.inner_iters,
                )
                mu = mu0
            elif self.soft_constraints:
                def stage_soft(x, u, k):
                    c = constraint_fn(x, u)
                    s = jnp.maximum(0.0, c)
                    return stage_cost(x, u, k) + self.soft_penalty * jnp.sum(s**2)

                res = ilqr_solve(
                    fd, stage_soft, term_cost, x0, us_init,
                    iters=self.al_iters * self.inner_iters,
                )
                mu = mu0
            else:
                res, mu = al_ilqr_solve(
                    fd, stage_cost, term_cost, constraint_fn, x0, us_init,
                    al_iters=self.al_iters, inner_iters=self.inner_iters,
                    mu0=mu0,
                )
            return res.us, res.cost, mu

        return solve

    def get_references(self, step: int):
        """Horizon slice of the goal trajectory (mpc.py:327-345)."""
        if self.task == Task.STABILIZATION:
            return jnp.tile(self.traj[0][None], (self.T + 1, 1))
        idx = np.clip(np.arange(step, step + self.T + 1), 0, self.traj.shape[0] - 1)
        return self.traj[idx]

    def _input_box_bounds(self):
        nu = self.model.nu
        lo = np.full(nu, -np.inf)
        hi = np.full(nu, np.inf)
        cc = self._cc
        if cc is not None:
            for i in range(cc.A_u.shape[0]):
                if np.any(cc.A_x[i] != 0):
                    continue
                nz = np.nonzero(cc.A_u[i])[0]
                if nz.size != 1:
                    continue
                a, b = cc.A_u[i, nz[0]], cc.b[i]
                if a > 0:
                    hi[nz[0]] = min(hi[nz[0]], b / a)
                else:
                    lo[nz[0]] = max(lo[nz[0]], b / a)
        return jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)

    def _mu_zeros(self):
        nc = self._cc.num_constraints if self._cc is not None else 1
        return jnp.zeros((self.T, nc), jnp.float32)

    def reset(self):
        self.traj_step = 0
        self._prev_us = None
        self._prev_mu = None

    def select_action(self, obs, info=None):
        nx, nu = self.model.nx, self.model.nu
        x0 = jnp.asarray(obs, jnp.float32)[:nx]
        ref = self.get_references(self.traj_step)
        if self._prev_us is None or not self.warmstart:
            us_init = jnp.tile(self.u_eq[None], (self.T, 1))
            mu0 = self._mu_zeros()
        else:
            # Shift previous solution and multipliers (mpc.py:303-310).
            us_init = jnp.concatenate([self._prev_us[1:], self._prev_us[-1:]], 0)
            mu0 = jnp.concatenate([self._prev_mu[1:], self._prev_mu[-1:]], 0)
        us, cost, mu = self._solve(x0, ref, us_init, mu0)
        self._prev_us = us
        self._prev_mu = mu if mu is not None else self._mu_zeros()
        self.traj_step += 1
        return np.asarray(jnp.clip(us[0], self._u_lo, self._u_hi))

    def solve_batch(self, x0s, step: int = 0):
        """Solve a batch of MPC problems in lockstep (vmapped AL-iLQR)."""
        ref = self.get_references(step)
        us_init = jnp.tile(self.u_eq[None], (self.T, 1))
        mu0 = self._mu_zeros()
        us, costs, _ = jax.vmap(lambda x: self._solve(x, ref, us_init, mu0))(x0s)
        return us, costs

    def _policy(self, obs):
        x0 = jnp.asarray(obs)[: self.model.nx]
        ref = self.get_references(0)
        us, _, _ = self._solve(
            x0, ref, jnp.tile(self.u_eq[None], (self.T, 1)), self._mu_zeros()
        )
        return us[0]

    def run(self, num_episodes: int = 1, max_steps: int | None = None, seed: int = 0,
            analysis: bool = False, plot: bool = False, plot_dir: str = "."):
        """Sequential evaluation with per-solve wall time.

        Mirrors the reference MPC.run() results_dict (mpc.py:366-466):
        warm-started solves in a host loop, ``t_wall`` recording each solve's
        wall-clock (the reference stores IPOPT's t_wall_total, mpc.py:318),
        goal/state/input stacks, and state RMSE.  For batched lockstep
        throughput use ``solve_batch`` / the base class scan runner."""
        import time as _time

        env = self.env
        results = {"obs": [], "action": [], "reward": [], "done": [],
                   "t_wall": [], "ep_returns": []}
        step1 = jax.jit(env.step)
        reset1 = jax.jit(env.reset)
        T_max = max_steps or env.max_episode_steps
        for ep in range(num_episodes):
            self.reset()
            state, obs, _ = reset1(jax.random.fold_in(jax.random.key(seed), ep))
            ep_ret = 0.0
            for t in range(T_max):
                t0 = _time.perf_counter()
                act = self.select_action(np.asarray(obs))
                jax.device_get(act)  # honest solve barrier
                results["t_wall"].append(_time.perf_counter() - t0)
                results["obs"].append(np.asarray(obs))
                results["action"].append(np.asarray(act))
                state, obs, rew, done, info = step1(state, jnp.asarray(act))
                rew = float(rew)
                ep_ret += rew
                results["reward"].append(rew)
                results["done"].append(bool(done))
                if bool(done):
                    break
            results["ep_returns"].append(ep_ret)
        for k in ("obs", "action", "reward", "done", "t_wall", "ep_returns"):
            results[k] = np.asarray(results[k])
        if analysis:
            from safe_control_gym_tpu.utils.plotting import post_analysis

            n = results["obs"].shape[0]
            ref_traj = np.asarray(self.traj)
            if self.task == Task.STABILIZATION:
                goal = np.tile(ref_traj[0][None], (n, 1))
            else:
                goal = ref_traj[np.clip(np.arange(n), 0, ref_traj.shape[0] - 1)]
            results["analysis"] = post_analysis(
                goal, results["obs"][:, : self.model.nx], results["action"],
                env=env, plot=plot, save_plot=plot, plot_dir=plot_dir,
            )
        return results
