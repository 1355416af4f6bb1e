"""GP-MPC: cautious MPC with learned GP residual dynamics.

TPU-native counterpart of the reference's GPMPC
(safe_control_gym/controllers/mpc/gp_mpc.py): a LinearMPC prior model plus
per-dimension zero-mean SE-ARD GP residuals learned from rollout data
(gp_mpc.py:672-837), with probabilistic constraint tightening from the
propagated GP uncertainty (precompute_probabilistic_limits,
gp_mpc.py:286-358).

Replacements: gpytorch -> ops/gp.py (vmapped exact GPs, Adam on the marginal
likelihood), kmeans inducing points -> jitted Lloyd iterations, the
IPOPT NLP with GP mean dynamics (setup_gp_optimizer, gp_mpc.py:424-577) ->
AL-iLQR on ``fd_prior(x, u) + GP_mean(z)``.  Uncertainty propagation follows
the reference's mean-equivalence approximation: constraint bounds are
tightened by z-score * propagated residual std along the previous solution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.linear_mpc import LinearMPC
from safe_control_gym_tpu.controllers.mpc import MPC
from safe_control_gym_tpu.ops.gp import GPState, gp_fit, gp_predict, kmeans
from safe_control_gym_tpu.ops.trajopt import al_ilqr_solve, ilqr_solve


class GPMPC(MPC):
    def __init__(
        self,
        env,
        horizon: int = 5,
        q_mpc=(1.0,),
        r_mpc=(1.0,),
        prob: float = 0.955,  # constraint satisfaction probability
        num_samples: int = 300,
        num_inducing: int = 64,
        gp_iters: int = 150,
        target_mask=None,  # which state dims get GP residuals
        input_mask=None,  # which (x, u) dims feed the GP
        **kwargs,
    ):
        super().__init__(env, horizon=horizon, q_mpc=q_mpc, r_mpc=r_mpc, **kwargs)
        nx, nu = self.model.nx, self.model.nu
        self.target_mask = np.asarray(target_mask if target_mask is not None else range(nx))
        self.input_mask = np.asarray(input_mask if input_mask is not None else range(nx + nu))
        self.prob = prob
        self.num_samples = num_samples
        self.num_inducing = num_inducing
        self.gp_iters = gp_iters
        # Inverse CDF z-score for the tightening (gp_mpc.py:286-358 uses
        # norm.ppf on per-dim probabilities).
        from math import erf, sqrt

        self.z_score = float(jax.scipy.stats.norm.ppf(prob))
        self.gp_state: GPState | None = None
        # Prior discrete model = frozen linearization at hover (the reference
        # GPMPC extends LinearMPC).
        from safe_control_gym_tpu.ops.integrators import discretize_linear_system

        with jax.enable_x64():
            A, B = self.model.df_func(
                jnp.zeros(nx, jnp.float64), jnp.asarray(env.u_goal, jnp.float64)
            )
            Ad, Bd = discretize_linear_system(A, B, self.model.dt, exact=True)
        self._Ad = jnp.asarray(Ad, jnp.float32)
        self._Bd = jnp.asarray(Bd, jnp.float32)
        self._x_eq = jnp.zeros(nx, jnp.float32)
        self._u_eq2 = jnp.asarray(env.u_goal, jnp.float32)

    # -- prior + residual dynamics ---------------------------------------------
    def _fd_prior(self, x, u):
        return self._x_eq + self._Ad @ (x - self._x_eq) + self._Bd @ (u - self._u_eq2)

    def _fd_gp(self, gp: GPState, x, u):
        z = jnp.concatenate([x, u])[self.input_mask][None]
        mean, _ = gp_predict(gp, z)
        res = jnp.zeros(self.model.nx, x.dtype).at[self.target_mask].set(mean[0])
        return self._fd_prior(x, u) + res

    # -- learning ----------------------------------------------------------------
    def learn(self, num_samples: int | None = None, **kwargs):
        """Collect (x, u) -> residual data with exploratory inputs and fit GPs
        (reference learn(), gp_mpc.py:672-837)."""
        env = self.env
        n = num_samples or self.num_samples
        key = jax.random.key(self.seed)
        state, obs, _ = jax.jit(env.reset)(key)
        step = jax.jit(env.step)
        nx, nu = self.model.nx, self.model.nu
        u_lo = jnp.asarray(env.spaces.action_low, jnp.float32)
        u_hi = jnp.asarray(env.spaces.action_high, jnp.float32)
        xs, us, residuals = [], [], []
        x_prev = jnp.asarray(np.asarray(state.x), jnp.float32)
        for i in range(n):
            k = jax.random.fold_in(key, i)
            # Hover-centred exploration.
            u = jnp.clip(
                self._u_eq2 * (1.0 + 0.2 * jax.random.normal(k, (nu,))), u_lo, u_hi
            )
            state, obs, r, d, info = step(state, u)
            x_next = jnp.asarray(np.asarray(state.x), jnp.float32)
            res = x_next - self._fd_prior(x_prev, u)
            xs.append(np.asarray(x_prev))
            us.append(np.asarray(u))
            residuals.append(np.asarray(res))
            x_prev = x_next
            if bool(d):
                state, obs, _ = jax.jit(env.reset)(jax.random.fold_in(key, 50_000 + i))
                x_prev = jnp.asarray(np.asarray(state.x), jnp.float32)
        Z = np.concatenate([np.stack(xs), np.stack(us)], -1)[:, self.input_mask]
        Y = np.stack(residuals)[:, self.target_mask]
        # Inducing-point subset via k-means (gp_mpc.py FITC path) when the
        # dataset is large; exact GP on the inducing set.
        if Z.shape[0] > self.num_inducing:
            cent = kmeans(jax.random.key(1), jnp.asarray(Z, jnp.float32), self.num_inducing)
            d2 = ((jnp.asarray(Z)[:, None] - cent[None]) ** 2).sum(-1)
            idx = np.unique(np.asarray(d2.argmin(0)))
            Z, Y = Z[idx], Y[idx]
        self.gp_state = gp_fit(
            jnp.asarray(Z, jnp.float32), jnp.asarray(Y, jnp.float32), iters=self.gp_iters
        )
        # Rebuild the solver around the GP-corrected dynamics.
        self._solve = jax.jit(self._make_gp_solver())
        if hasattr(self, "_margins_jit"):
            del self._margins_jit  # stale GP closure
        self._prev_us = None
        self._prev_mu = None
        return {"train_points": Z.shape[0]}

    def _make_gp_solver(self):
        model, T = self.model, self.T
        Q, R, u_eq, P = self.Q, self.R, self.u_eq, self.P_term
        gp = self.gp_state
        cc = self._cc
        tol = self.constraint_tol
        fd = lambda x, u: self._fd_gp(gp, x, u)
        precompute_margins = self._build_margins_fn() if cc is not None else None

        def solve(x0, ref, us_init, mu0):
            def stage_cost(x, u, k):
                dx = x - ref[k]
                du = u - u_eq
                return 0.5 * dx @ Q @ dx + 0.5 * du @ R @ du

            def term_cost(x):
                dx = x - ref[T]
                return 0.5 * dx @ P @ dx

            if cc is None:
                res = ilqr_solve(
                    fd, stage_cost, term_cost, x0, us_init,
                    iters=self.al_iters * self.inner_iters,
                )
                return res.us, res.cost, mu0
            margins = precompute_margins(x0, us_init)
            constraint_fn = lambda x, u, k: (
                cc.get_values_raw(x, u) + tol + margins[k]
            )
            res, mu = al_ilqr_solve(
                fd, stage_cost, term_cost, constraint_fn, x0, us_init,
                al_iters=self.al_iters, inner_iters=self.inner_iters, mu0=mu0,
                stagewise=True,
            )
            return res.us, res.cost, mu

        return solve

    def probabilistic_margins(self, x0, us):
        """Public hook: (T, nc) per-row tightening margins for a candidate
        input sequence (reference precompute_probabilistic_limits surface)."""
        if self.gp_state is None or self._cc is None:
            raise ValueError("learn() first / no constraints")
        if not hasattr(self, "_margins_jit"):
            self._margins_jit = jax.jit(self._build_margins_fn())
        return self._margins_jit(jnp.asarray(x0, jnp.float32), jnp.asarray(us, jnp.float32))

    def _build_margins_fn(self):
        """(T, nc) horizon-propagated tightening margins along a candidate
        rollout (reference precompute_probabilistic_limits, gp_mpc.py:286-358).

        Residual covariance accumulates through the prior closed loop
        Sigma_{k+1} = A_cl Sigma_k A_cl' + Sigma_gp(z_k) with Sigma_0 = 0
        (x0 is measured), so the first node is untightened and margins grow
        along the prediction horizon.  Per-row margins are assembled in the
        STACKED block order of CompiledConstraints.get_values_raw (linear,
        quadratic, symmetric) and permuted by ``row_order`` — writing linear
        margins to output rows 0..nc_lin-1 silently tightens the wrong
        constraints whenever quadratic/symmetric entries interleave.
        Quadratic rows use the gradient at the solve point (|∇(x'Px)| =
        |2Px|); symmetric rows use |F|."""
        from safe_control_gym_tpu.ops.linalg import dlqr_gain

        model = self.model
        gp = self.gp_state
        cc = self._cc
        nx = model.nx
        fd = lambda x, u: self._fd_gp(gp, x, u)
        K_prior, _ = dlqr_gain(self._Ad, self._Bd, self.Q, self.R)
        A_cl = self._Ad - self._Bd @ K_prior
        row_order = jnp.asarray(cc.row_order)
        abs_Ax = jnp.abs(jnp.asarray(cc.A_x, jnp.float32))

        def gp_var_full(x, u):
            z = jnp.concatenate([x, u])[self.input_mask][None]
            _, var = gp_predict(gp, z)
            return jnp.zeros(nx, x.dtype).at[self.target_mask].set(var[0])

        def margins_from_std(std_x, x):
            parts = [abs_Ax @ std_x]
            for q in cc.quadratics:
                if q.on_input:
                    parts.append(jnp.zeros(1, std_x.dtype))
                else:
                    grad = 2.0 * jnp.asarray(q.P, std_x.dtype) @ x
                    parts.append((jnp.abs(grad) @ std_x)[None])
            for s in cc.symmetrics:
                parts.append(jnp.abs(jnp.asarray(s.F, std_x.dtype)) @ std_x)
            return jnp.concatenate(parts)[row_order] * self.z_score

        def margins(x0, us):
            def roll(x, u):
                return fd(x, u), x

            _, xs = jax.lax.scan(roll, x0, us)
            vars_ = jax.vmap(gp_var_full)(xs, us)

            def cov_step(S, v):
                std = jnp.sqrt(jnp.clip(jnp.diag(S), 0.0))
                return A_cl @ S @ A_cl.T + jnp.diag(v), std

            _, stds = jax.lax.scan(cov_step, jnp.zeros((nx, nx), jnp.float32), vars_)
            return jax.vmap(margins_from_std)(stds, xs)

        return margins

    def select_action(self, obs, info=None):
        if self.gp_state is None:
            self.learn()
        return super().select_action(obs, info)
