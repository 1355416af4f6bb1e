"""CBF-QP safety filter with learned Lie-derivative residual.

TPU-native counterpart of the reference's CBF_QP
(safe_control_gym/controllers/cbf/cbf_qp.py + cbf_qp_utils.py):

  * ellipsoidal barrier candidate h(x) = 0.5 (1 - x^2/x_max^2 -
    x_dot^2/v_max^2) (cbf_cartpole, cbf_qp_utils.py:10-35);
  * Lie derivative L_f h = grad h . f(x, u) via jax.grad (replaces
    cs.gradient, cbf_qp.py:99-106), control-affinity exploited to express
    the CBF condition as a linear constraint in u;
  * learned residual: MLP(x) -> (a, b) with residual = a'u + b, trained on
    the gap between finite-difference and nominal-model barrier derivatives
    (cbf_qp.py:380-483);
  * certify_action: min ||u - u_des||^2 s.t. L_f h + residual >= -gamma h
    and input bounds — a 3-5 variable QP solved with fixed-iteration ADMM
    (replaces qpoases, cbf_qp.py:193-304), optionally slack-softened;
  * is_cbf: vmapped grid verification over the state box — corners of the
    input box certify feasibility since the condition is linear in u
    (cbf_qp.py:115-192's grid loop, evaluated in one batched call).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.models.networks import MLP
from safe_control_gym_tpu.ops.qp import solve_qp


class CBF_QP(BaseController):
    def __init__(
        self,
        env,
        slope: float = 0.1,
        soft_constrained: bool = True,
        slack_weight: float = 10000.0,
        slack_tolerance: float = 1e-3,
        x_max_scale: float = 1.0,
        barrier_dims=None,
        barrier_bounds=None,
        hidden_dim: int = 64,
        learning_rate: float = 1e-3,
        max_buffer_size: int = 1_000_000,
        train_batch_size: int = 64,
        **kwargs,
    ):
        super().__init__(env, **kwargs)
        self.model = env.symbolic
        nx, nu = self.model.nx, self.model.nu
        self.nu = nu
        self.slope = slope
        self.soft_constrained = soft_constrained
        self.slack_weight = slack_weight
        self.slack_tolerance = slack_tolerance
        self.u_lo = jnp.asarray(env.spaces.action_low, jnp.float32)
        self.u_hi = jnp.asarray(env.spaces.action_high, jnp.float32)
        # Barrier semi-axes from the env state box (cbf.py wires
        # x_pos_max/x_vel_max from the config).
        lows = np.asarray(env.spaces.state_low)
        self.x_max = float(min(abs(lows[0]), 100.0)) * x_max_scale
        self.v_max = float(2.0) * x_max_scale  # velocity box is unbounded; use 2 m/s
        # General ellipsoidal barrier over arbitrary state dims:
        # h(x) = 0.5 (1 - sum_i x[d_i]^2 / b_i^2).  Defaults reproduce the
        # reference's 2D cartpole barrier over (x, x_dot)
        # (cbf_qp_utils.py:10-40); pass barrier_dims/bounds for higher-dim
        # safe sets (e.g. quadrotor position+velocity tubes).
        if barrier_dims is None:
            barrier_dims = (0, 1)
            barrier_bounds = (self.x_max, self.v_max)
        assert barrier_bounds is not None and len(barrier_bounds) == len(barrier_dims)
        self.barrier_dims = tuple(int(d) for d in barrier_dims)
        self.barrier_bounds = tuple(float(b) for b in barrier_bounds)

        # Residual model: state -> (a (nu,), b).
        self.mlp = MLP(nu + 1, (hidden_dim, hidden_dim), act="relu")
        k1, self._key = jax.random.split(jax.random.key(self.seed))
        self.mlp_params = self.mlp.init(k1, jnp.zeros((1, nx)))
        self.opt = optax.adam(learning_rate)
        self.opt_state = self.opt.init(self.mlp_params)
        self.train_batch_size = train_batch_size
        self._buf_x, self._buf_u, self._buf_target = [], [], []

        self._certify = jax.jit(self._make_certify())

    # -- barrier and derivatives ---------------------------------------------
    def barrier(self, x):
        """h(x) >= 0 inside the safe set (cbf_qp_utils.py:33-34), generalized
        to an ellipsoid over ``barrier_dims``."""
        q = sum(
            x[d] ** 2 / b**2 for d, b in zip(self.barrier_dims, self.barrier_bounds)
        )
        return 0.5 * (1.0 - q)

    def lie_derivative_coeffs(self, x):
        """L_f h(x, u) is affine in u: returns (c0, c1) with L = c0 + c1'u."""
        dh = jax.grad(self.barrier)(x)
        f0 = self.model.fc_func(x, jnp.zeros(self.nu, x.dtype))
        Bx = jax.jacfwd(lambda u: self.model.fc_func(x, u))(jnp.zeros(self.nu, x.dtype))
        return dh @ f0, dh @ Bx

    def _make_certify(self):
        nu = self.nu

        def certify(params, x, u_des):
            c0, c1 = self.lie_derivative_coeffs(x)
            h = self.barrier(x)
            ab = self.mlp.apply(params, x)
            a, b = ab[:nu], ab[nu]
            # Constraint: c0 + c1'u + a'u + b + slope*h >= 0.
            w = c1 + a
            d = -(c0 + b + self.slope * h)
            if self.soft_constrained:
                # Variables [u; s]: min 1/2||u-u_des||^2 + w_s s^2,
                # s.t. w'u + s >= d, s >= 0, box on u.
                P = jnp.zeros((nu + 1, nu + 1))
                P = P.at[:nu, :nu].set(jnp.eye(nu))
                P = P.at[nu, nu].set(2 * self.slack_weight)
                q = jnp.concatenate([-u_des, jnp.zeros(1)])
                A = jnp.zeros((nu + 2, nu + 1))
                A = A.at[0, :nu].set(w)
                A = A.at[0, nu].set(1.0)
                A = A.at[1, nu].set(1.0)
                A = A.at[2:, :nu].set(jnp.eye(nu))
                l = jnp.concatenate([jnp.stack([d, 0.0]), self.u_lo])
                ub = jnp.concatenate([jnp.full(2, 1e8), self.u_hi])
                sol, _, _ = solve_qp(P, q, A, l, ub)
                return sol[:nu], sol[nu]
            P = jnp.eye(nu)
            q = -u_des
            A = jnp.concatenate([w[None], jnp.eye(nu)], 0)
            l = jnp.concatenate([d[None], self.u_lo])
            ub = jnp.concatenate([jnp.full(1, 1e8), self.u_hi])
            sol, _, _ = solve_qp(P, q, A, l, ub)
            return sol, jnp.zeros(())

        return certify

    # -- reference API ---------------------------------------------------------
    def certify_action(self, current_state, unsafe_action, use_learned_model=True):
        params = self.mlp_params if use_learned_model else jax.tree.map(
            jnp.zeros_like, self.mlp_params
        )
        u, slack = self._certify(
            params, jnp.asarray(current_state, jnp.float32)[: self.model.nx],
            jnp.asarray(unsafe_action, jnp.float32),
        )
        success = bool(slack <= self.slack_tolerance)
        return np.asarray(u), success

    def is_cbf(self, num_points: int = 10, tolerance: float = 0.0):
        """Grid verification (cbf_qp.py:115-192), one batched evaluation.

        The CBF condition sup_u [L_f h + slope*h] >= 0 is linear in u, so the
        supremum over the input box is attained at a corner.
        """
        nx, nu = self.model.nx, self.nu
        axes = [np.zeros(1)] * nx
        for d, b in zip(self.barrier_dims, self.barrier_bounds):
            axes[d] = np.linspace(-b - tolerance, b + tolerance, num_points)
        grid = np.stack([g.ravel() for g in np.meshgrid(*axes)], -1).astype(np.float32)
        corners = jnp.asarray(
            np.stack([c for c in itertools.product(*zip(np.asarray(self.u_lo), np.asarray(self.u_hi)))]),
            jnp.float32,
        )  # (2^nu, nu)

        def check(x):
            c0, c1 = self.lie_derivative_coeffs(x)
            h = self.barrier(x)
            vals = c0 + corners @ c1 + self.slope * h
            inside = h >= 0
            return jnp.where(inside, vals.max() >= 0, True)

        ok = np.asarray(jax.jit(jax.vmap(check))(jnp.asarray(grid)))
        infeasible = grid[~ok]
        return bool(ok.all()), infeasible

    def learn(self, env=None, max_samples: int = 2000, epochs: int = 50, **kwargs):
        """Collect transitions and fit the Lie-derivative residual
        (cbf_qp.py:380-483): target = (h(x') - h(x))/dt - L_f h_nominal."""
        env = env or self.env
        key = jax.random.key(self.seed)
        state, obs, _ = jax.jit(env.reset)(key)
        step = jax.jit(env.step)
        dt = env.ctrl_timestep
        xs, us, targets = [], [], []
        x_prev = np.asarray(state.x)
        for i in range(max_samples):
            u = np.asarray(
                jax.random.uniform(
                    jax.random.fold_in(key, i), (self.nu,),
                    minval=self.u_lo, maxval=self.u_hi,
                )
            )
            state, obs, r, d, info = step(state, jnp.asarray(u))
            x_next = np.asarray(state.x)
            h_dot_emp = (
                float(self.barrier(jnp.asarray(x_next)))
                - float(self.barrier(jnp.asarray(x_prev)))
            ) / dt
            c0, c1 = self.lie_derivative_coeffs(jnp.asarray(x_prev))
            h_dot_nom = float(c0 + c1 @ jnp.asarray(u))
            xs.append(x_prev)
            us.append(u)
            targets.append(h_dot_emp - h_dot_nom)
            x_prev = x_next
            if bool(d):
                state, obs, _ = jax.jit(env.reset)(jax.random.fold_in(key, 10_000 + i))
                x_prev = np.asarray(state.x)
        X = jnp.asarray(np.stack(xs), jnp.float32)
        U = jnp.asarray(np.stack(us), jnp.float32)
        Y = jnp.asarray(np.asarray(targets), jnp.float32)

        @jax.jit
        def train_epoch(params, opt_state):
            def loss_fn(p):
                ab = self.mlp.apply(p, X)
                pred = (ab[:, : self.nu] * U).sum(-1) + ab[:, self.nu]
                return ((pred - Y) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        loss = None
        for _ in range(epochs):
            self.mlp_params, self.opt_state, loss = train_epoch(self.mlp_params, self.opt_state)
        return {"residual_loss": float(loss)}

    def select_action(self, obs, info=None):
        """Filter the unsafe controller's action; default unsafe = zeros."""
        u_des = np.zeros(self.nu) if info is None else np.asarray(info.get("unsafe_action", np.zeros(self.nu)))
        u, _ = self.certify_action(np.asarray(obs), u_des)
        return u
