"""Linear MPC.

TPU-native counterpart of the reference's LinearMPC
(safe_control_gym/controllers/mpc/linear_mpc.py): dynamics are the exact
(matrix-exponential) discretization of the model linearized at the hover
equilibrium (X_EQ, U_EQ) (linear_mpc.py:81-108), delta-variable formulation.
With linear dynamics and quadratic cost the AL-iLQR inner solves are exact
LQR steps, so few iterations suffice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.mpc import MPC
from safe_control_gym_tpu.ops.integrators import discretize_linear_system


class LinearMPC(MPC):
    def __init__(self, env, **kwargs):
        # Equilibrium: X_EQ = 0, U_EQ = U_GOAL (quadrotor.py:327-329).
        self._x_eq = jnp.zeros(env.symbolic.nx, jnp.float32)
        self._u_eq_lin = jnp.asarray(env.u_goal, jnp.float32)
        model = env.symbolic
        with jax.enable_x64():
            A, B = model.df_func(
                jnp.zeros(model.nx, jnp.float64),
                jnp.asarray(env.u_goal, jnp.float64),
            )
            Ad, Bd = discretize_linear_system(A, B, model.dt, exact=True)
        self._Ad = jnp.asarray(Ad, jnp.float32)
        self._Bd = jnp.asarray(Bd, jnp.float32)
        super().__init__(env, **kwargs)

    def _make_solver(self):
        # Swap the nonlinear RK4 transition for the frozen linearization
        # (linear_mpc.py:81-108) via an adapter model; reuse the parent solver.
        Ad, Bd, x_eq, u_eq = self._Ad, self._Bd, self._x_eq, self._u_eq_lin

        class _LinModel:
            nx = self.model.nx
            nu = self.model.nu
            dt = self.model.dt

            @staticmethod
            def fd_func(x, u, dt=None):
                return x_eq + Ad @ (x - x_eq) + Bd @ (u - u_eq)

        real_model = self.model
        self.model = _LinModel()
        try:
            return MPC._make_solver(self)
        finally:
            self.model = real_model
