"""A-priori dynamics model shipped from env to controllers.

TPU-native counterpart of the reference's CasADi ``SymbolicModel``
(safe_control_gym/math_and_models/symbolic_systems.py).  Where the reference
builds CasADi expression graphs and CVODES integrators, this model carries a
closed-form JAX ``fc(x, u)`` and derives everything else with JAX transforms:

  * ``fd_func``       — RK4 discretization (reference uses a CVODES integrator
                        at symbolic_systems.py:70-73; controllers re-discretize
                        with RK4 anyway, mpc_utils.py:79-101);
  * ``df_func``       — continuous-time Jacobians (A, B) via ``jax.jacfwd``
                        (reference setup_linearization, :77-123);
  * ``fd_linear``     — discrete linearization around (x, u);
  * ``loss``          — quadratic cost l(x, u, Xr, Ur, Q, R) and its
                        first/second derivatives (reference :96-123).

All methods are pure and jit/vmap-compatible, so controllers can linearize
along whole batched trajectories in one fused call — the capability CasADi
provided on CPU, re-expressed as XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from safe_control_gym_tpu.ops.integrators import rk4_step


@dataclasses.dataclass(frozen=True)
class DynamicsModel:
    fc_func: Callable  # x' = fc(x, u), continuous-time
    nx: int
    nu: int
    dt: float  # controller sampling time (reference CTRL_TIMESTEP)
    g_func: Callable = None  # y = g(x, u); defaults to identity on x

    def __post_init__(self):
        if self.g_func is None:
            object.__setattr__(self, "g_func", lambda x, u: x)

    @property
    def ny(self) -> int:
        return self.nx

    # -- discretization ------------------------------------------------------
    def fd_func(self, x, u, dt=None):
        """One RK4 step of the continuous dynamics."""
        return rk4_step(self.fc_func, x, u, self.dt if dt is None else dt)

    # -- linearization -------------------------------------------------------
    def df_func(self, x, u):
        """Continuous-time Jacobians (dfdx, dfdu) at (x, u)."""
        A = jax.jacfwd(self.fc_func, argnums=0)(x, u)
        B = jax.jacfwd(self.fc_func, argnums=1)(x, u)
        return A, B

    def dg_func(self, x, u):
        """Observation Jacobians (dgdx, dgdu) at (x, u)."""
        C = jax.jacfwd(self.g_func, argnums=0)(x, u)
        D = jax.jacfwd(self.g_func, argnums=1)(x, u)
        return C, D

    def fc_linear(self, x, u, x_eq, u_eq):
        """Linearized continuous dynamics: fc(x_eq,u_eq) + A dx + B du."""
        A, B = self.df_func(x_eq, u_eq)
        return self.fc_func(x_eq, u_eq) + A @ (x - x_eq) + B @ (u - u_eq)

    def fd_linear_func(self, x_eq, u_eq, dt=None):
        """Discrete-time Jacobians of the RK4 step at (x_eq, u_eq)."""
        dt = self.dt if dt is None else dt
        fd = lambda x, u: rk4_step(self.fc_func, x, u, dt)
        Ad = jax.jacfwd(fd, argnums=0)(x_eq, u_eq)
        Bd = jax.jacfwd(fd, argnums=1)(x_eq, u_eq)
        return Ad, Bd

    # -- quadratic cost ------------------------------------------------------
    @staticmethod
    def loss(x, u, Xr, Ur, Q, R):
        """Quadratic cost and derivatives (reference symbolic_systems.py:96-123).

        Returns dict with l, l_x, l_xx, l_u, l_uu, l_xu — the exact set the
        reference exposes to iLQR/MPC.
        """
        dx = x - Xr
        du = u - Ur
        l = 0.5 * dx @ Q @ dx + 0.5 * du @ R @ du
        return {
            "l": l,
            "l_x": Q @ dx,
            "l_xx": Q,
            "l_u": R @ du,
            "l_uu": R,
            "l_xu": jnp.zeros((Q.shape[0], R.shape[0]), Q.dtype),
        }

    # -- vectorized helpers (no reference analogue: CasADi maps were serial) --
    def batch_linearize(self, xs, us):
        """Jacobians along a trajectory/batch: xs (T, nx), us (T, nu)."""
        return jax.vmap(self.df_func)(xs, us)

    def batch_fd(self, xs, us, dt=None):
        return jax.vmap(lambda x, u: self.fd_func(x, u, dt))(xs, us)
