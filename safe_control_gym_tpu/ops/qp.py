"""Small dense QP solver (OSQP-style ADMM), jit/vmap-compatible.

TPU-native replacement for the reference's qpoases/qrqp solves in the CBF
safety filter (cbf_qp.py:193-304) and for the CVXPY/Mosek dependency surface
(pyproject.toml:25,27): fixed iteration count, fixed shapes, batchable.

    minimize   1/2 u' P u + q' u
    subject to l <= A u <= ub
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_qp(P, q, A, l, ub, iters: int = 200, rho: float = 1.0, sigma: float = 1e-6):
    """ADMM (OSQP splitting).  Returns (u, z, y) — primal, auxiliary, dual."""
    n = q.shape[0]
    m = l.shape[0]
    KKT = P + sigma * jnp.eye(n, dtype=P.dtype) + rho * (A.T @ A)
    KKT_inv = jnp.linalg.inv(KKT)

    def body(carry, _):
        u, z, y = carry
        rhs = sigma * u - q + A.T @ (rho * z - y)
        u_n = KKT_inv @ rhs
        Au = A @ u_n
        z_n = jnp.clip(Au + y / rho, l, ub)
        y_n = y + rho * (Au - z_n)
        return (u_n, z_n, y_n), None

    u0 = jnp.zeros(n, P.dtype)
    z0 = jnp.zeros(m, P.dtype)
    y0 = jnp.zeros(m, P.dtype)
    (u, z, y), _ = jax.lax.scan(body, (u0, z0, y0), None, length=iters)
    return u, z, y


def qp_primal_residual(u, A, l, ub):
    Au = A @ u
    return jnp.maximum(jnp.maximum(l - Au, Au - ub), 0.0).max()
