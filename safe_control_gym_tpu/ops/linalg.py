"""Control linear algebra: Riccati solvers and LQR gains, jit-compatible.

TPU-native replacement for the reference's scipy calls
(``scipy.linalg.solve_discrete_are`` in lqr_utils.py:18-37 and
mpc_utils.py:58-77, ``solve_continuous_are`` in lqr_utils.py:33-35): both
AREs are solved with fixed-iteration matrix recursions that compile under
``jit`` and batch under ``vmap`` — so a tracking controller can solve one
Riccati equation *per waypoint in parallel*, something the scipy path cannot.

  * DARE: structured doubling algorithm (SDA), quadratic convergence,
    ~25 iterations to machine precision for well-posed problems.
  * CARE: matrix sign-function Newton iteration with determinant scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_discrete_are(A, B, Q, R, iters: int = 30):
    """Solve A'PA - P - A'PB(R + B'PB)^-1 B'PA + Q = 0 via SDA."""
    Rinv = jnp.linalg.inv(R)
    G = B @ Rinv @ B.T
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = jnp.linalg.inv(I + Gk @ Hk)
        AW = Ak @ W
        A1 = AW @ Ak
        G1 = Gk + AW @ Gk @ Ak.T
        H1 = Hk + Ak.T @ Hk @ W @ Ak
        return (A1, G1, H1), None

    (_, _, H), _ = jax.lax.scan(body, (A, G, Q), None, length=iters)
    return H


def solve_continuous_are(A, B, Q, R, iters: int = 40):
    """Solve A'P + PA - PB R^-1 B'P + Q = 0 via the matrix sign function.

    sign(H) of the Hamiltonian H = [[A, -G], [-Q, -A']] yields P from the
    invariant subspace: [U11; U21] with P = -solve([U12; U22+I] system).
    Newton iteration Z <- (Z/c + c Z^-1)/2 with determinant scaling c.
    """
    n = A.shape[0]
    Rinv = jnp.linalg.inv(R)
    G = B @ Rinv @ B.T
    H = jnp.block([[A, -G], [-Q, -A.T]])

    def body(Z, _):
        det = jnp.linalg.det(Z)
        c = jnp.abs(det) ** (-1.0 / (2 * n))
        Zn = 0.5 * (c * Z + jnp.linalg.inv(Z) / c)
        return Zn, None

    S, _ = jax.lax.scan(body, H, None, length=iters)
    # Stable subspace of H has sign -1: S [x; Px] = -[x; Px] for all x, so
    # S12 P = -(S11 + I) and (S22 + I) P = -S21 (Roberts' method); solve the
    # stacked overdetermined system in least squares.
    I = jnp.eye(n, dtype=A.dtype)
    S11, S12 = S[:n, :n], S[:n, n:]
    S21, S22 = S[n:, :n], S[n:, n:]
    M = jnp.concatenate([S12, S22 + I], 0)  # (2n, n)
    rhs = -jnp.concatenate([S11 + I, S21], 0)  # (2n, n)
    P, *_ = jnp.linalg.lstsq(M, rhs)
    return 0.5 * (P + P.T)


def dlqr_gain(A, B, Q, R):
    """Discrete LQR gain K with u = -K x (lqr_utils.py:25-31)."""
    P = solve_discrete_are(A, B, Q, R)
    BtP = B.T @ P
    K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
    return K, P


def clqr_gain(A, B, Q, R):
    """Continuous LQR gain K = R^-1 B'P (lqr_utils.py:33-36)."""
    P = solve_continuous_are(A, B, Q, R)
    K = jnp.linalg.solve(R, B.T @ P)
    return K, P


def get_cost_weight_matrix(weights, dim):
    """Diagonal weight matrix from scalar/list (mpc_utils.py:9-21)."""
    import numpy as np

    w = np.asarray(weights, dtype=float).reshape(-1)
    if w.size == 1:
        w = np.full(dim, w[0])
    assert w.size == dim, "Wrong dimension for cost weights."
    return np.diag(w)
