"""Explicit integrators for closed-form dynamics.

TPU-native counterpart of the reference's CasADi CVODES integrator
(math_and_models/symbolic_systems.py:63-75) and the RK4 discretization used by
its MPC stack (controllers/mpc/mpc_utils.py:79-101).  The op ordering of
``rk4_step`` mirrors ``rk_discrete`` exactly (k1..k4, x + dt/6*(k1+2k2+2k3+k4))
so that fixed-seed trajectories can be checked bitwise against a NumPy oracle
implementing the same expression.
"""

import jax
import jax.numpy as jnp


def rk4_step(f, x, u, dt):
    """One classical Runge-Kutta-4 step of ``x' = f(x, u)``.

    Matches reference mpc_utils.py:79-101 term-for-term.
    """
    k1 = f(x, u)
    k2 = f(x + dt / 2 * k1, u)
    k3 = f(x + dt / 2 * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def euler_step(f, x, u, dt):
    """One explicit-Euler step (reference BaseAviary Physics.DYN mode,
    base_aviary.py:522-576 integrates with explicit Euler)."""
    return x + dt * f(x, u)


def substeps(step_fn, f, x, u, dt, n):
    """Integrate ``n`` fixed substeps with a constant input ``u``.

    Replaces the reference's inner PyBullet loop
    (``for _ in range(PYB_STEPS_PER_CTRL): p.stepSimulation()``,
    base_aviary.py:266-322).  ``n`` must be a Python int (static under jit);
    small counts are unrolled which lets XLA fuse the whole control step.
    """
    if n <= 8:
        for _ in range(n):
            x = step_fn(f, x, u, dt)
        return x
    body = lambda carry, _: (step_fn(f, carry, u, dt), None)
    x, _ = jax.lax.scan(body, x, None, length=n)
    return x


def discretize(f, dt, method="rk4"):
    """Return a discrete-time transition ``fd(x, u) -> x_next``."""
    if method == "rk4":
        return lambda x, u: rk4_step(f, x, u, dt)
    if method == "euler":
        return lambda x, u: euler_step(f, x, u, dt)
    raise ValueError(f"unknown integrator {method!r}")


def discretize_linear_system(A, B, dt, exact=False):
    """Discretize ``dx/dt = Ax + Bu`` (reference mpc_utils.py:24-56).

    ``exact=True`` uses the matrix exponential of the stacked [[A, B], [0, 0]]
    block (same construction as the reference); otherwise forward Euler.
    """
    n, m = A.shape[0], B.shape[1]
    if exact:
        M = jnp.zeros((n + m, n + m), dtype=A.dtype)
        M = M.at[:n, :n].set(A)
        M = M.at[:n, n:].set(B)
        Md = jax.scipy.linalg.expm(M * dt)
        return Md[:n, :n], Md[:n, n:]
    return jnp.eye(n, dtype=A.dtype) + A * dt, B * dt
