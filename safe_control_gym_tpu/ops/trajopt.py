"""Fixed-iteration trajectory optimization (iLQR / AL-iLQR) under jit.

TPU-native replacement for the reference's CasADi+IPOPT NLP solves
(controllers/mpc/mpc.py:188-325 ``cs.Opti`` multiple shooting).  Interior
point solvers have no TPU analogue (dynamic pivoting, data-dependent
iteration counts); instead MPC-class problems are solved with:

  * an iLQR inner solver (DDP backward pass with Levenberg regularization,
    parallel line search over a fixed set of step sizes), and
  * an augmented-Lagrangian outer loop for the inequality constraints
    g(x, u) <= 0 (PHR multiplier updates) — the reference's "soft
    constraints" slack penalty (mpc.py:230-250) generalized.

Everything is fixed-shape / fixed-iteration: one ``solve`` call is a single
XLA program; wrapped in ``vmap`` it solves a *batch* of MPC problems (e.g.
one per env) in lockstep, which the IPOPT path fundamentally cannot.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ILQRResult(NamedTuple):
    xs: jnp.ndarray  # (T+1, nx)
    us: jnp.ndarray  # (T, nu)
    cost: jnp.ndarray  # scalar
    lamb: jnp.ndarray  # final regularizer


def _derivs(stage_cost, term_cost, fd, xs, us):
    """All cost/dynamics derivatives along a trajectory, batched."""
    T = us.shape[0]
    ks = jnp.arange(T)
    lx = jax.vmap(jax.grad(stage_cost, 0))(xs[:-1], us, ks)
    lu = jax.vmap(jax.grad(stage_cost, 1))(xs[:-1], us, ks)
    lxx = jax.vmap(jax.hessian(stage_cost, 0))(xs[:-1], us, ks)
    luu = jax.vmap(jax.hessian(stage_cost, 1))(xs[:-1], us, ks)
    lux = jax.vmap(jax.jacfwd(jax.grad(stage_cost, 1), 0))(xs[:-1], us, ks)
    A = jax.vmap(jax.jacfwd(fd, 0))(xs[:-1], us)
    B = jax.vmap(jax.jacfwd(fd, 1))(xs[:-1], us)
    vx = jax.grad(term_cost)(xs[-1])
    vxx = jax.hessian(term_cost)(xs[-1])
    return lx, lu, lxx, luu, lux, A, B, vx, vxx


def _backward(lx, lu, lxx, luu, lux, A, B, vx, vxx, lamb):
    nu = lu.shape[-1]
    I_u = jnp.eye(nu, dtype=lu.dtype)

    def body(carry, inp):
        Vx, Vxx = carry
        lx_k, lu_k, lxx_k, luu_k, lux_k, A_k, B_k = inp
        Qx = lx_k + A_k.T @ Vx
        Qu = lu_k + B_k.T @ Vx
        Qxx = lxx_k + A_k.T @ Vxx @ A_k
        Quu = luu_k + B_k.T @ Vxx @ B_k
        Qux = lux_k + B_k.T @ Vxx @ A_k
        Quu_reg = 0.5 * (Quu + Quu.T) + lamb * I_u
        # Solve instead of inverting; Levenberg reg keeps it PD.
        k_ff = -jnp.linalg.solve(Quu_reg, Qu)
        K = -jnp.linalg.solve(Quu_reg, Qux)
        Vx_n = Qx + K.T @ Quu @ k_ff + K.T @ Qu + Qux.T @ k_ff
        Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        dv = Qu @ k_ff
        return (Vx_n, Vxx_n), (k_ff, K, dv)

    (_, _), (k_ff, K, dv) = jax.lax.scan(
        body, (vx, vxx), (lx, lu, lxx, luu, lux, A, B), reverse=True
    )
    return k_ff, K, dv


def _rollout_policy(fd, x0, xs_ref, us_ref, k_ff, K, alpha):
    def body(x, inp):
        x_ref, u_ref, kf, Kf = inp
        u = u_ref + alpha * kf + Kf @ (x - x_ref)
        return fd(x, u), (x, u)

    xT, (xs, us) = jax.lax.scan(body, x0, (xs_ref[:-1], us_ref, k_ff, K))
    return jnp.concatenate([xs, xT[None]], 0), us


def _total_cost(stage_cost, term_cost, xs, us):
    ks = jnp.arange(us.shape[0])
    return jax.vmap(stage_cost)(xs[:-1], us, ks).sum() + term_cost(xs[-1])


def ilqr_solve(
    fd: Callable,
    stage_cost: Callable,  # (x, u, k) -> scalar
    term_cost: Callable,  # (x,) -> scalar
    x0: jnp.ndarray,
    us_init: jnp.ndarray,
    iters: int = 10,
    alphas=(1.0, 0.5, 0.25, 0.1, 0.03),
    lamb_init: float = 1.0,
    lamb_factor: float = 10.0,
) -> ILQRResult:
    """Fixed-iteration iLQR with parallel line search.

    Each iteration: derivatives (vmapped), backward pass (reversed scan),
    forward rollouts at all ``alphas`` in parallel (vmap), accept the best
    improving candidate, adapt the Levenberg regularizer.
    """
    alphas = jnp.asarray(alphas, x0.dtype)

    def rollout_open(x0, us):
        def body(x, u):
            return fd(x, u), x

        xT, xs = jax.lax.scan(body, x0, us)
        return jnp.concatenate([xs, xT[None]], 0)

    xs0 = rollout_open(x0, us_init)
    cost0 = _total_cost(stage_cost, term_cost, xs0, us_init)

    def iteration(carry, _):
        xs, us, cost, lamb = carry
        lx, lu, lxx, luu, lux, A, B, vx, vxx = _derivs(stage_cost, term_cost, fd, xs, us)
        k_ff, K, _ = _backward(lx, lu, lxx, luu, lux, A, B, vx, vxx, lamb)

        def try_alpha(a):
            xs_n, us_n = _rollout_policy(fd, x0, xs, us, k_ff, K, a)
            c = _total_cost(stage_cost, term_cost, xs_n, us_n)
            return xs_n, us_n, jnp.where(jnp.isfinite(c), c, jnp.inf)

        xs_c, us_c, costs_c = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(costs_c)
        improved = costs_c[best] < cost
        xs_n = jnp.where(improved, xs_c[best], xs)
        us_n = jnp.where(improved, us_c[best], us)
        cost_n = jnp.where(improved, costs_c[best], cost)
        lamb_n = jnp.where(improved, jnp.maximum(lamb / lamb_factor, 1e-6), lamb * lamb_factor)
        return (xs_n, us_n, cost_n, lamb_n), None

    (xs, us, cost, lamb), _ = jax.lax.scan(
        iteration, (xs0, us_init, cost0, jnp.asarray(lamb_init, x0.dtype)), None, length=iters
    )
    return ILQRResult(xs, us, cost, lamb)


def al_ilqr_solve(
    fd: Callable,
    stage_cost: Callable,  # (x, u, k) -> scalar (unconstrained part)
    term_cost: Callable,
    constraint_fn: Optional[Callable],  # (x, u) -> (nc,) with g <= 0
    x0: jnp.ndarray,
    us_init: jnp.ndarray,
    al_iters: int = 3,
    inner_iters: int = 6,
    rho_init: float = 50.0,
    rho_factor: float = 10.0,
    mu0: Optional[jnp.ndarray] = None,
    stagewise: bool = False,
):
    """Augmented-Lagrangian iLQR for inequality-constrained MPC.

    PHR penalty: phi(c) = (rho/2) * max(0, mu/rho + c)^2 - mu^2/(2 rho),
    multipliers mu <- max(0, mu + rho c) after each inner solve.  ``mu0``
    warm-starts the multipliers (an MPC shifts the previous solve's
    multipliers, like it shifts the input trajectory).

    With ``stagewise=True`` the constraint takes (x, u, k) — for
    stage-dependent bounds such as GP-MPC's horizon-propagated probabilistic
    tightening (reference gp_mpc.py:286-358 tightens each node differently).

    Returns (ILQRResult, mu_final).
    """
    if constraint_fn is None:
        res = ilqr_solve(fd, stage_cost, term_cost, x0, us_init, iters=al_iters * inner_iters)
        return res, None

    cfn = constraint_fn if stagewise else (lambda x, u, k: constraint_fn(x, u))
    nc = cfn(x0, us_init[0], 0).shape[0]
    T = us_init.shape[0]
    if mu0 is None:
        mu0 = jnp.zeros((T, nc), x0.dtype)

    def al_step(carry, _):
        us, mu, rho = carry

        def stage_aug(x, u, k):
            c = cfn(x, u, k)
            m = mu[k]
            viol = jnp.maximum(0.0, m / rho + c)
            pen = 0.5 * rho * jnp.sum(viol**2) - jnp.sum(m**2) / (2 * rho)
            return stage_cost(x, u, k) + pen

        res = ilqr_solve(fd, stage_aug, term_cost, x0, us, iters=inner_iters)
        c_traj = jax.vmap(cfn)(res.xs[:-1], res.us, jnp.arange(T))
        mu_n = jnp.maximum(0.0, mu + rho * c_traj)
        return (res.us, mu_n, rho * rho_factor), res

    (us, mu, _), results = jax.lax.scan(
        al_step, (us_init, mu0, jnp.asarray(rho_init, x0.dtype)), None, length=al_iters
    )
    last = jax.tree.map(lambda x: x[-1], results)
    return last, mu
