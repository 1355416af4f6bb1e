"""Gaussian-process regression (SE-ARD), pure JAX.

TPU-native counterpart of the reference's gpytorch stack
(safe_control_gym/controllers/mpc/gp_utils.py): ZeroMeanIndependent GPs per
output dimension with squared-exponential ARD kernels (the closed form the
reference mirrors in CasADi at gp_utils.py:17-39), trained by Adam on the
exact negative log marginal likelihood, plus k-means inducing-point selection
(gp_utils.py:713-725) via jitted Lloyd iterations.  Everything is
fixed-shape: training and prediction for all output dims run as one vmapped
program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def se_ard_kernel(x1, x2, lengthscales, signal_var):
    """K(x1, x2) with ARD lengthscales.  x1: (n, d), x2: (m, d) -> (n, m).
    Matches covSEard (gp_utils.py:17-39)."""
    z1 = x1 / lengthscales
    z2 = x2 / lengthscales
    d2 = ((z1[:, None, :] - z2[None, :, :]) ** 2).sum(-1)
    return signal_var * jnp.exp(-0.5 * d2)


class GPParams(NamedTuple):
    log_lengthscales: jnp.ndarray  # (ny, d)
    log_signal_var: jnp.ndarray  # (ny,)
    log_noise_var: jnp.ndarray  # (ny,)


class GPState(NamedTuple):
    params: GPParams
    train_x: jnp.ndarray  # (n, d)
    train_y: jnp.ndarray  # (n, ny)
    alpha: jnp.ndarray  # (ny, n) — K^-1 y, precomputed
    L: jnp.ndarray  # (ny, n, n) — Cholesky of K + noise


def _nll(params_i, x, y):
    """Negative log marginal likelihood for one output dim."""
    ls = jnp.exp(params_i[:-2])
    sv = jnp.exp(params_i[-2])
    nv = jnp.exp(params_i[-1])
    n = x.shape[0]
    K = se_ard_kernel(x, x, ls, sv) + (nv + 1e-6) * jnp.eye(n, dtype=x.dtype)
    L = jnp.linalg.cholesky(K)
    a = jax.scipy.linalg.cho_solve((L, True), y)
    return 0.5 * y @ a + jnp.log(jnp.diag(L)).sum() + 0.5 * n * jnp.log(2 * jnp.pi)


def gp_fit(train_x, train_y, iters: int = 200, lr: float = 0.05) -> GPState:
    """Fit independent GPs per output dim (vmapped over dims).

    train_x: (n, d); train_y: (n, ny).
    """
    n, d = train_x.shape
    ny = train_y.shape[1]
    theta0 = jnp.concatenate(
        [jnp.zeros((ny, d)), jnp.zeros((ny, 1)), jnp.full((ny, 1), -4.0)], -1
    )
    tx = optax.adam(lr)

    def fit_one(theta, y):
        opt = tx.init(theta)

        def step(carry, _):
            th, opt = carry
            loss, g = jax.value_and_grad(_nll)(th, train_x, y)
            upd, opt = tx.update(g, opt, th)
            return (optax.apply_updates(th, upd), opt), loss

        (th, _), losses = jax.lax.scan(step, (theta, opt), None, length=iters)
        return th, losses[-1]

    thetas, _ = jax.vmap(fit_one)(theta0, train_y.T)
    params = GPParams(
        log_lengthscales=thetas[:, :d],
        log_signal_var=thetas[:, d],
        log_noise_var=thetas[:, d + 1],
    )

    def prep(ls_log, sv_log, nv_log, y):
        K = se_ard_kernel(train_x, train_x, jnp.exp(ls_log), jnp.exp(sv_log))
        K = K + (jnp.exp(nv_log) + 1e-6) * jnp.eye(n, dtype=train_x.dtype)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return a, L

    alpha, L = jax.vmap(prep)(
        params.log_lengthscales, params.log_signal_var, params.log_noise_var, train_y.T
    )
    return GPState(params, train_x, train_y, alpha, L)


def gp_predict(state: GPState, x_query):
    """Posterior mean and variance at x_query (m, d) -> ((m, ny), (m, ny))."""

    def one(ls_log, sv_log, a, L):
        ls, sv = jnp.exp(ls_log), jnp.exp(sv_log)
        Ks = se_ard_kernel(x_query, state.train_x, ls, sv)  # (m, n)
        mean = Ks @ a
        v = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)
        var = sv - (v**2).sum(0)
        return mean, jnp.maximum(var, 1e-8)

    means, vars_ = jax.vmap(one)(
        state.params.log_lengthscales,
        state.params.log_signal_var,
        state.alpha,
        state.L,
    )
    return means.T, vars_.T


def kmeans(key, x, k: int, iters: int = 20):
    """Lloyd's algorithm (inducing points; gp_utils.py:713-725)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = x[idx]

    def step(c, _):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ x
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), c)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids
