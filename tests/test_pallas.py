"""Fused Pallas 3D-quadrotor substep kernel vs the XLA reference chain.

Runs in interpret mode on the CPU test backend; the same kernel code runs
compiled on TPU (validated by bench.py / the driver's TPU runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor, quad_fc_3d
from safe_control_gym_tpu.ops.integrators import rk4_step
from safe_control_gym_tpu.ops.pallas_quad import make_quad3d_integrator

DT, N_SUB = 1.0 / 240.0, 4


def _xla_substeps(x, f, ext, m, j):
    fc = lambda xx, uu: quad_fc_3d(xx, uu, m, j, ext)
    for _ in range(N_SUB):
        x = rk4_step(fc, x, f, DT)
    return x


def _random_batch(B):
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, 12), jnp.float32) * 0.2
    f = jax.random.uniform(jax.random.fold_in(k, 2), (B, 4), jnp.float32, 0.02, 0.08)
    ext = jax.random.normal(jax.random.fold_in(k, 3), (B, 3), jnp.float32) * 1e-3
    m = jnp.full((B,), 0.027, jnp.float32)
    j = jnp.tile(jnp.array([1.4e-5, 1.4e-5, 2.17e-5], jnp.float32), (B, 1))
    return x, f, ext, m, j


def test_kernel_matches_xla_chain():
    B = 256
    args = _random_batch(B)
    ref = jax.vmap(_xla_substeps)(*args)
    integ = make_quad3d_integrator(_xla_substeps, DT, N_SUB, force_pallas=True)
    out = jax.jit(jax.vmap(integ))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_kernel_euler_mode():
    B = 128

    def xla_euler(x, f, ext, m, j):
        fc = lambda xx, uu: quad_fc_3d(xx, uu, m, j, ext)
        for _ in range(N_SUB):
            x = x + DT * fc(x, f)
        return x

    args = _random_batch(B)
    ref = jax.vmap(xla_euler)(*args)
    integ = make_quad3d_integrator(xla_euler, DT, N_SUB, euler=True, force_pallas=True)
    out = jax.jit(jax.vmap(integ))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_unbatched_primal_is_untouched():
    x, f, ext, m, j = (a[0] for a in _random_batch(8))
    integ = make_quad3d_integrator(_xla_substeps, DT, N_SUB)
    out = jax.jit(integ)(x, f, ext, m, j)
    ref = jax.jit(_xla_substeps)(x, f, ext, m, j)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ineligible_batch_falls_back():
    # B=100 is not 128-aligned -> vmapped XLA fallback, still exact.
    B = 100
    args = _random_batch(B)
    ref = jax.jit(jax.vmap(_xla_substeps))(*args)
    integ = make_quad3d_integrator(_xla_substeps, DT, N_SUB)
    out = jax.jit(jax.vmap(integ))(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_env_step_with_pallas_matches_default():
    """Full env.step parity: forced-pallas (interpret) vs default XLA path."""
    cfg = dict(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=4,
        task="stabilization",
        task_info={"stabilization_goal": [0, 0, 1], "stabilization_goal_tolerance": 0.05},
        cost="rl_reward",
    )
    env_ref = make_quadrotor(QuadrotorConfig(**cfg, use_pallas=False))
    env_pal = make_quadrotor(QuadrotorConfig(**cfg, use_pallas=True))
    B = 128
    keys = jax.random.split(jax.random.key(3), B)
    s_ref, o_ref, _ = jax.vmap(env_ref.reset)(keys)
    s_pal, o_pal, _ = jax.vmap(env_pal.reset)(keys)
    act = jnp.full((B, 4), 0.06, jnp.float32)
    for _ in range(3):
        s_ref, o_ref, r_ref, d_ref, _ = jax.vmap(env_ref.step)(s_ref, act)
        s_pal, o_pal, r_pal, d_pal, _ = jax.vmap(env_pal.step)(s_pal, act)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref), atol=5e-6)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=1e-5)
