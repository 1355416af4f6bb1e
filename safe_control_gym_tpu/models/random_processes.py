"""Exploration noise processes (functional).

TPU-native counterpart of safe_control_gym/math_and_models/random_processes.py
(GaussianProcess / OrnsteinUhlenbeckProcess used by DDPG,
ddpg_utils.py:228-239).  Process state is an explicit PyTree advanced inside
jitted rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class GaussianNoise(struct.PyTreeNode):
    std: jnp.ndarray

    def sample(self, key, shape):
        return jax.random.normal(key, shape) * self.std, self

    def reset(self):
        return self


class OrnsteinUhlenbeckNoise(struct.PyTreeNode):
    """dx = theta (mu - x) dt + sigma sqrt(dt) N(0,1)."""

    x: jnp.ndarray
    mu: float = 0.0
    theta: float = 0.15
    sigma: float = 0.2
    dt: float = 1e-2

    @classmethod
    def create(cls, shape, dtype=jnp.float32, **kw):
        return cls(x=jnp.zeros(shape, dtype), **kw)

    def sample(self, key, shape=None):
        shape = self.x.shape if shape is None else shape
        dx = (
            self.theta * (self.mu - self.x) * self.dt
            + self.sigma * jnp.sqrt(self.dt) * jax.random.normal(key, shape, self.x.dtype)
        )
        x = self.x + dx
        return x, self.replace(x=x)

    def reset(self):
        return self.replace(x=jnp.zeros_like(self.x))


def make_action_noise_process(spec: dict, shape):
    """Factory mirroring ddpg_utils.make_action_noise_process (:228-239)."""
    kind = spec.get("func", "gaussian")
    if kind in ("gaussian", "normal"):
        return GaussianNoise(std=jnp.asarray(spec.get("std", 0.1)))
    if kind in ("ou", "ornstein_uhlenbeck"):
        return OrnsteinUhlenbeckNoise.create(
            shape,
            mu=spec.get("mu", 0.0),
            theta=spec.get("theta", 0.15),
            sigma=spec.get("sigma", 0.2),
            dt=spec.get("dt", 1e-2),
        )
    raise ValueError(f"unknown noise process {kind!r}")
