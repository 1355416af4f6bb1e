"""Normalization utilities (pure JAX, functional state).

TPU-native counterpart of the reference's torch normalizers
(safe_control_gym/math_and_models/normalization.py).  Normalizer state is a
PyTree updated functionally so it can live inside jitted training steps and be
checkpointed with the rest of the training state.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


def normalize_angle(x):
    """Wrap angle to [-pi, pi) (reference normalization.py:10-14)."""
    return ((x + np.pi) % (2 * np.pi)) - np.pi


class RunningMeanStd(struct.PyTreeNode):
    """Welford-style running mean/var (reference normalization.py:17-65)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape, dtype=jnp.float32, epsilon=1e-4):
        return cls(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(epsilon, dtype),
        )

    def update(self, batch):
        """Parallel-variance update from a batch (leading axis = samples)."""
        batch = batch.reshape(-1, *self.mean.shape)
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        batch_count = batch.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        M2 = m_a + m_b + delta**2 * self.count * batch_count / tot
        return self.replace(mean=new_mean, var=M2 / tot, count=tot)

    @property
    def std(self):
        return jnp.sqrt(self.var)


class MeanStdNormalizer(struct.PyTreeNode):
    """Standardize inputs with running statistics
    (reference normalization.py:85-124)."""

    rms: RunningMeanStd
    clip: float = 10.0
    epsilon: float = 1e-8
    read_only: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, shape, dtype=jnp.float32, clip=10.0, epsilon=1e-8):
        return cls(rms=RunningMeanStd.create(shape, dtype), clip=clip, epsilon=epsilon)

    def __call__(self, x, update=True):
        rms = self.rms.update(x) if (update and not self.read_only) else self.rms
        out = jnp.clip(
            (x - rms.mean) / jnp.sqrt(rms.var + self.epsilon), -self.clip, self.clip
        )
        return out, self.replace(rms=rms)


class RewardStdNormalizer(struct.PyTreeNode):
    """Scale rewards by the std of the discounted return
    (reference normalization.py:127-163, PPO Dota-style)."""

    rms: RunningMeanStd
    ret: jnp.ndarray  # running discounted return, shape (B,)
    gamma: float = 0.99
    clip: float = 10.0
    epsilon: float = 1e-8

    @classmethod
    def create(cls, num_envs, dtype=jnp.float32, gamma=0.99, clip=10.0):
        return cls(
            rms=RunningMeanStd.create((), dtype),
            ret=jnp.zeros((num_envs,), dtype),
            gamma=gamma,
            clip=clip,
        )

    def __call__(self, rewards, dones, update=True):
        ret = self.ret * self.gamma + rewards
        rms = self.rms.update(ret) if update else self.rms
        out = jnp.clip(rewards / jnp.sqrt(rms.var + self.epsilon), -self.clip, self.clip)
        ret = jnp.where(dones.astype(bool), 0.0, ret)
        return out, self.replace(rms=rms, ret=ret)


class RescaleNormalizer(struct.PyTreeNode):
    """Constant rescale (reference normalization.py:187-206)."""

    coef: float = 1.0

    def __call__(self, x, update=False):
        return x * self.coef, self


class ActionUnnormalizer(struct.PyTreeNode):
    """Map [-1, 1] policy outputs to an action box
    (reference normalization.py:221-240)."""

    low: jnp.ndarray
    high: jnp.ndarray

    def __call__(self, action):
        a = jnp.clip(action, -1.0, 1.0)
        return self.low + (a + 1.0) * 0.5 * (self.high - self.low)
