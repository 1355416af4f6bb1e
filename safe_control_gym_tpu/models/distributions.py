"""Action distributions.

TPU-native counterpart of the reference's torch distribution wrappers
(safe_control_gym/math_and_models/distributions.py): diagonal Normal with
summed last-dim log-prob/entropy and ``mode() == mean`` (:9-39), and
Categorical (:42-72).  Implemented as stateless helpers over (loc, scale) /
logits arrays.
"""

import math

import jax
import jax.numpy as jnp

# Host float on purpose: a module-level jnp.log() would run eagerly on the
# default backend at import (device dispatch) and then be captured as a
# device-array constant by every traced user — costing a device_get per
# lowering (minutes over a remote tunnel).
LOG_2PI = math.log(2.0 * math.pi)


class Normal:
    """Diagonal Gaussian; log_prob/entropy sum over the last dim."""

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def sample(self, key):
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape, self.loc.dtype)

    def log_prob(self, value):
        var = self.scale**2
        lp = -((value - self.loc) ** 2) / (2 * var) - jnp.log(self.scale) - 0.5 * LOG_2PI
        return lp.sum(-1)

    def entropy(self):
        return (0.5 + 0.5 * LOG_2PI + jnp.log(self.scale)).sum(-1)

    def mode(self):
        return self.loc


class Categorical:
    """Categorical over logits; mode is the argmax (reference :42-72)."""

    def __init__(self, logits):
        self.logits = logits - jax.scipy.special.logsumexp(logits, -1, keepdims=True)

    def sample(self, key):
        return jax.random.categorical(key, self.logits)

    def log_prob(self, value):
        return jnp.take_along_axis(self.logits, value[..., None].astype(jnp.int32), -1)[..., 0]

    def entropy(self):
        p = jnp.exp(self.logits)
        return -(p * self.logits).sum(-1)

    def mode(self):
        return self.logits.argmax(-1)
