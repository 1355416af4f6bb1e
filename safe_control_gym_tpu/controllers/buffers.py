"""Device-resident replay buffer.

TPU-native counterpart of the reference's SACBuffer/DDPG replay
(sac_utils.py:294-412): a fixed-capacity ring of arrays living in HBM,
pushed to and sampled from inside jitted train steps — no host round-trips.
Truncation-aware like the reference: when an episode ends by time limit the
stored next_obs is the true terminal observation and the bootstrap mask
stays 1 ("true_next_obs"/"true_mask" semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class ReplayBuffer(struct.PyTreeNode):
    data: dict  # name -> (capacity, ...) array
    ptr: jnp.ndarray  # int32
    size: jnp.ndarray  # int32
    capacity: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, capacity: int, specs: dict, dtype=jnp.float32):
        """specs: name -> trailing shape tuple."""
        data = {
            k: jnp.zeros((capacity,) + tuple(shape), dtype) for k, shape in specs.items()
        }
        return cls(
            data=data,
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            capacity=capacity,
        )

    def push(self, batch: dict):
        """Insert a (B, ...) batch at the ring pointer (wrapping)."""
        B = next(iter(batch.values())).shape[0]
        idx = (self.ptr + jnp.arange(B)) % self.capacity
        data = {k: self.data[k].at[idx].set(v.astype(self.data[k].dtype)) for k, v in batch.items()}
        return self.replace(
            data=data,
            ptr=(self.ptr + B) % self.capacity,
            size=jnp.minimum(self.size + B, self.capacity),
        )

    def sample(self, key, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return {k: v[idx] for k, v in self.data.items()}
