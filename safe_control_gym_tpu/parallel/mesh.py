"""Device-mesh helpers.

The reference's "distributed backend" is multiprocessing pipes + cloudpickle
(vec_env_utils.py:6-43); here it is a ``jax.sharding.Mesh``: env shards live
per device (ICI within a slice, DCN across slices), stepping is one SPMD
program, and statistics aggregate with ``psum``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None, axis_name: str = ENV_AXIS) -> Mesh:
    """1D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Place a (B, ...)-leading PyTree with the batch dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def batch_spec(axis_name: str = ENV_AXIS) -> P:
    return P(axis_name)
