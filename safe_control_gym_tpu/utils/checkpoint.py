"""Checkpoint / resume of full training-state PyTrees.

TPU-native counterpart of the reference's torch state_dict checkpoints
(ppo.py:106-155: nets + optimizers + normalizers + total_steps + obs + full
RNG state incl. per-worker env RNG via RPC).  Here the *entire* training
state — model params, optimizer states, normalizers, env state, and the
per-env PRNG keys — is one PyTree, so saving it IS the full distributed-RNG
snapshot; bitwise resume falls out of keyed randomness (SURVEY §5).

Uses orbax-style structure via simple msgpack/pickle serialization of host
copies (orbax itself is available but pickle keeps zero config surface).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp


class _KeyLeaf:
    """Pickle-able stand-in for typed PRNG key arrays."""

    def __init__(self, impl: str, data):
        self.impl = impl
        self.data = data


def _encode(leaf):
    if hasattr(leaf, "dtype") and jnp.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
        return _KeyLeaf(str(jax.random.key_impl(leaf)), jax.device_get(jax.random.key_data(leaf)))
    return jax.device_get(leaf)


def _decode(leaf):
    if isinstance(leaf, _KeyLeaf):
        return jax.random.wrap_key_data(jnp.asarray(leaf.data), impl=leaf.impl)
    return leaf


def save_checkpoint(path: str, state, step: int | None = None, metadata: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": jax.tree.map(_encode, state),
        "step": step,
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = jax.tree.map(
        _decode, payload["state"], is_leaf=lambda x: isinstance(x, _KeyLeaf)
    )
    return state, payload["step"], payload["metadata"]


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_"):
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir) if f.startswith(prefix)]
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands, key=lambda f: int(f[len(prefix):].split(".")[0])))
