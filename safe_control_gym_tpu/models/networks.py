"""Neural network building blocks (flax.linen).

TPU-native counterpart of the reference's torch modules
(safe_control_gym/math_and_models/neural_networks.py): MLP with
activation-by-name and orthogonal init (:26-68), Nature-DQN CNN (:71-106),
GRU-based RNN (:109-168).  All stay batch-first and jit/vmap friendly; RL
agents compose them exactly like the reference's ppo_utils/sac_utils do.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "leaky_relu": nn.leaky_relu,
    "identity": lambda x: x,
}


def get_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}")
    return ACTIVATIONS[name]


class MLP(nn.Module):
    """Multi-layer perceptron with orthogonal init
    (reference neural_networks.py:26-68)."""

    output_dim: int
    hidden_dims: Sequence[int] = (64, 64)
    act: str = "relu"
    out_act: str = "identity"
    init_gain: float = 1.4142135623730951  # sqrt(2)
    out_gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        for h in self.hidden_dims:
            x = nn.Dense(h, kernel_init=nn.initializers.orthogonal(self.init_gain))(x)
            x = act(x)
        x = nn.Dense(
            self.output_dim, kernel_init=nn.initializers.orthogonal(self.out_gain)
        )(x)
        return get_activation(self.out_act)(x)


class CNN(nn.Module):
    """Nature-DQN conv stack (reference neural_networks.py:71-106).
    Input: (B, H, W, C) images."""

    output_dim: int

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.orthogonal(jnp.sqrt(2.0))
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), kernel_init=init)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), kernel_init=init)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), kernel_init=init)(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(512, kernel_init=init)(x))
        return nn.Dense(self.output_dim, kernel_init=init)(x)


class RNN(nn.Module):
    """GRU over (B, T, D) sequences with done-masked segment handling
    (reference neural_networks.py:109-168 resets hidden state at masked
    steps).  Returns (outputs (B, T, H), final_hidden)."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, xs, masks=None, init_carry=None):
        cell = nn.GRUCell(features=self.hidden_dim)
        B = xs.shape[0]
        if init_carry is None:
            init_carry = jnp.zeros((B, self.hidden_dim), xs.dtype)
        if masks is None:
            masks = jnp.ones(xs.shape[:2], xs.dtype)

        scan = nn.scan(
            lambda c, carry, xm: c(carry * xm[1][:, None], xm[0]),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, ys = scan(cell, init_carry, (xs, masks))
        return ys, carry
