"""Benchmark-environment core: tasks, costs, timing, reference trajectories.

TPU-native counterpart of the reference's ``BenchmarkEnv``
(safe_control_gym/envs/benchmark_env.py).  Instead of a stateful gym.Env, an
environment here is a ``FnEnv``: a bundle of pure functions produced by a
factory from a static config.  Episode bookkeeping (step counters, constraint
evaluation, time-limit truncation — reference benchmark_env.py:394-463) lives
in the per-env state PyTree so that thousands of envs step in lockstep under
``jit``/``vmap``.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Callable, NamedTuple

import numpy as np


class Cost(str, Enum):
    """Reward/cost function choice (reference benchmark_env.py:19-27)."""

    RL_REWARD = "rl_reward"
    QUADRATIC = "quadratic"
    COMPETITION = "competition"


class Task(str, Enum):
    """Environment task (reference benchmark_env.py:29-36)."""

    STABILIZATION = "stabilization"
    TRAJ_TRACKING = "traj_tracking"


class EnvSpaces(NamedTuple):
    """Static box-space description (replaces gym.spaces boxes).

    ``obs_low/high`` describe the observation exposed to controllers, which may
    be the state augmented with goal-horizon references
    (reference benchmark_env.py:406-420, quadrotor.py:793-806).
    """

    state_low: np.ndarray
    state_high: np.ndarray
    action_low: np.ndarray
    action_high: np.ndarray
    obs_low: np.ndarray
    obs_high: np.ndarray

    @property
    def state_dim(self) -> int:
        return self.state_low.shape[0]

    @property
    def action_dim(self) -> int:
        return self.action_low.shape[0]

    @property
    def obs_dim(self) -> int:
        return self.obs_low.shape[0]


@dataclasses.dataclass(frozen=True)
class FnEnv:
    """A functional environment.

    Attributes:
        reset: ``(key) -> (state, obs, info)`` — pure; all randomization
            (initial state, inertial properties, gate poses, disturbance
            schedules) derives from ``key``.
        step: ``(state, action) -> (state, obs, reward, done, info)`` — pure.
        spaces: static space description.
        symbolic: a ``DynamicsModel`` carrying the env's a-priori closed-form
            model (the reference ships a CasADi model to controllers through
            reset info, quadrotor.py:1144; here it is a first-class attribute).
        config: the static config the env was built from.
        x_goal / u_goal: reference state(s) and input (reference
            quadrotor.py:261-329).
        ctrl_freq / pyb_freq / episode_len_sec: timing constants
            (reference benchmark_env.py:151-161).
    """

    reset: Callable
    step: Callable
    spaces: EnvSpaces
    symbolic: Any
    config: Any
    x_goal: np.ndarray
    u_goal: np.ndarray
    ctrl_freq: int
    pyb_freq: int
    episode_len_sec: float
    extras: Any = None  # env-specific extra functions (e.g. adversary setter)

    @property
    def ctrl_timestep(self) -> float:
        return 1.0 / self.ctrl_freq

    @property
    def max_episode_steps(self) -> int:
        return int(self.episode_len_sec * self.ctrl_freq)


def check_timing(pyb_freq: int, ctrl_freq: int) -> int:
    """Validate physics/control frequency divisibility
    (reference benchmark_env.py:154-156)."""
    if pyb_freq % ctrl_freq != 0:
        raise ValueError("pyb_freq must be divisible by ctrl_freq.")
    return pyb_freq // ctrl_freq


# ---------------------------------------------------------------------------
# Reference trajectory generation (host-side, float64 NumPy).
#
# Mirrors BenchmarkEnv._generate_trajectory/_figure8/_circle/_square
# (benchmark_env.py:465-674).  Computed once at env-build time and baked into
# the jitted step as constant arrays — the TPU engine never regenerates them.
# ---------------------------------------------------------------------------

_AXES = {"x": 0, "y": 1, "z": 2}


def _figure8(t, period, scaling):
    w = 2.0 * np.pi / period
    a = scaling * np.sin(w * t)
    b = scaling * np.sin(w * t) * np.cos(w * t)
    a_dot = scaling * w * np.cos(w * t)
    b_dot = scaling * w * (np.cos(w * t) ** 2 - np.sin(w * t) ** 2)
    return a, b, a_dot, b_dot


def _circle(t, period, scaling):
    w = 2.0 * np.pi / period
    return (
        scaling * np.cos(w * t),
        scaling * np.sin(w * t),
        -scaling * w * np.sin(w * t),
        scaling * w * np.cos(w * t),
    )


def _square(t, period, scaling):
    seg_period = period / 4.0
    speed = scaling / seg_period
    cycle_time = t % period
    seg_time = cycle_time % seg_period
    seg_idx = np.floor(cycle_time / seg_period).astype(int)
    seg_pos = speed * seg_time
    # Piecewise segments: up, left, down, right (benchmark_env.py:650-674).
    a = np.select(
        [seg_idx == 0, seg_idx == 1, seg_idx == 2, seg_idx == 3],
        [0.0 * seg_pos, -seg_pos, -scaling + 0 * seg_pos, -scaling + seg_pos],
    )
    b = np.select(
        [seg_idx == 0, seg_idx == 1, seg_idx == 2, seg_idx == 3],
        [seg_pos, scaling + 0 * seg_pos, scaling - seg_pos, 0.0 * seg_pos],
    )
    a_dot = np.select(
        [seg_idx == 0, seg_idx == 1, seg_idx == 2, seg_idx == 3],
        [0.0 * seg_pos, -speed + 0 * seg_pos, 0.0 * seg_pos, speed + 0 * seg_pos],
    )
    b_dot = np.select(
        [seg_idx == 0, seg_idx == 1, seg_idx == 2, seg_idx == 3],
        [speed + 0 * seg_pos, 0.0 * seg_pos, -speed + 0 * seg_pos, 0.0 * seg_pos],
    )
    return a, b, a_dot, b_dot


_TRAJ_FNS = {"figure8": _figure8, "circle": _circle, "square": _square}


def generate_trajectory(
    traj_type: str = "figure8",
    traj_length: float = 10.0,
    num_cycles: int = 1,
    traj_plane: str = "xy",
    position_offset=(0.0, 0.0),
    scaling: float = 1.0,
    sample_time: float = 0.01,
):
    """Sample a planar reference trajectory; returns (pos, vel, speed).

    Same sampling convention as the reference (times = arange(0, length,
    sample_time); benchmark_env.py:503-519); vectorized instead of a Python
    loop.
    """
    if traj_type not in _TRAJ_FNS:
        raise ValueError("Trajectory type should be one of [circle, square, figure8].")
    if (
        len(traj_plane) != 2
        or traj_plane[0] not in _AXES
        or traj_plane[1] not in _AXES
        or traj_plane[0] == traj_plane[1]
    ):
        raise ValueError("Trajectory plane should be two distinct axes from {x, y, z}.")
    period = traj_length / num_cycles
    ia, ib = _AXES[traj_plane[0]], _AXES[traj_plane[1]]
    times = np.arange(0.0, traj_length, sample_time)
    a, b, a_dot, b_dot = _TRAJ_FNS[traj_type](times, period, scaling)
    pos = np.zeros((times.shape[0], 3))
    vel = np.zeros((times.shape[0], 3))
    pos[:, ia] = a + position_offset[0]
    pos[:, ib] = b + position_offset[1]
    vel[:, ia] = a_dot
    vel[:, ib] = b_dot
    speed = np.linalg.norm(vel, axis=-1, keepdims=True)
    return pos, vel, speed
