"""Stateful gym-style adapter over the functional env API.

The reference environments are `gym.Env`s (pre-0.26 API): ``reset() ->
(obs, info)``, ``step(action) -> (obs, reward, done, info)`` with
``info['TimeLimit.truncated']`` distinguishing timeout from true
termination (benchmark_env.py:383,463).  This framework's native surface
is the functional pair ``reset(key) / step(state, action)`` (envs/
benchmark.py FnEnv) — the right shape for vmap/scan/shard_map — but a
user migrating an existing reference control loop should not have to
rewrite it.  ``GymEnv`` carries the (state, key) pair internally and
exposes the reference's single-env imperative API, numpy in / numpy out.

Seeding mirrors the reference: each ``reset()`` advances the episode
stream by default, while ``reseed_on_reset=True`` replays the seed so
every episode draws identical randomization (benchmark_env.py:210-215,
the IROS-2022 fork's competition knob).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


class Box:
    """Minimal Box space (low/high/shape/sample), enough for reference-style
    control loops; no gym dependency."""

    def __init__(self, low, high, rng: Optional[np.random.Generator] = None):
        self.low = np.asarray(low, np.float32)
        self.high = np.asarray(high, np.float32)
        self.shape = self.low.shape
        self.dtype = np.float32
        self._rng = rng or np.random.default_rng(0)

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)
        return [seed]

    def sample(self):
        lo = np.where(np.isfinite(self.low), self.low, -1.0)
        hi = np.where(np.isfinite(self.high), self.high, 1.0)
        return self._rng.uniform(lo, hi).astype(np.float32)

    def contains(self, x):
        x = np.asarray(x)
        return bool(
            x.shape == self.shape and (x >= self.low).all() and (x <= self.high).all()
        )

    def __repr__(self):
        return f"Box{self.shape}"


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


class GymEnv:
    """Single-env, stateful, numpy-in/numpy-out wrapper over an ``FnEnv``.

    ``reset()``/``step()``/``seed()``/``render()``/``close()`` follow the
    reference BenchmarkEnv surface so an existing reference control loop
    runs unchanged; the underlying jitted functional env is reachable at
    ``.fn_env`` when the loop is ready to go batched.
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env, seed: int = 0, reseed_on_reset: Optional[bool] = None):
        self.fn_env = env
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step)
        self._state = None
        self._episodes = 0
        if reseed_on_reset is None:
            reseed_on_reset = bool(getattr(env.config, "reseed_on_reset", False))
        self.reseed_on_reset = reseed_on_reset
        self.seed(seed)

        sp = env.spaces
        self.action_space = Box(sp.action_low, sp.action_high,
                                np.random.default_rng(seed))
        self.observation_space = Box(sp.obs_low, sp.obs_high)
        # Reference-style passthrough attributes controllers read.
        self.symbolic = env.symbolic
        self.x_goal = env.x_goal
        self.u_goal = env.u_goal
        self.CTRL_FREQ = env.ctrl_freq
        self.CTRL_TIMESTEP = env.ctrl_timestep
        self.EPISODE_LEN_SEC = env.episode_len_sec
        self.CTRL_STEPS = env.max_episode_steps

    # -- gym surface --------------------------------------------------------

    def seed(self, seed=None):
        """Reset the episode key stream (benchmark_env.py seed()).

        ``seed=None`` draws fresh OS entropy (gym semantics) rather than
        silently pinning to 0."""
        if seed is None:
            seed = int(np.random.SeedSequence().entropy % (2 ** 31))
        self._seed = int(seed)
        self._base_key = jax.random.key(self._seed)
        self._episodes = 0
        if hasattr(self, "action_space"):
            self.action_space.seed(self._seed)
        return [self._seed]

    def reset(self):
        """-> (obs, info).  Advances the episode stream unless
        ``reseed_on_reset`` (then every episode replays the seed's draws)."""
        if self.reseed_on_reset:
            key = self._base_key
        else:
            key = jax.random.fold_in(self._base_key, self._episodes)
        self._episodes += 1
        self._state, obs, info = self._reset_fn(key)
        obs, info = _to_numpy((obs, info))
        return obs, info

    def step(self, action):
        """-> (obs, reward, done, info) with info['TimeLimit.truncated']
        (benchmark_env.py:458-463 semantics, emitted by the env itself)."""
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        action = np.asarray(action, np.float32).reshape(self.action_space.shape)
        self._state, obs, rew, done, info = self._step_fn(self._state, action)
        obs, rew, done, info = _to_numpy((obs, rew, done, info))
        return obs, float(rew), bool(done), info

    def render(self, mode: str = "rgb_array"):
        """One RGB frame of the current state (utils/rendering.py; the
        interactive path is utils.live_viewer)."""
        from safe_control_gym_tpu.envs.cartpole import CartPoleConfig

        if self._state is None:
            raise RuntimeError("call reset() before render()")
        x = np.asarray(self._state.x)
        cfg = self.fn_env.config
        if isinstance(cfg, CartPoleConfig):
            from safe_control_gym_tpu.utils.rendering import render_cartpole

            return render_cartpole(x, pole_length=float(self._state.pole_length))
        from safe_control_gym_tpu.utils.rendering import render_quadrotor

        xg = np.asarray(self.x_goal, float)
        xg0 = xg.reshape(-1, xg.shape[-1])[0] if xg.ndim > 1 else xg
        # 3D state layout [x, x', y, y', z, z', ...]: positions at 0/2/4.
        goal = xg0[[0, 2, 4]] if xg0.size >= 12 else None
        return render_quadrotor(
            x,
            quad_type=int(cfg.quad_type),
            gates=getattr(cfg, "gates", None),
            obstacles=getattr(cfg, "obstacles", None),
            goal=goal,
        )

    def close(self):
        self._state = None

    # -- conveniences -------------------------------------------------------

    @property
    def state(self):
        """The functional env-state PyTree (for inspection / hand-off to the
        batched API)."""
        return self._state


def make_gym_env(config=None, seed: int = 0,
                 reseed_on_reset: Optional[bool] = None, **overrides):
    """Reference-style one-call constructor: config dataclass (or None for
    the default cartpole) -> stateful GymEnv.  ``overrides`` are config
    field replacements; ``reseed_on_reset`` is the adapter's episode-stream
    knob (benchmark_env.py:210-215), not a config field."""
    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

    if config is None:
        config = CartPoleConfig(**overrides)
    elif overrides:
        import dataclasses

        config = dataclasses.replace(config, **overrides)
    if isinstance(config, CartPoleConfig):
        env = make_cartpole(config)
    elif isinstance(config, QuadrotorConfig):
        env = make_quadrotor(config)
    else:
        raise TypeError(f"unsupported config type: {type(config)!r}")
    return GymEnv(env, seed=seed, reseed_on_reset=reseed_on_reset)
