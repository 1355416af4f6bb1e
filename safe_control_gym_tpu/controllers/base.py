"""Controller protocol.

TPU-native counterpart of the reference's BaseController
(safe_control_gym/controllers/base_controller.py:6-90): learn() / run() /
select_action / save() / load() / reset().  Controllers here are built from a
``FnEnv`` and hold a functional ``state`` PyTree; `select_action` is pure and
jittable so whole eval rollouts fuse into one scan.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.rollout import rollout


class BaseController:
    """Stateful host-side shell around pure JAX functions."""

    def __init__(self, env, output_dir: str = ".", seed: int = 0, **kwargs):
        self.env = env
        self.output_dir = output_dir
        self.seed = seed
        self.key = jax.random.key(seed)
        self.state: Any = None  # controller's functional state PyTree

    # -- reference API (base_controller.py:18-90) ---------------------------
    def reset(self):
        pass

    def close(self):
        pass

    def learn(self, **kwargs):
        """Train loop; model-based controllers are no-ops."""

    # -- chunked training dispatch ------------------------------------------
    # On remote/tunneled devices each dispatch pays a ~5-8 ms round trip, so
    # a one-dispatch-per-train-step loop caps throughput regardless of device
    # time (docs/PERF.md round-3 RL section).  Any learner that stores its
    # pure step as ``self._train_step_fn`` gets an n-step scan for free.
    def train_many(self, n: int):
        """Jitted n-step training chunk: ``lax.scan`` of the full train step.

        Returns ``(state, metrics)`` with the LAST step's metrics (same
        contract as one train step)."""
        cache = getattr(self, "_train_many_cache", None)
        if cache is None:
            cache = self._train_many_cache = {}
        if n not in cache:
            step = self._train_step_fn

            def f(state):
                def body(st, _):
                    st, m = step(st)
                    return st, m

                state, ms = jax.lax.scan(body, state, None, length=n)
                return state, jax.tree.map(lambda x: x[-1], ms)

            cache[n] = jax.jit(f)
        return cache[n]

    def _learn_chunked(self, n_iters: int, chunk: int = 8):
        """Advance ``self.state`` by ``n_iters`` train steps using chunked
        dispatch: full chunks via ``train_many(chunk)`` (one round trip per
        ``chunk`` steps, one extra compile), remainder via the single-step
        jit already compiled.  Returns the last metrics PyTree."""
        metrics = {}
        if chunk > 1:
            many = self.train_many(chunk)
            for _ in range(n_iters // chunk):
                self.state, metrics = many(self.state)
        for _ in range(n_iters % chunk if chunk > 1 else n_iters):
            self.state, metrics = self._train_step(self.state)
        return metrics

    def select_action(self, obs, info=None):
        raise NotImplementedError

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.state), f)

    def load(self, path):
        with open(path, "rb") as f:
            self.state = pickle.load(f)

    # -- shared eval loop (mirrors e.g. mpc.py:366-466 / lqr.py:204-346) ----
    def run(self, num_episodes: int = 1, max_steps: int | None = None, seed: int = 0,
            analysis: bool = False, plot: bool = False, plot_dir: str = "."):
        """Batched evaluation: num_episodes environments in parallel, one
        scan.  Returns a results dict with per-step obs/action/reward stacks
        and episode statistics (the reference's results_dict shape).

        ``analysis=True`` adds the reference's LQR-style post-analysis
        (lqr_utils.py post_analysis): per-state RMSE vs the goal trajectory
        (angle errors wrapped), optional state/input plots."""
        env = self.env
        B = num_episodes
        vec = make_vec_env(env, B, auto_reset=False)
        state, obs, _ = jax.jit(vec.reset)(jax.random.key(seed))
        T = max_steps or env.max_episode_steps

        select = jax.vmap(lambda o: self._policy(o))

        def body(carry, _):
            s, o, done_mask = carry
            a = select(o)
            s2, o2, r, d, info = vec.step_no_reset(s, a)
            # Freeze finished episodes (no auto-reset during eval).
            s = jax.tree.map(
                lambda new, old: jnp.where(
                    done_mask.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
                ),
                s2,
                s,
            )
            o = jnp.where(done_mask[:, None], o, o2)
            r = jnp.where(done_mask, 0.0, r)
            out = {"obs": o, "action": a, "reward": r, "done": d, "mse": info["mse"]}
            return (s, o, done_mask | d), out

        (state, obs, done), traj = jax.lax.scan(body, (state, obs, jnp.zeros(B, bool)), None, length=T)
        traj = jax.device_get(traj)
        results = {
            "obs": traj["obs"],
            "action": traj["action"],
            "reward": traj["reward"],
            "done": traj["done"],
            "mse": traj["mse"],
            "ep_returns": traj["reward"].sum(0),
            "ep_lengths": (~traj["done"]).sum(0) + 1,
        }
        if analysis:
            from safe_control_gym_tpu.utils.plotting import post_analysis

            x_goal = np.asarray(env.x_goal)
            nx = traj["obs"].shape[-1] if x_goal.ndim == 1 else x_goal.shape[-1]
            if x_goal.ndim == 1:
                goal = np.tile(x_goal[None], (traj["obs"].shape[0], 1))
                nx = x_goal.shape[0]
            else:
                idx = np.clip(np.arange(traj["obs"].shape[0]), 0, x_goal.shape[0] - 1)
                goal = x_goal[idx]
            results["analysis"] = post_analysis(
                goal, traj["obs"][:, 0, :nx], traj["action"][:, 0], env=env,
                plot=plot, save_plot=plot, plot_dir=plot_dir,
            )
        return results

    def _policy(self, obs):
        """Pure single-obs policy used by run(); subclasses override."""
        raise NotImplementedError
