"""Scan-based rollout drivers with on-device episode statistics.

Replaces the reference's Python rollout loops (ppo.py:256-276 stepping pipes,
record_episode_statistics.py trackers) with a single ``lax.scan`` whose body
is the fused env step + policy, and whose carry holds masked episode
accumulators.  For multi-device execution the same body runs under
``shard_map`` over a mesh; cross-device aggregates use ``psum`` over ICI —
this is the framework's counterpart of SubprocVecEnv's gather-on-parent
(subproc_vec_env.py:57-63).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P


class EpisodeStats(struct.PyTreeNode):
    """Masked per-env episode accumulators.

    Counterpart of RecordEpisodeStatistics / VecRecordEpisodeStatistics
    (env_wrappers/record_episode_statistics.py:11-169): running return/length
    reset on done; completed-episode sums allow exact means without a host
    queue.
    """

    ep_return: jnp.ndarray  # (B,) running return of current episode
    ep_length: jnp.ndarray  # (B,) running length
    ep_violations: jnp.ndarray  # (B,) running constraint violations
    done_count: jnp.ndarray  # (B,) completed episodes
    sum_return: jnp.ndarray  # (B,) sum of completed-episode returns
    sum_length: jnp.ndarray  # (B,)
    sum_violations: jnp.ndarray  # (B,)

    @classmethod
    def create(cls, num_envs, dtype=jnp.float32):
        z = jnp.zeros((num_envs,), dtype)
        zi = jnp.zeros((num_envs,), jnp.int32)
        return cls(z, zi, z, zi, z, z, z)

    def update(self, rew, done, info):
        viol = info.get("constraint_violation", jnp.zeros_like(rew)).astype(rew.dtype)
        ep_ret = self.ep_return + rew
        ep_len = self.ep_length + 1
        ep_vio = self.ep_violations + viol
        d = done.astype(bool)
        return self.replace(
            ep_return=jnp.where(d, 0.0, ep_ret),
            ep_length=jnp.where(d, 0, ep_len),
            ep_violations=jnp.where(d, 0.0, ep_vio),
            done_count=self.done_count + d.astype(jnp.int32),
            sum_return=self.sum_return + jnp.where(d, ep_ret, 0.0),
            sum_length=self.sum_length + jnp.where(d, ep_len, 0).astype(self.sum_length.dtype),
            sum_violations=self.sum_violations + jnp.where(d, ep_vio, 0.0),
        )

    def means(self):
        n = jnp.maximum(self.done_count.sum(), 1)
        return {
            "mean_return": self.sum_return.sum() / n,
            "mean_length": self.sum_length.sum() / n,
            "mean_violations": self.sum_violations.sum() / n,
            "episodes": self.done_count.sum(),
        }


class RolloutCarry(struct.PyTreeNode):
    env_state: struct.PyTreeNode
    obs: jnp.ndarray
    policy_state: struct.PyTreeNode
    stats: EpisodeStats


def rollout(
    vec_env,
    policy_fn: Callable,
    carry: RolloutCarry,
    num_steps: int,
    collect: bool = True,
):
    """Run ``num_steps`` batched env steps under one scan.

    policy_fn: (policy_state, obs) -> (actions, new_policy_state).
    Returns (carry, traj) where traj stacks (obs, action, reward, done, info)
    along the leading time axis — the buffer layout RL consumers expect
    (reference PPOBuffer scheme, ppo_utils.py:282-407) — or None if
    ``collect=False`` (pure throughput / eval).
    """

    def body(c: RolloutCarry, _):
        actions, pstate = policy_fn(c.policy_state, c.obs)
        env_state, obs, rew, done, info = vec_env.step(c.env_state, actions)
        stats = c.stats.update(rew, done, info)
        out = None
        if collect:
            out = {
                "obs": c.obs,
                "action": actions,
                "reward": rew,
                "done": done,
                "mse": info.get("mse"),
                "constraint_violation": info.get("constraint_violation"),
                "terminal_observation": info.get("terminal_observation"),
            }
            out = {k: v for k, v in out.items() if v is not None}
        return RolloutCarry(env_state, obs, pstate, stats), out

    carry, traj = jax.lax.scan(body, carry, None, length=num_steps)
    return carry, traj


def sharded_rollout_fn(
    vec_env,
    policy_fn: Callable,
    num_steps: int,
    mesh,
    axis_name: str = "env",
    collect: bool = False,
):
    """Build a pjit-ed rollout over a device mesh.

    The env batch is sharded over ``axis_name``; the body is identical to the
    single-device path (SPMD — XLA partitions it), so scaling out is a
    sharding annotation, not a code change.  Returns a jitted function
    ``(carry) -> (carry, global_stats)`` where global stats are psum-reduced
    across the mesh.
    """
    batch = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit, donate_argnums=0)
    def run(carry: RolloutCarry):
        carry, _ = rollout(vec_env, policy_fn, carry, num_steps, collect=collect)
        return carry, carry.stats.means()

    return run
