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

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import PartitionSpec as P


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

    def means(self, axis_name=None):
        """Completed-episode means.  With ``axis_name`` the sums are
        psum-reduced across that mesh axis (use inside shard_map; the
        collective rides ICI — SubprocVecEnv's pipe gather, SURVEY §2.8)."""
        reduce = (
            (lambda x: jax.lax.psum(x, axis_name))
            if axis_name is not None
            else (lambda x: x)
        )
        episodes = reduce(self.done_count.sum())
        n = jnp.maximum(episodes, 1)
        return {
            "mean_return": reduce(self.sum_return.sum()) / n,
            "mean_length": reduce(self.sum_length.sum()) / n,
            "mean_violations": reduce(self.sum_violations.sum()) / n,
            "episodes": episodes,
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
    unroll: int = 1,
):
    """Run ``num_steps`` batched env steps under one scan.

    policy_fn: (policy_state, obs) -> (actions, new_policy_state).
    Returns (carry, traj) where traj stacks (obs, action, reward, done, info)
    along the leading time axis — the buffer layout RL consumers expect
    (reference PPOBuffer scheme, ppo_utils.py:282-407) — or None if
    ``collect=False`` (pure throughput / eval).
    ``unroll`` unrolls the scan body (cuts TPU loop overhead and lets XLA
    fuse across steps; use ~8 for throughput runs, 1 when collecting to
    bound compile time).
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

    carry, traj = jax.lax.scan(body, carry, None, length=num_steps, unroll=unroll)
    return carry, traj


def sharded_rollout_fn(
    vec_env,
    policy_fn: Callable,
    num_steps: int,
    mesh,
    axis_name: str = "env",
    collect: bool = False,
    unroll: int = 1,
):
    """Build a shard_map-ed rollout over a device mesh.

    The env batch (every leading-B leaf of the carry) shards over
    ``axis_name``; policy state is replicated.  Each shard runs the
    single-device rollout on its *local* slice — so per-shard code is
    identical to the single-chip path (including the fused Pallas substep
    kernel, which GSPMD auto-partitioning could not split) — and global
    episode statistics are psum-reduced over ICI.  Returns a jitted
    ``(carry) -> (carry, global_stats)``.
    """
    from jax import shard_map

    carry_spec = RolloutCarry(
        env_state=P(axis_name), obs=P(axis_name), policy_state=P(),
        stats=P(axis_name),
    )

    def local_run(carry: RolloutCarry):
        carry, _ = rollout(
            vec_env, policy_fn, carry, num_steps, collect=collect, unroll=unroll
        )
        return carry, carry.stats.means(axis_name=axis_name)

    run = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(carry_spec,),
        out_specs=(carry_spec, P()),
        check_vma=False,
    )
    return jax.jit(run, donate_argnums=0)
