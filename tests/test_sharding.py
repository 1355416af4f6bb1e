"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Stands in for a TPU pod slice (SURVEY §4): the env batch shards over the
mesh; trajectories must be bitwise-identical to the single-device run, and
global episode statistics must aggregate correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_mesh, make_vec_env, shard_batch
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=3,
            ctrl_freq=50,
            pyb_freq=100,
            episode_len_sec=0.5,
            randomized_inertial_prop=True,
        )
    )
    return env


def test_sharded_step_bitwise_matches_single_device(setup):
    env = setup
    B = 32
    vec = make_vec_env(env, B)
    key = jax.random.key(0)

    # Single device.
    state1, obs1, _ = jax.jit(vec.reset)(key)
    # Sharded over the mesh.
    mesh = make_mesh()
    state2, obs2, _ = jax.jit(vec.reset)(key)
    state2 = shard_batch(state2, mesh)
    obs2 = shard_batch(obs2, mesh)
    actions = jnp.tile(jnp.full((4,), 0.12), (B, 1))
    step = jax.jit(vec.step)
    for _ in range(8):
        state1, obs1, r1, d1, _ = step(state1, actions)
        state2, obs2, r2, d2, _ = step(state2, shard_batch(actions, mesh))
    assert np.array_equal(np.asarray(obs1), np.asarray(obs2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    # Verify the sharded run actually used the mesh.
    assert len(obs2.sharding.device_set) == 8


def test_sharded_rollout_stats(setup):
    env = setup
    B = 64
    vec = make_vec_env(env, B)
    mesh = make_mesh()
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(5))
    carry = RolloutCarry(
        env_state=shard_batch(state, mesh),
        obs=shard_batch(obs, mesh),
        policy_state=(),
        stats=shard_batch(EpisodeStats.create(B), mesh),
    )
    policy = lambda ps, o: (jnp.full((B, 4), 0.084), ps)
    carry, _ = jax.jit(lambda c: rollout(vec, policy, c, 30, collect=False))(carry)
    m = jax.device_get(carry.stats.means())
    # 25-step episodes (0.5 s @ 50 Hz): 30 steps => at least 1 episode per
    # env (a few envs may terminate early out-of-bound and re-reset).
    assert int(m["episodes"]) >= B


def test_shard_map_rollout_fn(setup):
    """sharded_rollout_fn: per-shard local rollout + psum'd global stats."""
    from safe_control_gym_tpu.parallel.rollout import sharded_rollout_fn

    env = setup
    B = 64
    vec = make_vec_env(env, B)
    mesh = make_mesh()
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(5))
    carry = RolloutCarry(
        env_state=shard_batch(state, mesh),
        obs=shard_batch(obs, mesh),
        policy_state=(),
        stats=shard_batch(EpisodeStats.create(B), mesh),
    )
    # Policy must derive the batch from obs: inside shard_map it sees the
    # local shard (B / n_devices).
    policy = lambda ps, o: (jnp.full((o.shape[0], 4), 0.084), ps)
    run = sharded_rollout_fn(vec, policy, 30, mesh)
    carry, stats = run(carry)
    stats = jax.device_get(stats)
    assert int(stats["episodes"]) >= B
    assert np.isfinite(stats["mean_return"])

    # Cross-check against the single-device rollout on identical inputs.
    state1, obs1, _ = jax.jit(vec.reset)(jax.random.key(5))
    carry1 = RolloutCarry(state1, obs1, (), EpisodeStats.create(B))
    carry1, _ = jax.jit(lambda c: rollout(vec, policy, c, 30, collect=False))(carry1)
    m1 = jax.device_get(carry1.stats.means())
    assert int(stats["episodes"]) == int(m1["episodes"])
    np.testing.assert_allclose(stats["mean_return"], m1["mean_return"], rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_gate_on_cpu_mesh():
    """The driver's multichip dryrun doubles as a sharded correctness gate
    (VERDICT r3 item 6): whole-rollout Pallas kernels under shard_map
    step-equal vs unsharded, update-kernel psum'd grads equal vs the
    sequential sum, and a sharded PPO train step — all on the 8-device
    virtual CPU mesh (same entry the driver runs)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)  # raises on any path failing its assertions
