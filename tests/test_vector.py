"""Vectorized env: auto-reset semantics, batch-layout independence, scan rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout


def _mk_env():
    return make_cartpole(
        CartPoleConfig(episode_len_sec=0.2, ctrl_freq=50, pyb_freq=50)
    )  # 10-step episodes -> fast time-limit dones


def test_autoreset_semantics():
    """On done: returned obs is the fresh reset obs; terminal_observation
    carries the true final obs (reference dummy_vec_env.py:40-47)."""
    env = _mk_env()
    vec = make_vec_env(env, num_envs=4)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    step = jax.jit(vec.step)
    actions = jnp.zeros((4, 1))
    for t in range(9):
        state, obs, rew, done, info = step(state, actions)
        assert not bool(done.any())
    state, obs, rew, done, info = step(state, actions)
    assert bool(done.all()), "time limit must trigger at step 10"
    assert bool(info["TimeLimit.truncated"].all())
    # Fresh episode state: counters restarted.
    assert int(state.ctrl_step[0]) == 0
    # Reset obs differs from terminal obs.
    assert not np.allclose(np.asarray(obs), np.asarray(info["terminal_observation"]))


def test_batch_layout_bitwise_independence():
    """Env i's trajectory is a pure function of its own reset key: running it
    alone or inside any batch gives bit-identical states."""
    env = make_quadrotor(QuadrotorConfig(quad_type=2, randomized_inertial_prop=True))
    key = jax.random.key(123)
    keys = jax.random.split(key, 8)
    vstate, vobs, _ = jax.jit(jax.vmap(env.reset))(keys)
    sstate, sobs, _ = jax.jit(env.reset)(keys[3])
    assert np.array_equal(np.asarray(vobs[3]), np.asarray(sobs))
    actions = jnp.tile(jnp.asarray([0.08, 0.09]), (8, 1))
    vstep = jax.jit(jax.vmap(env.step))
    sstep = jax.jit(env.step)
    for _ in range(5):
        vstate, vobs, vr, vd, _ = vstep(vstate, actions)
        sstate, sobs, sr, sd, _ = sstep(sstate, actions[3])
    assert np.array_equal(np.asarray(vstate.x[3]), np.asarray(sstate.x))
    assert np.array_equal(np.asarray(vobs[3]), np.asarray(sobs))


def test_scan_rollout_and_stats():
    env = _mk_env()
    B = 16
    vec = make_vec_env(env, B)
    state, obs, _ = vec.reset(jax.random.key(1))
    carry = RolloutCarry(
        env_state=state,
        obs=obs,
        policy_state=(),
        stats=EpisodeStats.create(B),
    )
    policy = lambda ps, o: (jnp.zeros((B, 1)), ps)

    @jax.jit
    def run(c):
        return rollout(vec, policy, c, num_steps=25)

    carry, traj = run(carry)
    assert traj["reward"].shape == (25, B)
    m = jax.device_get(carry.stats.means())
    # 10-step episodes: 25 steps => 2 completed episodes per env.
    assert int(m["episodes"]) == 2 * B
    assert np.isclose(float(m["mean_length"]), 10.0)


def test_scan_matches_python_loop():
    """The scanned rollout must equal the step-by-step loop bitwise."""
    env = _mk_env()
    vec = make_vec_env(env, 4)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(2))
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(4))
    policy = lambda ps, o: (jnp.full((4, 1), 0.5), ps)
    carry2, traj = jax.jit(lambda c: rollout(vec, policy, c, 12))(carry)
    s, o = state, obs
    step = jax.jit(vec.step)
    for t in range(12):
        s, o, r, d, i = step(s, jnp.full((4, 1), 0.5))
        assert np.array_equal(np.asarray(r), np.asarray(traj["reward"][t]))
    assert np.array_equal(np.asarray(s.x), np.asarray(carry2.env_state.x))
