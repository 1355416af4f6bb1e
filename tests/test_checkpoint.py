"""Checkpoint/resume: bitwise-identical continuation from a saved PyTree
(SURVEY §5: orbax-style snapshot of training+env state incl. PRNG keys)."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_bitwise_resume(tmp_path):
    env = make_cartpole(
        CartPoleConfig(
            task="stabilization", cost="rl_reward", normalized_rl_action_space=True,
            episode_len_sec=2,
        )
    )
    ppo = PPO(env, seed=0, rollout_batch_size=4, rollout_steps=20, opt_epochs=2,
              mini_batch_size=40)
    # Advance, snapshot, advance twice more.
    ppo.state, _ = ppo._train_step(ppo.state)
    path = str(tmp_path / "ckpt_1.pkl")
    save_checkpoint(path, ppo.state, step=1)
    s_a = ppo.state
    for _ in range(2):
        s_a, _ = ppo._train_step(s_a)

    # Restore and replay.
    restored, step, _ = load_checkpoint(path)
    assert step == 1
    s_b = jax.tree.map(jnp.asarray, restored)
    for _ in range(2):
        s_b, _ = ppo._train_step(s_b)

    # Bitwise-identical continuation: params, env state, normalizers, keys.
    def as_np(x):
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for leaf_a, leaf_b in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(as_np(leaf_a), as_np(leaf_b))


def test_env_state_checkpoint_roundtrip(tmp_path):
    """The env state alone is also a complete resume artifact."""
    env = make_cartpole(CartPoleConfig(episode_len_sec=2))
    state, obs, _ = jax.jit(env.reset)(jax.random.key(3))
    step = jax.jit(env.step)
    state, *_ = step(state, jnp.asarray([1.0]))
    path = str(tmp_path / "env.pkl")
    save_checkpoint(path, state)
    restored, _, _ = load_checkpoint(path)
    restored = jax.tree.map(jnp.asarray, restored)
    s1, o1, r1, d1, _ = step(state, jnp.asarray([0.5]))
    s2, o2, r2, d2, _ = step(restored, jnp.asarray([0.5]))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(r1) == float(r2)
