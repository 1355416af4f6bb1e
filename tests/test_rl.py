"""RL + safety controller tests.

Learning checks are kept small (CI-sized); PPO must demonstrably improve,
the rest must run their jitted train steps and produce finite metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.controllers.sac import SAC
from safe_control_gym_tpu.controllers.ddpg import DDPG
from safe_control_gym_tpu.controllers.safe_explorer import SafeExplorerPPO
from safe_control_gym_tpu.controllers.rarl import RARL, RAP
from safe_control_gym_tpu.controllers.cbf import CBF_QP

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



def _cartpole(**kw):
    cfg = dict(
        task="stabilization",
        cost="rl_reward",
        normalized_rl_action_space=True,
        randomized_init=True,
        episode_len_sec=5,
    )
    cfg.update(kw)
    return make_cartpole(CartPoleConfig(**cfg))


def test_ppo_learns_cartpole():
    env = _cartpole()
    ppo = PPO(env, seed=0, rollout_batch_size=16, rollout_steps=100, opt_epochs=6,
              mini_batch_size=256, use_gae=True)
    r0 = ppo.run(num_episodes=8, seed=1)["ep_returns"].mean()
    for _ in range(20):
        ppo.state, m = ppo._train_step(ppo.state)
    r1 = ppo.run(num_episodes=8, seed=1)["ep_returns"].mean()
    assert r1 > r0 * 1.5, f"{r0} -> {r1}"
    assert np.isfinite(float(jax.device_get(m["approx_kl"])))


def test_sac_runs_and_improves():
    env = _cartpole()
    sac = SAC(env, seed=0, rollout_batch_size=4, train_interval=100, warm_up_steps=400,
              train_batch_size=256, max_buffer_size=20000, updates_per_step=10,
              use_entropy_tuning=True)
    r0 = sac.run(num_episodes=8, seed=1)["ep_returns"].mean()
    for _ in range(80):
        sac.state, m = sac._train_step(sac.state)
    r1 = sac.run(num_episodes=8, seed=1)["ep_returns"].mean()
    m = jax.device_get(m)
    assert np.isfinite(m["critic_loss"]) and np.isfinite(m["actor_loss"])
    assert r1 > r0, f"{r0} -> {r1}"


def test_ddpg_train_step_runs():
    env = _cartpole()
    ddpg = DDPG(env, seed=0, rollout_batch_size=4, train_interval=100,
                warm_up_steps=400, train_batch_size=64, max_buffer_size=20000)
    for _ in range(5):
        ddpg.state, m = ddpg._train_step(ddpg.state)
    m = jax.device_get(m)
    assert np.isfinite(m["critic_loss"]) and np.isfinite(m["actor_loss"])
    a = ddpg.select_action(np.zeros(4))
    assert a.shape == (1,) and np.isfinite(a).all()


def test_safe_explorer_ppo():
    env = _cartpole(
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state",
             "upper_bounds": [1.0, 10.0, 0.3, 10.0], "lower_bounds": [-1.0, -10.0, -0.3, -10.0]},
        )
    )
    sppo = SafeExplorerPPO(env, seed=0, rollout_batch_size=8, rollout_steps=50,
                           opt_epochs=2, mini_batch_size=100, pretrain_steps=60)
    res = sppo.pretrain()
    assert np.isfinite(res["pretrain_loss"])
    sppo.state, m = sppo._train_step(sppo.state)
    assert np.isfinite(float(jax.device_get(m["policy_loss"])))


def test_rarl_and_rap_phases():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2, task="stabilization", cost="rl_reward",
            normalized_rl_action_space=True, adversary_disturbance="dynamics",
            episode_len_sec=2, ctrl_freq=25, pyb_freq=50,
        )
    )
    rarl = RARL(env, seed=0, rollout_batch_size=4, rollout_steps=25, opt_epochs=2,
                mini_batch_size=50)
    s, m = rarl._train_pro(rarl.state)
    s, m2 = rarl._train_adv(s)
    rarl.state = s
    assert np.isfinite(float(jax.device_get(m["kl"])))
    a = rarl.select_action(np.zeros(6))
    assert a.shape == (2,)

    rap = RAP(env, seed=0, num_adversaries=3, rollout_batch_size=4, rollout_steps=25,
              opt_epochs=2, mini_batch_size=50)
    s, m = rap._train_pro(rap.state)
    s, _ = rap._train_adv(s)
    assert np.isfinite(float(jax.device_get(m["kl"])))


def test_cbf_qp_certifies():
    env = _cartpole(normalized_rl_action_space=False)
    cbf = CBF_QP(env, slope=0.5, soft_constrained=True)
    # A state well inside the safe set: any action should stay ~unchanged if
    # safe, and the certified action must respect input bounds.
    x = np.array([0.1, 0.1, 0.05, 0.0], np.float32)
    u_des = np.array([3.0], np.float32)
    u, success = cbf.certify_action(x, u_des, use_learned_model=False)
    assert np.isfinite(u).all() and abs(u[0]) <= 10.0 + 1e-3
    # Near the boundary moving outward, the filter must intervene.
    xb = np.array([2.3, 1.8, 0.0, 0.0], np.float32)
    ub_, _ = cbf.certify_action(xb, np.array([10.0], np.float32), use_learned_model=False)
    assert ub_[0] < 10.0 - 1e-3  # pulled back from the unsafe command
    # Residual training runs.
    res = cbf.learn(max_samples=100, epochs=10)
    assert np.isfinite(res["residual_loss"])


def test_gp_fit_predict():
    from safe_control_gym_tpu.ops.gp import gp_fit, gp_predict

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(80, 2)).astype(np.float32)
    Y = np.stack([np.sin(X[:, 0]), np.cos(X[:, 1])], -1).astype(np.float32)
    state = gp_fit(jnp.asarray(X), jnp.asarray(Y), iters=150)
    Xq = rng.uniform(-1.5, 1.5, size=(30, 2)).astype(np.float32)
    mean, var = gp_predict(state, jnp.asarray(Xq))
    want = np.stack([np.sin(Xq[:, 0]), np.cos(Xq[:, 1])], -1)
    assert np.abs(np.asarray(mean) - want).max() < 0.15
    assert np.all(np.asarray(var) > 0)


def test_cbf_higher_dim_barrier():
    """Generalized ellipsoidal barrier over 4 state dims on the cartpole
    (position, velocity, angle, angular rate tube)."""
    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole

    env = make_cartpole(CartPoleConfig(ctrl_freq=50, pyb_freq=50, episode_len_sec=2))
    cbf = CBF_QP(
        env, slope=0.5, soft_constrained=True,
        barrier_dims=(0, 1, 2, 3), barrier_bounds=(1.0, 2.0, 0.3, 1.0),
    )
    # Barrier geometry: positive inside, negative outside.
    assert float(cbf.barrier(jnp.zeros(4))) == 0.5
    assert float(cbf.barrier(jnp.asarray([1.0, 0.0, 0.0, 0.0]))) <= 0.0
    assert float(cbf.barrier(jnp.asarray([0.0, 0.0, 0.3, 0.0]))) <= 0.0
    # Certification runs on the 4D barrier.
    u, success = cbf.certify_action(
        np.array([0.2, 0.1, 0.02, 0.0], np.float32),
        np.array([1.0], np.float32),
        use_learned_model=False,
    )
    assert np.isfinite(np.asarray(u)).all()
    # Grid check over the 4D barrier box (coarse grid to keep it quick).
    ok, infeasible = cbf.is_cbf(num_points=5)
    assert isinstance(ok, bool)


def test_rarl_on_cartpole():
    """The reference's canonical RARL task is cartpole; the adversary channel
    is env-generic (benchmark_env.py:256-266)."""
    env = _cartpole(adversary_disturbance="dynamics",
                    adversary_disturbance_scale=0.1, episode_len_sec=2)
    rarl = RARL(env, seed=0, rollout_batch_size=4, rollout_steps=25, opt_epochs=2,
                mini_batch_size=50)
    s, m = rarl._train_pro(rarl.state)
    s, _ = rarl._train_adv(s)
    assert np.isfinite(float(jax.device_get(m["kl"])))
    rarl.state = s
    a = rarl.select_action(np.zeros(4))
    assert a.shape == (1,)

    env2 = _cartpole(adversary_disturbance="action", episode_len_sec=2)
    rarl2 = RARL(env2, seed=0, rollout_batch_size=4, rollout_steps=25, opt_epochs=2,
                 mini_batch_size=50)
    s2, m2 = rarl2._train_pro(rarl2.state)
    assert np.isfinite(float(jax.device_get(m2["kl"])))


def test_ppo_fused_update_matches_separate():
    """fused_update=True computes gradients through ONE 2H-wide block-diag
    network; params after several train steps equal the separate-net path to
    fp tolerance (disjoint params + additive losses => identical math)."""
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5],
                   "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
    ))
    outs = {}
    for fused in (False, True):
        ppo = PPO(env, seed=0, rollout_batch_size=64, rollout_steps=16,
                  opt_epochs=3, mini_batch_size=256, fused_update=fused)
        s = ppo.state
        for _ in range(3):
            s, m = ppo._train_step(s)
        outs[fused] = jax.device_get((s.ac.actor_params, s.ac.critic_params,
                                      s.ac.logstd))
    for xa, xb in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(xa, xb, rtol=2e-4, atol=1e-6)


def test_ppo_train_many_chunk_matches_loop():
    """train_many(n) (one dispatch per n train steps) advances the state
    exactly like n sequential _train_step calls."""
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5],
                   "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
    ))
    ppo = PPO(env, seed=0, rollout_batch_size=32, rollout_steps=8,
              opt_epochs=2, mini_batch_size=64)
    s_loop = ppo.state
    for _ in range(3):
        s_loop, m_loop = ppo._train_step(s_loop)
    s_chunk, m_chunk = ppo.train_many(3)(ppo.state)
    assert int(jax.device_get(s_chunk.total_steps)) == \
        int(jax.device_get(s_loop.total_steps))
    for xa, xb in zip(jax.tree.leaves(jax.device_get(s_loop.ac)),
                      jax.tree.leaves(jax.device_get(s_chunk.ac))):
        np.testing.assert_allclose(xa, xb, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(jax.device_get(m_loop["policy_loss"])),
        float(jax.device_get(m_chunk["policy_loss"])), rtol=1e-4)


@pytest.mark.parametrize("cls,kw", [
    (SAC, dict(rollout_batch_size=4, train_interval=40, warm_up_steps=80,
               train_batch_size=64, max_buffer_size=2000, updates_per_step=2)),
    (DDPG, dict(rollout_batch_size=4, train_interval=40, warm_up_steps=80,
                train_batch_size=64, max_buffer_size=2000, updates_per_step=2)),
])
def test_offpolicy_train_many_chunk_matches_loop(cls, kw):
    """The BaseController train_many scan (chunked dispatch, one round trip
    per n train steps) advances SAC/DDPG exactly like n sequential steps."""
    env = _cartpole()
    agent = cls(env, seed=0, **kw)
    s_loop = agent.state
    for _ in range(3):
        s_loop, m_loop = agent._train_step(s_loop)
    s_chunk, m_chunk = agent.train_many(3)(agent.state)
    for xa, xb in zip(jax.tree.leaves(jax.device_get(s_loop.critic_params)),
                      jax.tree.leaves(jax.device_get(s_chunk.critic_params))):
        np.testing.assert_allclose(xa, xb, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(jax.device_get(m_loop["critic_loss"])),
        float(jax.device_get(m_chunk["critic_loss"])), rtol=1e-4)
