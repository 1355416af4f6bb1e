"""Policy-in-kernel whole-rollout engine (parallel/fast_policy.py).

Interpret-mode validation on CPU: the kernel's MLP forward, sampling
log-probs, reward/done/auto-reset semantics, and the PPO integration.
Real-chip throughput and learning equivalence are exercised by
benchmarks/rl_throughput.py --fast (see docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.parallel.fast_policy import FastPolicyRollout

pytestmark = pytest.mark.slow  # interpret-mode Pallas is minutes-scale

B, T = 1024, 8


def _env(episode_len_sec=2):
    return make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=episode_len_sec,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
        randomized_inertial_prop=True,
    ))


def test_kernel_forward_matches_xla_policy():
    """In-kernel dual MLP value/logp equal the XLA actor/critic forward on
    the recorded observations and actions."""
    env = _env()
    fp = FastPolicyRollout(env, B, T, interpret=True)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=T)
    rows = fp.reset(0)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    for k, v in d.items():
        assert np.isfinite(np.asarray(v)).all(), k

    obs = d["obs"][0]
    np.testing.assert_allclose(
        np.asarray(d["v"][0]), np.asarray(ppo._value(ppo.state.ac, obs)),
        rtol=2e-4, atol=2e-4,
    )
    dist = ppo._dist(ppo.state.ac, obs)
    lp = dist.log_prob(jnp.asarray(d["act"][0]))
    np.testing.assert_allclose(
        np.asarray(d["logp"][0]), np.asarray(lp), rtol=2e-3, atol=2e-3,
    )
    # Exponential reward in (0, 1].
    r = np.asarray(d["rew"])
    assert (r > 0).all() and (r <= 1.0).all()


def test_kernel_step_matches_general_engine():
    """One policy-kernel step from a packed state reproduces the general
    engine's step for the same actions (the kernel's sampled actions are fed
    back through the reference path)."""
    env = _env()
    fp = FastPolicyRollout(env, B, 1, interpret=True)
    rows = fp.reset(0)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=1)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    new_rows, traj = fp.run(rows, w, seed=5)
    d = fp.unpack_traj(traj)
    obs0 = np.asarray(d["obs"][0])
    act0 = np.asarray(d["act"][0])
    done0 = np.asarray(d["done"][0]) > 0

    # General engine step from the same states/actions: rebuild a batched
    # QuadState via the env's reset machinery, overwrite x/params.
    from safe_control_gym_tpu.parallel.vector import make_vec_env

    vec = make_vec_env(env, B)
    st, _, _ = jax.jit(vec.reset)(jax.random.key(1))
    # Overwrite state/physics from the fast rows so both engines step the
    # exact same batch.
    flat = np.asarray(rows).reshape(fp.n_rows, B)
    st = st.replace(
        x=jnp.asarray(obs0),
        mass=jnp.asarray(flat[12]),
        j_diag=jnp.asarray(flat[13:16].T),
        ctrl_step=jnp.asarray(flat[16], jnp.int32),
    )
    _, _, rew_ref, done_ref, _ = jax.jit(vec.step_no_reset)(st, jnp.asarray(act0))
    np.testing.assert_allclose(
        np.asarray(d["rew"][0]), np.asarray(rew_ref), rtol=2e-3, atol=2e-3,
    )
    # Done flags agree except where the general engine's extra channels
    # (goal-stabilization) differ — the envelope has none, so exact.
    np.testing.assert_array_equal(done0, np.asarray(done_ref))


def test_ppo_fast_rollout_trains():
    """PPO with use_fast_rollout runs whole train steps and improves the
    in-rollout reward signal."""
    env = _env()
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=T,
              opt_epochs=2, mini_batch_size=B * T // 2,
              use_fast_rollout=True, fast_interpret=True)
    s = ppo.state
    for _ in range(2):
        s, m = ppo._train_step(s)
    assert int(jax.device_get(s.total_steps)) == 2 * B * T
    for k in ("policy_loss", "value_loss", "approx_kl"):
        assert np.isfinite(float(jax.device_get(m[k]))), k


def test_obs_noise_feeds_policy_and_record():
    """Observation white noise (round-3 envelope): the recorded obs are the
    NOISY channel the policy acted on — they differ from the clean state by
    ~N(0, std) — while the env state itself stays clean, and the in-kernel
    value/logp match the XLA forward on the recorded (noisy) obs."""
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
        disturbances={"observation": (
            {"disturbance_func": "white_noise", "std": 0.05},)},
    ))
    fp = FastPolicyRollout(env, B, 2, interpret=True)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=2)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    clean0 = fp.states(rows)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    noise = np.asarray(d["obs"][0]) - clean0
    # Noise is present on every channel and roughly the configured std.
    assert np.abs(noise).max() > 1e-4
    assert 0.01 < noise.std() < 0.12, noise.std()
    # Value/logp were computed on the recorded noisy obs.
    np.testing.assert_allclose(
        np.asarray(d["v"][0]),
        np.asarray(ppo._value(ppo.state.ac, jnp.asarray(d["obs"][0]))),
        rtol=2e-4, atol=2e-4,
    )


def test_goal_horizon_obs_in_kernel():
    """Goal-horizon obs extension (benchmark_env.py:406-420) evaluated
    in-kernel: the recorded obs carry the next-h reference states exactly as
    the general engine's X_GOAL table gives them, the in-kernel value/logp
    are computed on the extended obs, and observe() reproduces the
    post-rollout extended obs for the GAE bootstrap."""
    h = 3
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
        obs_goal_horizon=h,
    ))
    assert env.spaces.obs_dim == 12 * (1 + h)
    fp = FastPolicyRollout(env, B, 4, interpret=True)
    assert fp.obs_dim == 12 * (1 + h)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=4)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    assert d["obs"].shape == (4, B, 48) and d["term_obs"].shape == (4, B, 48)

    # Goal blocks at step t are the table rows clip(t+1 .. t+h) — every env
    # starts at ctrl_step 0 and none terminates within 4 steps.
    xg = np.asarray(env.x_goal, np.float32)
    for t in range(4):
        for i in range(h):
            np.testing.assert_allclose(
                np.asarray(d["obs"][t, :, 12 * (1 + i):12 * (2 + i)]),
                np.broadcast_to(xg[min(t + 1 + i, xg.shape[0] - 1)], (B, 12)),
                rtol=1e-5, atol=1e-6,
            )
    # Value/logp computed on the extended obs.
    np.testing.assert_allclose(
        np.asarray(d["v"][0]),
        np.asarray(ppo._value(ppo.state.ac, jnp.asarray(d["obs"][0]))),
        rtol=2e-4, atol=2e-4,
    )
    # observe(): post-rollout extended obs (steps advanced to 4).
    full_obs = np.asarray(fp.observe(new_rows))
    assert full_obs.shape == (B, 48)
    np.testing.assert_allclose(full_obs[:, :12], np.asarray(fp.states(new_rows)),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        full_obs[:, 12:24], np.broadcast_to(xg[5], (B, 12)), rtol=1e-5, atol=1e-6)


def test_goal_horizon_ppo_trains_and_stab_variant():
    """PPO with use_fast_rollout trains on a goal-horizon config (fast
    update kernel engages on the extended obs dim), and the stabilization variant
    appends the static goal once (mul=2)."""
    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
        obs_goal_horizon=2,
    ))
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=4,
              opt_epochs=2, mini_batch_size=B * 2,
              use_fast_rollout=True, fast_interpret=True)
    assert ppo._fu is not None  # generalized update kernel covers goal-horizon obs
    s, m = ppo._train_step(ppo.state)
    for k in ("policy_loss", "value_loss", "approx_kl"):
        assert np.isfinite(float(jax.device_get(m[k]))), k

    env_s = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=2,
        task="stabilization",
        task_info={"stabilization_goal": [0, 0, 1],
                   "stabilization_goal_tolerance": 0.05},
        cost="rl_reward", normalized_rl_action_space=True,
        obs_goal_horizon=2,
    ))
    assert env_s.spaces.obs_dim == 24
    fp = FastPolicyRollout(env_s, B, 2, interpret=True)
    assert fp.obs_dim == 24
    ppo_s = PPO(env_s, seed=0, rollout_batch_size=B, rollout_steps=2)
    w = fp.pack_weights(ppo_s.state.ac.actor_params, ppo_s.state.ac.critic_params,
                        ppo_s.state.ac.logstd)
    _, traj = fp.run(fp.reset(0), w, seed=1)
    d = fp.unpack_traj(traj)
    xg = np.asarray(env_s.x_goal, np.float32)
    np.testing.assert_allclose(
        np.asarray(d["obs"][0, :, 12:]), np.broadcast_to(xg, (B, 12)),
        rtol=1e-6, atol=1e-7)


def test_obs_noise_on_terminal_and_bootstrap_obs():
    """The truncation-bootstrap channel matches the general engine: stored
    terminal observations and the post-rollout bootstrap obs carry the obs
    white noise (quadrotor._obs of the new/final state, quadrotor.py:1031),
    not the clean state.

    With zero policy weights and logstd=-20 the actions are ~0 regardless of
    the (noisy) observations, so the state trajectory is noise-invariant: a
    second run with std=0 provides the clean reference (interpret-mode draws
    are salted per call site, so shared-salt draws replay identically across
    the two configs)."""
    def build(std):
        dist = {"observation": (
            {"disturbance_func": "white_noise", "std": std},)} if std else None
        env = make_quadrotor(QuadrotorConfig(
            quad_type=3, ctrl_freq=4, pyb_freq=16, episode_len_sec=1,
            task="traj_tracking",
            task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                       "trajectory_position_offset": [0, 0],
                       "trajectory_scale": 1.0, "num_cycles": 1,
                       "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
            cost="rl_reward", normalized_rl_action_space=True,
            disturbances=dist,
        ))
        fp = FastPolicyRollout(env, B, 8, interpret=True)
        ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=8)
        zero_ac = jax.tree.map(jnp.zeros_like, ppo.state.ac)
        w = fp.pack_weights(zero_ac.actor_params, zero_ac.critic_params,
                            jnp.full(4, -20.0))
        rows = fp.reset(0)
        new_rows, traj = fp.run(rows, w, seed=3)
        return fp, new_rows, fp.unpack_traj(traj)

    std = 0.05
    fp_n, rows_n, d_n = build(std)
    fp_c, rows_c, d_c = build(0.0)
    trunc = np.asarray(d_n["trunc"])
    assert trunc.sum() > 0, "horizon never crossed; test misconfigured"
    # Identical trajectories up to the ~exp(-20) action jitter.
    np.testing.assert_allclose(np.asarray(d_n["rew"]), np.asarray(d_c["rew"]),
                               rtol=1e-4, atol=1e-5)
    # Terminal obs at truncation steps = clean post-step state + fresh noise.
    m = trunc > 0.0
    diff = (np.asarray(d_n["term_obs"])[m][:, :12]
            - np.asarray(d_c["term_obs"])[m][:, :12])
    assert np.abs(diff).max() > 1e-4, "terminal obs carries no noise"
    assert 0.5 * std < diff.std() < 2.0 * std, diff.std()
    # Goal-extension rows stay clean.
    if d_n["term_obs"].shape[-1] > 12:
        np.testing.assert_allclose(np.asarray(d_n["term_obs"])[m][:, 12:],
                                   np.asarray(d_c["term_obs"])[m][:, 12:],
                                   rtol=1e-4, atol=1e-5)
    # Bootstrap obs: observe(rows, key) noises the state part like _obs.
    key = jax.random.key(7)
    ob_n = np.asarray(fp_n.observe(rows_n, key=key))
    ob_plain = np.asarray(fp_n.observe(rows_n))
    dob = (ob_n - ob_plain)[:, :12]
    assert 0.5 * std < dob.std() < 2.0 * std, dob.std()
    # Without noise configured, the key is a no-op.
    np.testing.assert_array_equal(np.asarray(fp_c.observe(rows_c, key=key)),
                                  np.asarray(fp_c.observe(rows_c)))
