"""Planar (1D/2D) quadrotor whole-rollout Pallas engine vs the general
engine (parallel/fast_quad_planar.py) — BASELINE config 3 in one kernel
dispatch.  Mirrors tests/test_fast_cartpole.py: step dynamics/reward/done
match on reset-free segments, and reset draws replay the shared
counter-based stream (ops/ctr_prng.py, quadrotor._reset_core slots) so
trajectories stay step-equal THROUGH auto-resets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.fast_quad_planar import (
    FastPlanarQuadRollout,
    supports,
)
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard

B = 1024


def _cfg(**kw):
    base = dict(quad_type=2, ctrl_freq=50, pyb_freq=200, episode_len_sec=4,
                task="stabilization",
                task_info={"stabilization_goal": [0, 1],
                           "stabilization_goal_tolerance": 0.05},
                cost="rl_reward", randomized_init=True,
                randomized_inertial_prop=True, done_on_out_of_bound=True)
    base.update(kw)
    return QuadrotorConfig(**base)


def test_supports_envelope():
    assert supports(_cfg())  # config 3: 2D stabilization + DR
    assert supports(_cfg(quad_type=1))
    assert supports(_cfg(cost="quadratic"))
    assert supports(_cfg(
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "zx",
                   "trajectory_position_offset": [0.5, 0.0],
                   "trajectory_scale": 0.5, "num_cycles": 1}))
    assert supports(_cfg(disturbances={
        "action": ({"disturbance_func": "white_noise", "std": 0.01},),
        "dynamics": ({"disturbance_func": "impulse", "magnitude": 0.02,
                      "duration": 4, "decay_rate": 0.9},)}))
    assert not supports(_cfg(quad_type=3))  # 3D is fast_env's
    assert not supports(_cfg(physics="pyb_gnd"))
    assert not supports(_cfg(adversary_disturbance="dynamics"))
    assert not supports(_cfg(obs_goal_horizon=2))  # plain rollout engine
    # The policy-in-kernel engine evaluates goal-horizon rows in-kernel
    # (rl_reward only, same as fast_env.supports).
    assert supports(_cfg(obs_goal_horizon=2), allow_goal_horizon=True)
    assert not supports(_cfg(obs_goal_horizon=2, cost="quadratic"),
                        allow_goal_horizon=True)
    assert not supports(_cfg(done_on_violation=True))
    assert not supports(_cfg(constraints=(
        {"constraint_form": "linear_constraint", "constrained_variable": "state",
         "A": [[1.0, 0, 0, 0, 0, 0]], "b": [1.0]},)))
    assert not supports(_cfg(normalized_rl_action_space=True))
    assert supports(_cfg(normalized_rl_action_space=True), allow_normalized=True)


def _run_both(cfg, steps, thrust, seed=0, pack_state=None):
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(seed))
    if pack_state is not None:
        state = pack_state(state)
    fr = FastPlanarQuadRollout(env, B, steps_per_call=steps, interpret=True)
    nu = fr.nu
    rows_out = fr.run(fr.pack(state), np.full(nu, thrust), seed=0)
    act = jnp.full((B, nu), thrust, jnp.float32)
    carry = RolloutCarry(state, obs[:, :fr.nx], (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)
    return fr, rows_out, carry


def test_2d_dynamics_reward_match_general_engine():
    """Reset-free segment: identical trajectories and return accumulators."""
    cfg = _cfg(randomized_init=False, randomized_inertial_prop=False,
               init_state=[0.0, 0.0, 1.0, 0.0, 0.05, 0.0])
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    fr, rows_out, carry = _run_both(cfg, 12, hover * 1.02)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    L = fr.params["_L"]
    r = np.asarray(rows_out[L["STATS"]]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return), rtol=2e-4)
    assert np.asarray(rows_out[L["STATS"] + 3]).sum() == 0  # no env terminated


def test_1d_dynamics_match_general_engine():
    cfg = _cfg(quad_type=1, randomized_init=False,
               randomized_inertial_prop=False, init_state=[1.0, 0.0])
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    fr, rows_out, carry = _run_both(cfg, 15, hover * 0.98)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    L = fr.params["_L"]
    r = np.asarray(rows_out[L["STATS"]]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return), rtol=2e-4)


def test_2d_tracking_quadratic_cost_matches():
    """figure8 on the zx plane with quadratic cost: closed-form in-kernel
    reference matches the general engine's precomputed X_GOAL table."""
    cfg = _cfg(task="traj_tracking",
               task_info={"trajectory_type": "figure8",
                          "trajectory_plane": "zx",
                          "trajectory_position_offset": [1.0, 0.0],
                          "trajectory_scale": 0.4, "num_cycles": 1},
               cost="quadratic", randomized_init=False,
               randomized_inertial_prop=False,
               init_state=[0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
               q_weight=[1.0, 0.1, 1.0, 0.1, 0.5, 0.1], r_weight=[0.05, 0.05])
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    fr, rows_out, carry = _run_both(cfg, 15, hover)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    L = fr.params["_L"]
    r = np.asarray(rows_out[L["STATS"]]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return),
                               rtol=2e-4, atol=2e-5)


def test_trajectory_equality_across_engines_with_resets():
    """Seeded rollout WITH resets is step-equal across engines: reset draws
    (init state, mass/inertia, impulse offsets) replay bit-identically from
    the shared counter stream (quadrotor._reset_core slot layout)."""
    cfg = _cfg(episode_len_sec=0.2,  # 10-step episodes: ~2 resets in 25
               done_on_out_of_bound=False,
               disturbances={"dynamics": ({"disturbance_func": "impulse",
                                           "magnitude": 0.02, "duration": 4,
                                           "decay_rate": 0.8},)})
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    steps = 25

    fr = FastPlanarQuadRollout(env, B, steps_per_call=steps, interpret=True)
    rows0 = fr.reset(seed=0)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    L = fr.params["_L"]

    np.testing.assert_allclose(fr.states(rows0), np.asarray(state.x),
                               rtol=1e-6, atol=2e-7)
    np.testing.assert_allclose(
        np.asarray(rows0[L["MASS"]]).reshape(B), np.asarray(state.mass), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rows0[L["IYY"]]).reshape(B),
        np.asarray(state.j_diag)[:, 1], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows0[L["OFFSET"]]).reshape(B),
        np.asarray(state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))

    hover = float(env.u_goal[0])
    rows_out = fr.run(rows0, np.full(2, hover), seed=0)
    act = jnp.full((B, 2), hover, jnp.float32)
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)

    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(rows_out[L["MASS"]]).reshape(B),
        np.asarray(carry.env_state.mass), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows_out[L["OFFSET"]]).reshape(B),
        np.asarray(carry.env_state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))
    np.testing.assert_array_equal(
        np.asarray(rows_out[L["EP"]]).reshape(B),
        np.asarray(carry.env_state.episode_idx, np.float32))


def test_input_constraint_violations_match_general_engine():
    """Input box rows counted in-kernel on the raw commanded action."""
    probe = make_quadrotor(_cfg())
    hover = float(probe.u_goal[0])
    specs = (
        {"constraint_form": "default_constraint", "constrained_variable": "state"},
        {"constraint_form": "bounded_constraint", "constrained_variable": "input",
         "lower_bounds": [0.0, 0.0], "upper_bounds": [hover * 1.05] * 2},
    )
    cfg = _cfg(constraints=specs, randomized_init=False,
               randomized_inertial_prop=False,
               init_state=[0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    assert supports(cfg)
    fr, rows_out, carry = _run_both(cfg, 6, hover * 1.2)  # violates input row
    L = fr.params["_L"]
    viol_fast = np.asarray(rows_out[L["STATS"] + 2]).reshape(B)
    np.testing.assert_array_equal(
        viol_fast, np.asarray(carry.stats.ep_violations))
    assert viol_fast.min() == 6


def test_policy_kernel_forward_matches_xla():
    """Planar-quad policy-in-kernel engine: in-kernel dual-MLP value/logp
    equal the XLA actor/critic forward on the recorded observations and
    actions (mirrors the cartpole/quad3d policy-kernel tests)."""
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_quad_planar import (
        FastPlanarQuadPolicyRollout,
    )

    env = make_quadrotor(_cfg(normalized_rl_action_space=True))
    fp = FastPlanarQuadPolicyRollout(env, B, 8, interpret=True)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=8)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    for k, v in d.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert d["obs"].shape == (8, B, 6) and d["act"].shape == (8, B, 2)

    obs = d["obs"][0]
    np.testing.assert_allclose(
        np.asarray(d["v"][0]), np.asarray(ppo._value(ppo.state.ac, obs)),
        rtol=2e-4, atol=2e-4,
    )
    dist = ppo._dist(ppo.state.ac, obs)
    lp = np.asarray(dist.log_prob(jnp.asarray(d["act"][0])))
    np.testing.assert_allclose(
        np.asarray(d["logp"][0]), lp, rtol=2e-3, atol=2e-3,
    )
    # Exponential RL reward in (0, 1].
    r = np.asarray(d["rew"])
    assert (r > 0).all() and (r <= 1.0).all()
    # First-step obs equal the packed reset states (no noise configured).
    np.testing.assert_allclose(obs, np.asarray(fp.states(rows)),
                               rtol=1e-6, atol=1e-7)


def test_ppo_fast_rollout_trains_planar_quad():
    """PPO(use_fast_rollout) on a 2D quad dispatches to the planar policy
    kernel and runs full train steps with finite losses."""
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_quad_planar import (
        FastPlanarQuadPolicyRollout,
    )

    env = make_quadrotor(_cfg(normalized_rl_action_space=True))
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=8,
              opt_epochs=2, mini_batch_size=B * 4,
              use_fast_rollout=True, fast_interpret=True)
    assert isinstance(ppo._fp, FastPlanarQuadPolicyRollout)
    assert ppo._fu is not None  # generalized update kernel covers these shapes
    s = ppo.state
    for _ in range(2):
        s, m = ppo._train_step(s)
    assert int(jax.device_get(s.total_steps)) == 2 * B * 8
    for k in ("policy_loss", "value_loss", "approx_kl"):
        assert np.isfinite(float(jax.device_get(m[k]))), k


def test_supports_rejects_nonuniform_act_weight():
    """rl_reward applies one scalar action weight in-kernel; per-dim
    vectors must fall back to the general engine unless uniform."""
    assert not supports(_cfg(rew_act_weight=[1.0, 0.1]))
    assert supports(_cfg(rew_act_weight=[0.1, 0.1]))


def test_partial_randomization_info_replaces_defaults():
    """The quadrotor env REPLACES default randomization infos with the
    user's dict (quadrotor.py init_rand/inertial_rand) — a partial
    override must leave the other fields un-randomized in BOTH engines."""
    cfg = _cfg(randomized_init=False,
               init_state=[0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
               inertial_prop_randomization_info={
                   "M": {"distrib": "uniform", "low": 0.022, "high": 0.032}})
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, _, _ = jax.jit(vec.reset)(jax.random.key(0))
    fr = FastPlanarQuadRollout(env, B, steps_per_call=4, interpret=True)
    rows0 = fr.reset(seed=0)
    L = fr.params["_L"]
    # Iyy stays nominal everywhere; mass draws match bit-exactly.
    from safe_control_gym_tpu.envs.quadrotor import J_DIAG
    iyy_gen = np.asarray(state.j_diag)[:, 1]
    np.testing.assert_array_equal(iyy_gen, np.full(B, J_DIAG[1], np.float32))
    np.testing.assert_array_equal(
        np.asarray(rows0[L["IYY"]]).reshape(B), iyy_gen)
    np.testing.assert_allclose(
        np.asarray(rows0[L["MASS"]]).reshape(B), np.asarray(state.mass),
        rtol=1e-6)
    assert np.asarray(state.mass).std() > 1e-4  # M really randomized


def test_policy_kernel_applies_obs_noise():
    """Configured observation white noise feeds the in-kernel policy and
    the recorded obs (the env state stays clean) — it must not be
    silently dropped."""
    from safe_control_gym_tpu.parallel.fast_quad_planar import (
        FastPlanarQuadPolicyRollout,
    )

    cfg = _cfg(normalized_rl_action_space=True, randomized_init=False,
               init_state=[0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
               disturbances={"observation": (
                   {"disturbance_func": "white_noise", "std": 0.05},)})
    assert supports(cfg, allow_normalized=True)
    env = make_quadrotor(cfg)
    fp = FastPlanarQuadPolicyRollout(env, B, 4, interpret=True)
    assert fp.params["obs_noise_std"] == 0.05
    from safe_control_gym_tpu.controllers.ppo import PPO

    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=4)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    _, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    clean = np.asarray(fp.states(rows))
    noisy = np.asarray(d["obs"][0])
    resid = noisy - clean
    assert np.abs(resid).max() > 1e-3  # noise present
    assert abs(resid.std() - 0.05) < 0.01  # ~N(0, 0.05)


def test_goal_horizon_obs_in_kernel_planar():
    """Goal-horizon obs extension (quadrotor._extend_obs,
    benchmark_env.py:406-420) evaluated in-kernel for the PLANAR policy
    engine: recorded obs carry the next-h reference rows exactly as the
    general engine's X_GOAL table gives them, value/logp are computed on the
    extended obs, observe() reproduces the post-rollout extended obs, and
    PPO trains through the fast path (VERDICT r3 item 7)."""
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_quad_planar import (
        FastPlanarQuadPolicyRollout,
    )

    h = 3
    cfg = _cfg(
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "zx",
                   "trajectory_position_offset": [0.5, 0.0],
                   "trajectory_scale": 0.5, "num_cycles": 1},
        normalized_rl_action_space=True,
        obs_goal_horizon=h,
    )
    env = make_quadrotor(cfg)
    assert env.spaces.obs_dim == 6 * (1 + h)
    fp = FastPlanarQuadPolicyRollout(env, B, 4, interpret=True)
    assert fp.obs_dim == 6 * (1 + h)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=4)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    assert d["obs"].shape == (4, B, 24) and d["term_obs"].shape == (4, B, 24)

    # Goal blocks at step t are the table rows clip(t+1 .. t+h) — every env
    # starts at ctrl_step 0 and none terminates within 4 steps.
    xg = np.asarray(env.x_goal, np.float32)
    for t in range(4):
        for i in range(h):
            np.testing.assert_allclose(
                np.asarray(d["obs"][t, :, 6 * (1 + i):6 * (2 + i)]),
                np.broadcast_to(xg[min(t + 1 + i, xg.shape[0] - 1)], (B, 6)),
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
    assert full_obs.shape == (B, 24)
    np.testing.assert_allclose(full_obs[:, :6], np.asarray(fp.states(new_rows)),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        full_obs[:, 6:12], np.broadcast_to(xg[5], (B, 6)), rtol=1e-5, atol=1e-6)

    # PPO trains end-to-end through the fast path on the extended obs.
    ppo_t = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=4,
                opt_epochs=2, mini_batch_size=B * 2,
                use_fast_rollout=True, fast_interpret=True)
    assert isinstance(ppo_t._fp, FastPlanarQuadPolicyRollout)
    s, m = ppo_t._train_step(ppo_t.state)
    for k in ("policy_loss", "value_loss", "approx_kl"):
        assert np.isfinite(float(jax.device_get(m[k]))), k

    # Stabilization variant appends the static goal once (mul=2).
    cfg_s = _cfg(normalized_rl_action_space=True, obs_goal_horizon=2)
    env_s = make_quadrotor(cfg_s)
    assert env_s.spaces.obs_dim == 12
    fp_s = FastPlanarQuadPolicyRollout(env_s, B, 2, interpret=True)
    assert fp_s.obs_dim == 12
    ppo_s = PPO(env_s, seed=0, rollout_batch_size=B, rollout_steps=2)
    w_s = fp_s.pack_weights(ppo_s.state.ac.actor_params,
                            ppo_s.state.ac.critic_params, ppo_s.state.ac.logstd)
    _, traj_s = fp_s.run(fp_s.reset(0), w_s, seed=1)
    d_s = fp_s.unpack_traj(traj_s)
    xg_s = np.asarray(env_s.x_goal, np.float32)
    np.testing.assert_allclose(
        np.asarray(d_s["obs"][0, :, 6:]), np.broadcast_to(xg_s, (B, 6)),
        rtol=1e-6, atol=1e-7)
