"""CartPole whole-rollout Pallas engine vs the general engine
(parallel/fast_cartpole.py) — mirrors tests/test_fast_env.py for the
quadrotor: step dynamics/reward/done match exactly on reset-free segments,
and reset draws replay the shared counter-based stream (ops/ctr_prng.py) so
trajectories stay step-equal THROUGH auto-resets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.fast_cartpole import (
    FastCartPoleRollout,
    supports,
)
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard

B = 1024


def _cfg(**kw):
    base = dict(ctrl_freq=50, pyb_freq=50, episode_len_sec=4,
                task="stabilization", cost="rl_reward",
                randomized_init=True, done_on_out_of_bound=True)
    base.update(kw)
    return CartPoleConfig(**base)


def test_supports_envelope():
    assert supports(_cfg())
    assert supports(_cfg(task="traj_tracking"))  # default circle/zx plane
    assert supports(_cfg(cost="quadratic", randomized_inertial_prop=True))
    assert supports(_cfg(disturbances={
        "action": ({"disturbance_func": "white_noise", "std": 0.1},),
        "dynamics": ({"disturbance_func": "impulse", "magnitude": 0.5,
                      "duration": 4, "decay_rate": 0.9},)}))
    assert not supports(_cfg(adversary_disturbance="dynamics"))
    assert not supports(_cfg(obs_goal_horizon=2))
    assert not supports(_cfg(done_on_violation=True))
    assert not supports(_cfg(disturbances={
        "dynamics": ({"disturbance_func": "white_noise", "std": 0.1},)}))
    assert not supports(_cfg(normalized_rl_action_space=True))
    assert supports(_cfg(normalized_rl_action_space=True), allow_normalized=True)


def _run_both(cfg, steps, force, seed=0, pack_state=None):
    env = make_cartpole(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(seed))
    if pack_state is not None:
        state = pack_state(state)
    fr = FastCartPoleRollout(env, B, steps_per_call=steps, interpret=True)
    rows_out = fr.run(fr.pack(state), np.asarray([force]), seed=0)
    act = jnp.full((B, 1), force, jnp.float32)
    carry = RolloutCarry(state, obs[:, :4], (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)
    return fr, rows_out, carry


def test_dynamics_reward_match_general_engine():
    """Reset-free segment: identical trajectories and return accumulators."""
    fr, rows_out, carry = _run_both(
        _cfg(randomized_init=False, init_state=[0.0, 0.0, 0.05, 0.0]),
        12, 0.4)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    r = np.asarray(rows_out[9]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return), rtol=2e-4)
    assert np.asarray(rows_out[12]).sum() == 0  # no env terminated


def test_tracking_quadratic_cost_matches():
    """Default circle trajectory (zx plane: x-axis = scale*sin(wt)) with
    quadratic cost — closed-form in-kernel reference matches the general
    engine's precomputed X_GOAL table."""
    fr, rows_out, carry = _run_both(
        _cfg(task="traj_tracking", cost="quadratic",
             randomized_init=False, init_state=[0.0, 0.1, 0.02, 0.0],
             q_weight=[1.0, 0.1, 1.0, 0.1], r_weight=[0.05]),
        15, 0.2)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    r = np.asarray(rows_out[9]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return),
                               rtol=2e-4, atol=2e-5)


def test_impulse_disturbance_matches():
    """Impulse schedule math matches given the same per-episode offsets."""
    def fix_offsets(state):
        sched = dict(state.dist_sched)
        dyn = dict(sched["dynamics"])
        dyn["offsets"] = jnp.full_like(dyn["offsets"], 3)
        sched["dynamics"] = dyn
        return state.replace(dist_sched=sched)

    fr, rows_out, carry = _run_both(
        _cfg(randomized_init=False, init_state=[0.0, 0.0, 0.03, 0.0],
             disturbances={"dynamics": ({"disturbance_func": "impulse",
                                         "magnitude": 1.5, "duration": 6,
                                         "decay_rate": 0.8},)}),
        10, 0.0, seed=3, pack_state=fix_offsets)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)


def test_trajectory_equality_across_engines_with_resets():
    """Seeded rollout WITH resets is step-equal across engines: reset draws
    (init state, inertia, impulse offsets) replay bit-identically from the
    shared counter stream (slots 0..7, cartpole._reset_core)."""
    cfg = _cfg(episode_len_sec=0.12,  # 6-step episodes: ~3 resets in 20
               done_on_out_of_bound=False,
               randomized_inertial_prop=True,
               disturbances={"dynamics": ({"disturbance_func": "impulse",
                                           "magnitude": 0.4, "duration": 4,
                                           "decay_rate": 0.8},)})
    env = make_cartpole(cfg)
    vec = make_vec_env(env, B)
    steps = 20

    fr = FastCartPoleRollout(env, B, steps_per_call=steps, interpret=True)
    rows0 = fr.reset(seed=0)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))

    np.testing.assert_allclose(fr.states(rows0), np.asarray(state.x),
                               rtol=1e-6, atol=2e-7)
    np.testing.assert_allclose(
        np.asarray(rows0[4]).reshape(B), np.asarray(state.pole_length), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows0[8]).reshape(B),
        np.asarray(state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))

    rows_out = fr.run(rows0, np.asarray([0.0]), seed=0)
    act = jnp.zeros((B, 1), jnp.float32)
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)

    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(rows_out[4]).reshape(B),
        np.asarray(carry.env_state.pole_length), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows_out[8]).reshape(B),
        np.asarray(carry.env_state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))
    np.testing.assert_array_equal(
        np.asarray(rows_out[17]).reshape(B),
        np.asarray(carry.env_state.episode_idx, np.float32))


def test_auto_reset_statistics_agree():
    """With action white noise (engine-specific streams by design) episode
    statistics agree to a few percent over many episodes."""
    cfg = _cfg(episode_len_sec=1.0,
               disturbances={"action": ({"disturbance_func": "white_noise",
                                         "std": 0.3},)})
    env = make_cartpole(cfg)
    vec = make_vec_env(env, B)
    steps = 120

    fr = FastCartPoleRollout(env, B, steps_per_call=steps, interpret=True)
    rows_out = fr.run(fr.reset(seed=0), np.asarray([0.0]), seed=7)
    fast = fr.stats(rows_out)

    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    act = jnp.zeros((B, 1), jnp.float32)
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)
    st = carry.stats
    n = max(float(np.asarray(st.done_count).sum()), 1.0)
    gen = {
        "episodes": float(np.asarray(st.done_count).sum()),
        "mean_return": float(np.asarray(st.sum_return).sum() / n),
        "mean_length": float(np.asarray(st.sum_length).sum() / n),
    }
    assert fast["episodes"] > 0 and gen["episodes"] > 0
    np.testing.assert_allclose(fast["mean_return"], gen["mean_return"], rtol=0.2)
    np.testing.assert_allclose(fast["mean_length"], gen["mean_length"], rtol=0.2)


def test_policy_kernel_forward_matches_xla():
    """Cartpole policy-in-kernel engine: in-kernel dual-MLP value/logp equal
    the XLA actor/critic forward on the recorded observations and actions
    (mirrors test_fast_policy.test_kernel_forward_matches_xla_policy)."""
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_cartpole import (
        FastCartPolePolicyRollout,
    )

    env = make_cartpole(_cfg(task="traj_tracking",
                             normalized_rl_action_space=True))
    fp = FastCartPolePolicyRollout(env, B, 8, interpret=True)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=8)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    rows = fp.reset(0)
    new_rows, traj = fp.run(rows, w, seed=3)
    d = fp.unpack_traj(traj)
    for k, v in d.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert d["obs"].shape == (8, B, 4) and d["act"].shape == (8, B, 1)

    obs = d["obs"][0]
    np.testing.assert_allclose(
        np.asarray(d["v"][0]), np.asarray(ppo._value(ppo.state.ac, obs)),
        rtol=2e-4, atol=2e-4,
    )
    dist = ppo._dist(ppo.state.ac, obs)
    lp = np.asarray(dist.log_prob(jnp.asarray(d["act"][0])))  # (B,): summed over act dim
    np.testing.assert_allclose(
        np.asarray(d["logp"][0]), lp, rtol=2e-3, atol=2e-3,
    )
    # Exponential RL reward in (0, 1].
    r = np.asarray(d["rew"])
    assert (r > 0).all() and (r <= 1.0).all()
    # First-step obs equal the packed reset states (no noise configured).
    np.testing.assert_allclose(obs, np.asarray(fp.states(rows)),
                               rtol=1e-6, atol=1e-7)


def test_ppo_fast_rollout_trains_cartpole():
    """PPO(use_fast_rollout) on CartPole dispatches to the cartpole policy
    kernel and runs full train steps with finite losses."""
    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_cartpole import (
        FastCartPolePolicyRollout,
    )

    env = make_cartpole(_cfg(normalized_rl_action_space=True))
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=8,
              opt_epochs=2, mini_batch_size=B * 4,
              use_fast_rollout=True, fast_interpret=True)
    assert isinstance(ppo._fp, FastCartPolePolicyRollout)
    assert ppo._fu is not None  # generalized update kernel covers these shapes
    s = ppo.state
    for _ in range(2):
        s, m = ppo._train_step(s)
    assert int(jax.device_get(s.total_steps)) == 2 * B * 8
    for k in ("policy_loss", "value_loss", "approx_kl"):
        assert np.isfinite(float(jax.device_get(m[k]))), k


def test_input_constraint_violations_match_general_engine():
    """Input box rows are counted in-kernel on the raw commanded action:
    a force outside the input bounds registers one violation per step in
    BOTH engines (envs/cartpole.py step: get_values(x, action))."""
    specs = (
        {"constraint_form": "default_constraint", "constrained_variable": "state"},
        {"constraint_form": "bounded_constraint", "constrained_variable": "input",
         "lower_bounds": [-0.5], "upper_bounds": [0.5]},
    )
    cfg = _cfg(constraints=specs, randomized_init=False,
               init_state=[0.0, 0.0, 0.02, 0.0])
    assert supports(cfg)
    fr, rows_out, carry = _run_both(cfg, 8, 0.8)  # |0.8| > 0.5: violates
    viol_fast = np.asarray(rows_out[11]).reshape(B)
    np.testing.assert_array_equal(
        viol_fast, np.asarray(carry.stats.ep_violations))
    assert viol_fast.min() == 8  # every step violated the input row

    # In-bounds force: state rows quiet near upright, input row quiet.
    fr, rows_out, carry = _run_both(cfg, 8, 0.3)
    np.testing.assert_array_equal(
        np.asarray(rows_out[11]).reshape(B),
        np.asarray(carry.stats.ep_violations))


def test_non_box_constraints_fall_back_to_general_engine():
    """Linear/quadratic/symmetric programs cannot be counted per-dim in
    kernel; supports() must reject them (envs/constraints.py
    box_bounds_view)."""
    lin = ({"constraint_form": "linear_constraint",
            "constrained_variable": "state",
            "A": [[1.0, 0.0, 1.0, 0.0]], "b": [1.0]},)
    assert not supports(_cfg(constraints=lin))
    strict_box = ({"constraint_form": "default_constraint",
                   "constrained_variable": "state", "strict": True},)
    assert not supports(_cfg(constraints=strict_box))
