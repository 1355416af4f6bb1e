"""Whole-rollout Pallas engine vs the general engine (parallel/fast_env.py).

Step dynamics/reward/done must match the general engine exactly on
reset-free segments; reset draws replay the shared counter-based stream
(ops/ctr_prng.py), so trajectories stay step-equal THROUGH auto-resets
(test_trajectory_equality_across_engines_with_resets).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout, supports
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard


B = 1024


def _cfg(**kw):
    base = dict(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=6,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0.0, 0.0], "trajectory_scale": 1.0,
                   "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", randomized_inertial_prop=True, randomized_init=True,
        done_on_out_of_bound=True,
    )
    base.update(kw)
    return QuadrotorConfig(**base)


def test_supports_envelope():
    assert supports(_cfg())
    assert supports(_cfg(task="stabilization",
                         task_info={"stabilization_goal": [0, 0, 1],
                                    "stabilization_goal_tolerance": 0.05}))
    # Round-3 envelope: square trajectory, quadratic cost, obs white noise
    # (BASELINE config 4 variants).
    sq = dict(_cfg().task_info)
    sq["trajectory_type"] = "square"
    assert supports(_cfg(task_info=sq))
    assert supports(_cfg(cost="quadratic"))
    assert supports(_cfg(disturbances={
        "observation": ({"disturbance_func": "white_noise", "std": 0.1},)}))
    assert not supports(_cfg(disturbances={
        "observation": ({"disturbance_func": "uniform", "low": -1, "high": 1},)}))
    assert not supports(_cfg(quad_type=2))
    assert not supports(_cfg(gates=((0.5, -1.0, 0, 0, 0, 0, 0),)))


def test_dynamics_reward_match_general_engine():
    """Reset-free segment: pack the general engine's reset state into fast
    rows, run both engines 12 steps with the same constant action, compare
    trajectories and episode-return accumulators."""
    cfg = _cfg(randomized_init=False, randomized_inertial_prop=False)
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    # Benign start: hover at z=1 so no env hits done within the segment.
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 4] = 1.0
    state = state.replace(x=jnp.asarray(x0))

    hover = float(env.u_goal[0])
    act = jnp.full((B, 4), hover, jnp.float32)

    fr = FastQuadRollout(env, B, steps_per_call=12, interpret=True)
    rows = fr.pack(state)
    rows_out = fr.run(rows, np.full(4, hover), seed=0)

    carry = RolloutCarry(state, jnp.asarray(x0), (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, 12, collect=False)
    )(carry)

    x_fast = fr.states(rows_out)
    x_gen = np.asarray(carry.env_state.x)
    np.testing.assert_allclose(x_fast, x_gen, rtol=2e-4, atol=2e-5)
    # Episode-return accumulators agree (reward math identical).
    r = np.asarray(rows_out[18]).reshape(B)
    np.testing.assert_allclose(r, np.asarray(carry.stats.ep_return), rtol=2e-4)
    # No env terminated during the segment.
    assert np.asarray(rows_out[21]).sum() == 0


def test_impulse_disturbance_matches():
    """Impulse schedule math matches the general engine given the same
    per-episode offsets (packed through)."""
    cfg = _cfg(randomized_init=False, randomized_inertial_prop=False,
               disturbances={"dynamics": ({"disturbance_func": "impulse",
                                           "magnitude": 0.02, "duration": 10,
                                           "decay_rate": 0.8},)})
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(3))
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 4] = 1.0
    state = state.replace(x=jnp.asarray(x0))
    # Force offsets inside the segment so the impulse actually fires.
    sched = dict(state.dist_sched)
    dyn = dict(sched["dynamics"])
    dyn["offsets"] = jnp.full_like(dyn["offsets"], 3)
    sched["dynamics"] = dyn
    state = state.replace(dist_sched=sched)

    hover = float(env.u_goal[0])
    act = jnp.full((B, 4), hover, jnp.float32)
    fr = FastQuadRollout(env, B, steps_per_call=10, interpret=True)
    rows_out = fr.run(fr.pack(state), np.full(4, hover), seed=0)

    carry = RolloutCarry(state, jnp.asarray(x0), (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, 10, collect=False)
    )(carry)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5
    )


def test_auto_reset_statistics_agree():
    """With randomization + resets the two engines' episode statistics agree
    to a few percent (different PRNG streams by design)."""
    cfg = _cfg()
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    steps = 200

    fr = FastQuadRollout(env, B, steps_per_call=steps, interpret=True)
    hover = float(env.u_goal[0])
    rows = fr.run(fr.reset(seed=0), np.full(4, hover), seed=0)
    fast_stats = fr.stats(rows)

    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    act = jnp.full((B, 4), hover, jnp.float32)
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)
    gen = {k: float(v) for k, v in jax.device_get(carry.stats.means()).items()}

    assert fast_stats["episodes"] > 0 and gen["episodes"] > 0
    assert abs(fast_stats["mean_length"] - gen["mean_length"]) \
        / gen["mean_length"] < 0.15, (fast_stats, gen)
    assert abs(fast_stats["mean_return"] - gen["mean_return"]) \
        / max(abs(gen["mean_return"]), 1e-6) < 0.2, (fast_stats, gen)


def test_stabilization_fast_engine_runs():
    """The stabilization branch constructs and matches the general engine on
    a reset-free hover segment (regression: identity-projection NameError)."""
    cfg = _cfg(task="stabilization",
               task_info={"stabilization_goal": [0, 0, 1],
                          "stabilization_goal_tolerance": 0.05},
               randomized_init=False, randomized_inertial_prop=False)
    env = make_quadrotor(cfg)
    fr = FastQuadRollout(env, B, steps_per_call=8, interpret=True)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 4] = 1.0
    state = state.replace(x=jnp.asarray(x0))
    hover = float(env.u_goal[0])
    rows_out = fr.run(fr.pack(state), np.full(4, hover), seed=0)
    act = jnp.full((B, 4), hover, jnp.float32)
    carry = RolloutCarry(state, jnp.asarray(x0), (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, 8, collect=False)
    )(carry)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rows_out[18]).reshape(B), np.asarray(carry.stats.ep_return),
        rtol=2e-4,
    )


def _match_reset_free(cfg, steps=12, z0=1.0):
    """Run both engines from the same packed state; return (fast, general)
    outputs for comparison."""
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 4] = z0
    state = state.replace(x=jnp.asarray(x0))
    hover = float(env.u_goal[0])
    fr = FastQuadRollout(env, B, steps_per_call=steps, interpret=True)
    rows_out = fr.run(fr.pack(state), np.full(4, hover), seed=0)
    act = jnp.full((B, 4), hover, jnp.float32)
    carry = RolloutCarry(state, jnp.asarray(x0), (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)
    return fr, rows_out, carry


def test_square_trajectory_matches_general_engine():
    """The in-kernel piecewise-linear square reference matches the general
    engine's table exactly: same states AND same rewards across segment
    boundaries (benchmark_env.py:625-674)."""
    ti = {"trajectory_type": "square", "trajectory_plane": "xy",
          "trajectory_position_offset": [0.0, 0.0], "trajectory_scale": 0.8,
          "num_cycles": 2, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]}
    cfg = _cfg(task_info=ti, randomized_init=False, randomized_inertial_prop=False)
    # 2 cycles over 6 s at 60 Hz: segment boundary every 45 steps; 100 steps
    # cross two corners.
    fr, rows_out, carry = _match_reset_free(cfg, steps=100)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rows_out[18]).reshape(B), np.asarray(carry.stats.ep_return),
        rtol=2e-4,
    )


def test_quadratic_cost_matches_general_engine():
    """LQ reward (quadrotor.py:927-930) in-kernel: diagonal Q/R weights,
    step-exact episode returns vs the general engine."""
    cfg = _cfg(cost="quadratic", randomized_init=False,
               randomized_inertial_prop=False,
               q_weight=[2.0, 0.1, 2.0, 0.1, 5.0, 0.1, 1, 1, 1, 0.2, 0.2, 0.2],
               r_weight=[0.5])
    fr, rows_out, carry = _match_reset_free(cfg, steps=12)
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rows_out[18]).reshape(B), np.asarray(carry.stats.ep_return),
        rtol=2e-4,
    )


def test_quadratic_stab_goal_capture_done():
    """Stabilization + quadratic cost terminates on goal capture
    (quadrotor.py:907-910): starting AT the goal, both engines finish an
    episode on the first step."""
    cfg = _cfg(task="stabilization", cost="quadratic",
               task_info={"stabilization_goal": [0, 0, 1],
                          "stabilization_goal_tolerance": 0.05},
               randomized_init=False, randomized_inertial_prop=False)
    fr, rows_out, carry = _match_reset_free(cfg, steps=3, z0=1.0)
    # done_count row: every env terminated at least once via goal capture.
    done_fast = np.asarray(rows_out[21]).reshape(B)
    gen = {k: float(v) for k, v in jax.device_get(carry.stats.means()).items()}
    assert done_fast.min() >= 1, done_fast
    assert gen["episodes"] >= B


def test_trajectory_equality_across_engines_with_resets():
    """Round-3 unified PRNG (ops/ctr_prng.py): a seeded rollout WITH resets
    is step-equal across engines — reset draws (init state, inertia, impulse
    offsets) replay bit-identically, so trajectories re-sync at every
    episode boundary instead of agreeing only in distribution."""
    cfg = _cfg(episode_len_sec=0.1,  # 6-step episodes: several resets in 20
               done_on_out_of_bound=False,
               disturbances={"dynamics": ({"disturbance_func": "impulse",
                                           "magnitude": 0.02, "duration": 4,
                                           "decay_rate": 0.8},)})
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    steps = 20

    hover = float(env.u_goal[0])
    fr = FastQuadRollout(env, B, steps_per_call=steps, interpret=True)
    rows0 = fr.reset(seed=0)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))

    # Initial reset states match to 1 ulp (identical integer counter draws;
    # the affine application differs only by XLA fma contraction).
    np.testing.assert_allclose(fr.states(rows0), np.asarray(state.x),
                               rtol=1e-6, atol=2e-7)
    np.testing.assert_allclose(
        np.asarray(rows0[12]).reshape(B), np.asarray(state.mass), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows0[17]).reshape(B),
        np.asarray(state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))

    rows_out = fr.run(rows0, np.full(4, hover), seed=0)
    act = jnp.full((B, 4), hover, jnp.float32)
    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, steps, collect=False)
    )(carry)

    # Trajectories stay step-equal THROUGH ~3 auto-resets per env (resets
    # re-sync any f32 op-ordering drift; tolerance covers the 6 dynamic
    # steps between boundaries).
    np.testing.assert_allclose(
        fr.states(rows_out), np.asarray(carry.env_state.x), rtol=2e-4, atol=2e-5
    )
    # Post-reset inertia and impulse offsets also replayed identically.
    np.testing.assert_allclose(
        np.asarray(rows_out[12]).reshape(B), np.asarray(carry.env_state.mass),
        rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(rows_out[17]).reshape(B),
        np.asarray(carry.env_state.dist_sched["dynamics"]["offsets"],
                   np.float32).reshape(B))
    # Episode counters advanced in lockstep.
    np.testing.assert_array_equal(
        np.asarray(rows_out[26]).reshape(B),
        np.asarray(carry.env_state.episode_idx, np.float32))


def test_supports_rejects_out_of_envelope_extras():
    assert not supports(_cfg(normalized_rl_action_space=True))
    assert not supports(_cfg(done_on_collision=True))
    assert not supports(_cfg(done_on_completion=True))
    assert not supports(_cfg(disturbances={"dynamics": (
        {"disturbance_func": "impulse", "magnitude": 0.01, "step_offset": 5},)}))


def test_input_constraint_violations_match_general_engine():
    """Input box rows are counted in-kernel on the raw commanded action
    (envs/quadrotor.py step: get_values(x, action)); non-box programs are
    rejected by supports() (envs/constraints.py box_bounds_view)."""
    hover_probe = make_quadrotor(_cfg())
    hover = float(hover_probe.u_goal[0])
    specs = (
        {"constraint_form": "default_constraint", "constrained_variable": "state"},
        {"constraint_form": "bounded_constraint", "constrained_variable": "input",
         "lower_bounds": [0.0] * 4, "upper_bounds": [hover * 1.05] * 4},
    )
    cfg = _cfg(constraints=specs, randomized_init=False,
               randomized_inertial_prop=False)
    assert supports(cfg)
    assert not supports(_cfg(constraints=(
        {"constraint_form": "linear_constraint", "constrained_variable": "input",
         "A": [[1.0, 1.0, 1.0, 1.0]], "b": [4 * hover]},)))

    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, _, _ = jax.jit(vec.reset)(jax.random.key(0))
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 4] = 1.0
    state = state.replace(x=jnp.asarray(x0))

    force = hover * 1.2  # above the input row's upper bound: violates
    act = jnp.full((B, 4), force, jnp.float32)
    fr = FastQuadRollout(env, B, steps_per_call=6, interpret=True)
    rows_out = fr.run(fr.pack(state), np.full(4, force), seed=0)
    carry = RolloutCarry(state, jnp.asarray(x0), (), EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, 6, collect=False)
    )(carry)
    viol_fast = np.asarray(rows_out[20]).reshape(B)
    np.testing.assert_array_equal(
        viol_fast, np.asarray(carry.stats.ep_violations))
    assert viol_fast.min() == 6
