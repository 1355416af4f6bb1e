"""Maze-capable whole-rollout engine (BASELINE config 5 family).

Interpret-mode validation: in-kernel gate/obstacle geometry, competition
sparse reward, collision/completion done flags vs the general engine on the
same states and actions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout, supports
from safe_control_gym_tpu.parallel.vector import make_vec_env

pytestmark = pytest.mark.slow

B = 1024

LEVEL2_GATES = (
    [0.5, -2.5, 0, 0, 0, -1.57, 0],
    [2.0, -1.5, 0, 0, 0, 0, 1],
    [0.0, 0.2, 0, 0, 0, 1.57, 1],
    [-0.5, 1.5, 0, 0, 0, 0, 0],
)
LEVEL2_OBSTACLES = (
    [1.5, -2.5, 0, 0, 0, 0],
    [0.5, -1.0, 0, 0, 0, 0],
    [1.5, 0.0, 0, 0, 0, 0],
    [-1.0, 0.0, 0, 0, 0, 0],
)


def _maze_env(**kw):
    cfg = dict(
        quad_type=3, ctrl_freq=30, pyb_freq=60, episode_len_sec=4,
        task="stabilization",
        task_info={"stabilization_goal": [-0.5, 2.9, 0.75],
                   "stabilization_goal_tolerance": 0.15},
        cost="competition",
        gates=LEVEL2_GATES, obstacles=LEVEL2_OBSTACLES,
        randomized_init=True,
        init_state_randomization_info={
            "init_x": {"distrib": "uniform", "low": -2.0, "high": 2.0},
            "init_y": {"distrib": "uniform", "low": -2.5, "high": 2.0},
            "init_z": {"distrib": "uniform", "low": 0.1, "high": 1.4},
        },
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
        ),
        done_on_collision=True,
        done_on_out_of_bound=False,
        done_on_completion=True,
    )
    cfg.update(kw)
    return make_quadrotor(QuadrotorConfig(**cfg))


def test_supports_maze_envelope():
    env = _maze_env()
    assert not supports(env.config)  # gates excluded from the base envelope
    assert supports(env.config, allow_maze=True)
    # Level2-style disturbances fit the maze envelope too.
    env2 = _maze_env(disturbances={
        "action": ({"disturbance_func": "white_noise", "std": 0.001},),
        "dynamics": ({"disturbance_func": "uniform",
                      "low": [-0.1] * 3, "high": [0.1] * 3},),
    })
    assert supports(env2.config, allow_maze=True)


def test_maze_step_matches_general_engine():
    """One kernel step reproduces the general engine's competition reward,
    collision and done flags for 1024 randomly scattered states."""
    env = _maze_env()
    fr = FastQuadRollout(env, B, steps_per_call=1, interpret=True)
    vec = make_vec_env(env, B)
    st, _, _ = jax.jit(vec.reset)(jax.random.key(3))
    # Past the settling window so gate progress is active
    # (quadrotor.py:1060), and clear of the auto-reset edge.
    st = st.replace(
        ctrl_step=jnp.full((B,), 40, jnp.int32),
        pyb_step=jnp.full((B,), 80, jnp.int32),
    )
    rows = fr.pack(st)
    hover = np.full(4, float(env.u_goal[0]), np.float32)
    new_rows = fr.run(rows, hover, seed=1)

    _, _, rew_ref, done_ref, info = jax.jit(vec.step_no_reset)(
        st, jnp.tile(jnp.asarray(hover), (B, 1))
    )
    flat = np.asarray(new_rows).reshape(fr.n_rows, B)
    # Per-env reward recovered from the episode stats rows: running return
    # for live envs + completed-episode sum for done envs.
    rew_k = flat[18] + flat[22]
    done_k = flat[21] > 0.5
    np.testing.assert_array_equal(done_k, np.asarray(done_ref))
    np.testing.assert_allclose(rew_k, np.asarray(rew_ref), atol=1e-4)
    # Dynamics unchanged by the maze path (state advanced identically for
    # non-done envs; done envs were auto-reset in-kernel).
    live = ~done_k
    x_ref = np.asarray(jax.jit(vec.step_no_reset)(st, jnp.tile(jnp.asarray(hover), (B, 1)))[0].x)
    np.testing.assert_allclose(
        flat[:12, live].T, x_ref[live], rtol=2e-4, atol=2e-4
    )
    # The scattered spawns must actually exercise the geometry.
    assert 0.005 < done_k.mean() < 0.9


def test_maze_rollout_progresses_and_counts_stats():
    """Multi-step maze rollout: finite stats, collisions registered,
    episodes turn over via collision/timeout resets."""
    env = _maze_env()
    fr = FastQuadRollout(env, B, steps_per_call=60, interpret=True)
    rows = fr.reset(0)
    hover = np.full(4, float(env.u_goal[0]), np.float32)
    rows = fr.run(rows, hover, seed=2)
    stats = fr.stats(rows)
    assert np.isfinite(list(stats.values())).all()
    assert stats["episodes"] > 0  # collisions / timeouts recycled envs
    # Competition reward is sparse and collision-dominated for a blind
    # hover policy.
    assert stats["mean_return"] < 0
