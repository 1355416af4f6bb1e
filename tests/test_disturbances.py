"""Disturbance semantics vs the reference (safe_control_gym/envs/disturbances.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.disturbances import build_disturbances


def _apply(prog, sched, step, target, key=jax.random.key(0)):
    return np.asarray(
        prog.apply(sched, key, jnp.asarray(step), jnp.asarray(step), jnp.asarray(target))
    )


def test_impulse_shapes():
    """Square and triangle impulses (disturbances.py:89-143)."""
    # Square, duration 1, fixed offset 5: only step 5 is nonzero.
    prog = build_disturbances(
        [{"disturbance_func": "impulse", "magnitude": 2.0, "step_offset": 5, "duration": 1}],
        dim=1, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    sched = jnp.zeros((0,), jnp.int32)
    tgt = np.zeros(1)
    vals = [float(_apply(prog, sched, t, tgt)[0]) for t in range(10)]
    assert vals[4] == 0.0 and vals[5] == 2.0 and vals[6] == 0.0
    # Triangle: duration 6, decay 0.5, offset 2, peak at 2+3=5.
    prog = build_disturbances(
        [{"disturbance_func": "impulse", "magnitude": 8.0, "step_offset": 2,
          "duration": 6, "decay_rate": 0.5}],
        dim=1, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    vals = [float(_apply(prog, sched, t, tgt)[0]) for t in range(10)]
    assert vals[1] == 0.0
    assert vals[5] == 8.0  # peak: decay^0
    assert vals[4] == 4.0 and vals[6] == 4.0  # decay^1
    assert vals[3] == 2.0 and vals[7] == 2.0  # decay^2
    assert vals[8] == 0.0  # peak_offset >= duration/2 -> 0


def test_step_disturbance():
    prog = build_disturbances(
        [{"disturbance_func": "step", "magnitude": -1.5, "step_offset": 3}],
        dim=2, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    sched = jnp.zeros((0,), jnp.int32)
    before = _apply(prog, sched, 2, np.zeros(2))
    after = _apply(prog, sched, 7, np.zeros(2))
    assert np.all(before == 0.0) and np.all(after == -1.5)


def test_randomized_offset_from_key():
    prog = build_disturbances(
        [{"disturbance_func": "step", "magnitude": 1.0}],
        dim=1, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    assert prog.num_scheduled == 1
    s1 = prog.init(jax.random.key(0))["offsets"]
    s2 = prog.init(jax.random.key(0))["offsets"]
    s3 = prog.init(jax.random.key(1))["offsets"]
    assert int(s1[0]) == int(s2[0])
    assert 0 <= int(s1[0]) < prog.max_step
    assert int(s1[0]) != int(s3[0])  # overwhelmingly likely


def test_white_noise_stats_and_mask():
    prog = build_disturbances(
        [{"disturbance_func": "white_noise", "std": 0.5, "mask": [1.0, 0.0]}],
        dim=2, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    sched = jnp.zeros((0,), jnp.int32)
    draws = np.stack(
        [_apply(prog, sched, 0, np.zeros(2), key=jax.random.key(i)) for i in range(500)]
    )
    assert np.all(draws[:, 1] == 0.0)  # masked dim untouched
    assert abs(draws[:, 0].std() - 0.5) < 0.05
    assert abs(draws[:, 0].mean()) < 0.07


def test_uniform_noise_bounds():
    prog = build_disturbances(
        [{"disturbance_func": "uniform", "low": -0.2, "high": 0.4}],
        dim=3, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    sched = jnp.zeros((0,), jnp.int32)
    draws = np.stack(
        [_apply(prog, sched, 0, np.zeros(3), key=jax.random.key(i)) for i in range(200)]
    )
    assert draws.min() >= -0.2 and draws.max() <= 0.4


def test_sequential_composition():
    """DisturbanceList applies sequentially (disturbances.py:69-79)."""
    prog = build_disturbances(
        [
            {"disturbance_func": "step", "magnitude": 1.0, "step_offset": 0},
            {"disturbance_func": "step", "magnitude": 2.0, "step_offset": 0},
        ],
        dim=1, episode_len_sec=1.0, ctrl_freq=20, pyb_freq=20,
    )
    sched = jnp.zeros((0,), jnp.int32)
    out = _apply(prog, sched, 1, np.zeros(1))
    assert out[0] == 3.0


def test_brownian_random_walk():
    """brownian (reference stub, disturbances.py:251-257): variance grows
    linearly; the walk is identical within a step and persists across steps."""
    import jax
    import jax.numpy as jnp
    from safe_control_gym_tpu.envs.disturbances import build_disturbances

    prog = build_disturbances(
        [{"disturbance_func": "brownian", "std": 0.5}],
        dim=2, episode_len_sec=10, ctrl_freq=50, pyb_freq=50,
    )
    sched = prog.init(jax.random.key(0))
    assert float(jnp.abs(sched["walk"]).max()) == 0.0  # walk starts at zero
    t0 = jnp.zeros((2,))
    out0 = prog.apply(sched, jax.random.key(1), 0, 0, t0)
    assert float(jnp.abs(out0).max()) == 0.0
    # Evolve 100 steps; empirical std should be ~ std*sqrt(n*dt).
    import numpy as np

    n = 100
    finals = []
    for seed in range(64):
        s = prog.init(jax.random.key(seed))
        for i in range(n):
            s = prog.evolve(s, jax.random.fold_in(jax.random.key(1000 + seed), i))
        finals.append(np.asarray(s["walk"]))
    emp_std = np.std(np.stack(finals))
    expect = 0.5 * np.sqrt(n / 50)
    assert 0.6 * expect < emp_std < 1.4 * expect, (emp_std, expect)


def test_state_dependent_friction():
    """state_dependent (reference stub, disturbances.py:291-305): friction-like
    -coeff * x[state_index] opposing the selected velocity."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from safe_control_gym_tpu.envs.disturbances import build_disturbances

    prog = build_disturbances(
        [{"disturbance_func": "state_dependent", "coeff": 0.2, "state_index": [1, 3, 5]}],
        dim=3, episode_len_sec=5, ctrl_freq=50, pyb_freq=50,
    )
    sched = prog.init(jax.random.key(0))
    x = jnp.asarray([0.0, 2.0, 0.0, -1.0, 0.0, 0.5])
    out = prog.apply(sched, jax.random.key(1), 0, 0, jnp.zeros((3,)), x=x)
    np.testing.assert_allclose(np.asarray(out), [-0.4, 0.2, -0.1], atol=1e-6)


def test_brownian_in_env_step():
    """End-to-end: a quadrotor with brownian dynamics noise runs and the walk
    state in the PyTree evolves."""
    import jax
    import jax.numpy as jnp
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=50, pyb_freq=50, episode_len_sec=2,
        disturbances={"dynamics": ({"disturbance_func": "brownian", "std": 0.001},)},
    ))
    state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
    act = jnp.full((4,), 0.06)
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, r, d, info = step(state, act)
    walk = state.dist_sched["dynamics"]["walk"]
    assert walk.shape == (3,)
    assert float(jnp.abs(walk).max()) > 0.0
