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
    s1 = prog.init(jax.random.key(0))
    s2 = prog.init(jax.random.key(0))
    s3 = prog.init(jax.random.key(1))
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
