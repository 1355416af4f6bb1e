"""Firmware SITL emulator + Mellinger controller tests."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.firmware import FirmwareWrapper, Lpf2p
from safe_control_gym_tpu.controllers.mellinger import MellingerController


def _env_func(**kw):
    cfg = dict(
        quad_type=3,
        task="stabilization",
        cost="rl_reward",
        task_info={"stabilization_goal": [0, 0, 1], "stabilization_goal_tolerance": 0.05},
        randomized_init=False,
        init_state={"init_z": 0.03},
        episode_len_sec=6,
        ctrl_freq=500,
        pyb_freq=500,
        done_on_out_of_bound=False,
    )
    cfg.update(kw)
    return lambda: make_quadrotor(QuadrotorConfig(**cfg))


def test_firmware_takeoff_and_goto():
    fw = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25)
    obs, info = fw.reset()
    fw.sendTakeoffCmd(1.0, 2.0)
    action = np.zeros(4)
    for i in range(75):  # 3 s
        obs, r, d, info, action = fw.step(i / 25, action)
    assert abs(obs[4] - 1.0) < 0.1, f"takeoff z={obs[4]}"
    fw.sendGotoCmd([0.5, 0.3, 1.0], 0.0, 2.0, relative=False)
    for i in range(75, 150):
        obs, r, d, info, action = fw.step(i / 25, action)
    pos = np.array([obs[0], obs[2], obs[4]])
    assert np.linalg.norm(pos - np.array([0.5, 0.3, 1.0])) < 0.15, pos


def test_firmware_full_state_cmd():
    fw = FirmwareWrapper(_env_func(init_state={"init_z": 0.5}), firmware_freq=500, ctrl_freq=25)
    obs, info = fw.reset()
    action = np.zeros(4)
    for i in range(100):
        fw.sendFullStateCmd([0.2, -0.2, 0.8], np.zeros(3), np.zeros(3), 0.0, np.zeros(3), i / 25)
        obs, r, d, info, action = fw.step(i / 25, action)
    pos = np.array([obs[0], obs[2], obs[4]])
    assert np.linalg.norm(pos - np.array([0.2, -0.2, 0.8])) < 0.1, pos


def test_firmware_stop_kills_motors():
    fw = FirmwareWrapper(_env_func(init_state={"init_z": 1.0}), firmware_freq=500, ctrl_freq=25)
    fw.reset()
    fw.sendStopCmd()
    obs, r, d, info, action = fw.step(0.0, np.zeros(4))
    assert np.allclose(action, 0.0)


def test_mellinger_controller_tracks():
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=3,
            task="stabilization",
            cost="rl_reward",
            task_info={"stabilization_goal": [0.2, -0.1, 0.8], "stabilization_goal_tolerance": 0.05},
            randomized_init=False,
            init_state={"init_z": 0.5},
            episode_len_sec=6,
            ctrl_freq=500,
            pyb_freq=500,
            done_on_out_of_bound=False,
        )
    )
    mel = MellingerController(env)
    state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    for _ in range(2500):
        a = mel.select_action(np.asarray(obs))
        state, obs, r, d, info = step(state, jnp.asarray(a))
    pos = np.array([obs[0], obs[2], obs[4]])
    assert np.linalg.norm(pos - np.array([0.2, -0.1, 0.8])) < 0.1, pos


def test_lpf2p_dc_gain_and_attenuation():
    f = Lpf2p(500.0, 30.0)
    # DC passes.
    out = 0.0
    for _ in range(500):
        out = f.apply(1.0)
    assert abs(out - 1.0) < 1e-3
    # High frequency attenuates.
    f2 = Lpf2p(500.0, 30.0)
    outs = [f2.apply(np.sin(2 * np.pi * 200 * i / 500)) for i in range(500)]
    assert max(abs(o) for o in outs[100:]) < 0.1
