"""Firmware SITL emulator + Mellinger controller tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.controllers.firmware import FirmwareWrapper, Lpf2p
from safe_control_gym_tpu.controllers.mellinger import MellingerController

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard



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


def test_poly7_planner_boundary_conditions():
    """HL takeoff/land/goto plans are 7th-order no-jerk polynomials matching
    the firmware planner (pptraj.c poly7_nojerk): position/velocity/
    acceleration continuity at both ends, zero jerk at the boundaries."""
    from safe_control_gym_tpu.controllers.firmware import _poly7_nojerk, _poly_eval

    T = 2.5
    c = _poly7_nojerk(T, x0=0.2, dx0=0.4, ddx0=-0.3, xf=1.5, dxf=0.0, ddxf=0.0)
    assert len(c) == 8
    p0, v0, a0 = _poly_eval(c, 0.0)
    pT, vT, aT = _poly_eval(c, T)
    np.testing.assert_allclose([p0, v0, a0], [0.2, 0.4, -0.3], atol=1e-9)
    np.testing.assert_allclose([pT, vT, aT], [1.5, 0.0, 0.0], atol=1e-8)
    # Zero jerk at both boundaries (finite-difference of acceleration).
    eps = 1e-5
    j0 = (_poly_eval(c, eps)[2] - a0) / eps
    jT = (aT - _poly_eval(c, T - eps)[2]) / eps
    assert abs(j0) < 1e-2 and abs(jT) < 1e-2


def test_firmware_action_delay_buffer():
    """ACTION_DELAY shifts the motor response by k firmware loops
    (firmware_wrapper.py:283-287): the first k emitted sub-actions are the
    zero-initialized history."""
    fw0 = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25)
    fwd = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25,
                          action_delay=3)
    for fw in (fw0, fwd):
        fw.reset()
        fw.sendTakeoffCmd(1.0, 2.0)
    a0 = np.asarray(fw0.step(0.0, np.zeros(4))[-1])
    ad = np.asarray(fwd.step(0.0, np.zeros(4))[-1])
    # Undelayed wrapper is already thrusting; delayed one just flushed its
    # zero history into the final sub-steps, so its emitted action trails.
    assert a0.sum() > 0
    assert fwd.ACTION_DELAY == 3 and len(fwd.action_history) == 3
    # After enough ticks both produce positive thrust (delay only shifts).
    for i in range(1, 10):
        ad = np.asarray(fwd.step(i / 25, ad)[-1])
    assert ad.sum() > 0


def test_firmware_sensor_delay_runs_stably():
    """SENSOR_DELAY feeds the controller measurements from k loops ago
    (firmware_wrapper.py:264-268); a small delay must still hover."""
    fw = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25,
                         sensor_delay=2)
    obs, _ = fw.reset()
    assert len(fw.sensor_history) == 2
    fw.sendTakeoffCmd(1.0, 2.0)
    action = np.zeros(4)
    for i in range(75):
        obs, r, d, info, action = fw.step(i / 25, action)
    assert abs(obs[4] - 1.0) < 0.15, f"takeoff with sensor delay z={obs[4]}"


def test_firmware_stock_gains_and_lpf_swap():
    """Pin the stock Mellinger derivative gain and the reference's swapped
    LPF cutoffs (firmware_wrapper.py:137-138 initializes acclpf with the
    GYRO cutoff and gyrolpf with the ACCEL cutoff)."""
    from safe_control_gym_tpu.controllers import mellinger as M

    assert M.KD_OMEGA_RP == 200.0
    fw = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25)
    fw.reset()
    # b0 of a 2-pole butterworth grows with cutoff: the 80 Hz filter (on acc)
    # has a larger b0 than the 30 Hz filter (on gyro).
    assert fw.acclpf[0].b0 > fw.gyrolpf[0].b0


def test_fused_matches_host_loop():
    """The fused on-device scan (one dispatch per control step) must replay
    the host-side per-tick loop: same gating, same LPF/delay/tumble state
    machine, same emitted actions.  Tolerance covers the f64->f32 LPF/poly
    arithmetic move; everything else is bit-identical by construction."""
    fwf = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25, fused=True)
    fwh = FirmwareWrapper(_env_func(), firmware_freq=500, ctrl_freq=25, fused=False)
    for fw in (fwf, fwh):
        fw.reset(seed=3)
        fw.sendTakeoffCmd(1.0, 2.0)
    af = ah = np.zeros(4)
    for i in range(60):
        if i == 25:
            fwf.sendGotoCmd([0.4, -0.2, 1.1], 0.0, 1.5, relative=False)
            fwh.sendGotoCmd([0.4, -0.2, 1.1], 0.0, 1.5, relative=False)
        of, rf, df, inf_f, af = fwf.step(i / 25, af)
        oh, rh, dh, inf_h, ah = fwh.step(i / 25, ah)
        # f64->f32 filter arithmetic drift compounds through the closed loop;
        # 2 cm over 60 control steps (2.4 s) bounds it far below tracking error.
        np.testing.assert_allclose(np.asarray(of), np.asarray(oh), atol=2e-2,
                                   err_msg=f"obs diverged at ctrl step {i}")
        np.testing.assert_allclose(np.asarray(af), np.asarray(ah), atol=2e-2)
        assert df == dh and abs(rf - float(rh)) < 5e-2
        assert int(fwf.tick) == int(fwh.tick)
    # Info dicts agree on the competition fields.
    assert int(np.asarray(inf_f["current_target_gate_id"])) == int(
        np.asarray(inf_h["current_target_gate_id"]))
    assert bool(np.asarray(inf_f["collision"])) == bool(np.asarray(inf_h["collision"]))


def test_firmware_state_delay_unsupported():
    with pytest.raises(NotImplementedError):
        class _D(FirmwareWrapper):
            STATE_DELAY = 1
        _D(_env_func(), firmware_freq=500, ctrl_freq=25)
