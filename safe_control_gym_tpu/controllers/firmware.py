"""Crazyflie firmware software-in-the-loop emulator.

TPU-native counterpart of the reference's FirmwareWrapper
(safe_control_gym/controllers/firmware/firmware_wrapper.py), which drives the
SWIG-wrapped C firmware (pycffirmware) at 500 Hz inside ``step()``.  Here the
firmware pieces are reimplemented (no bindings):

  * Mellinger controller math + power distribution — controllers/mellinger.py
    (numerics from the public Crazyflie firmware);
  * 2-pole Butterworth LPFs on gyro/acc at 80/30 Hz
    (firmware_wrapper.py:133-138, lpf2pInit/lpf2pApply semantics);
  * finite-difference sensor emulation (rates and acc from consecutive env
    states, firmware_wrapper.py:245-268);
  * the high-level command queue: sendFullStateCmd / sendTakeoffCmd /
    sendLandCmd / sendGotoCmd / sendStopCmd / sendNotifySetpointStopCmd
    (firmware_wrapper.py:483-663), with quintic (minimum-jerk) setpoint
    interpolation standing in for the firmware's 7th-order planner;
  * tick-gated controller cadence and tumble-detection motor kill
    (firmware_wrapper.py:413-466);
  * motor-order remap of the produced action ([3, 2, 1, 0],
    firmware_wrapper.py:277-278).

The inner 500 Hz loop steps the analytic env (jitted); the command API stays
host-side, matching how user controllers interact with it
(competition/getting_started.py:162-202).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.mellinger import (
    MellingerState,
    mellinger_control,
    power_distribution,
)
from safe_control_gym_tpu.envs.quadrotor import KF, MAX_PWM, MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE


class Lpf2p:
    """2-pole Butterworth low-pass (firmware filter.c lpf2p)."""

    def __init__(self, sample_freq: float, cutoff_freq: float):
        fr = sample_freq / cutoff_freq
        ohm = math.tan(math.pi / fr)
        c = 1.0 + 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm
        self.b0 = ohm * ohm / c
        self.b1 = 2.0 * self.b0
        self.b2 = self.b0
        self.a1 = 2.0 * (ohm * ohm - 1.0) / c
        self.a2 = (1.0 - 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm) / c
        self.d1 = 0.0
        self.d2 = 0.0

    def apply(self, sample: float) -> float:
        d0 = sample - self.d1 * self.a1 - self.d2 * self.a2
        out = d0 * self.b0 + self.d1 * self.b1 + self.d2 * self.b2
        self.d2, self.d1 = self.d1, d0
        return out


def _poly7_nojerk(T, x0, dx0, ddx0, xf, dxf, ddxf):
    """7th-order polynomial coefficients (ascending), matching the firmware
    planner's ``poly7_nojerk`` (crazyflie-firmware pptraj.c, reached via
    crtpCommanderHighLevelTakeoff/Land/GoTo -> plan_* ->
    piecewise_plan_7th_order_no_jerk): boundary conditions
    p(0)=x0, p'(0)=dx0, p''(0)=ddx0, p'''(0)=0 and the same at T with
    (xf, dxf, ddxf, 0).  Solved as the 8x8 linear system directly (exact,
    no transcribed closed forms)."""
    T = max(float(T), 1e-6)
    A = np.zeros((8, 8))
    # p(0), p'(0), p''(0), p'''(0)
    A[0, 0] = 1.0
    A[1, 1] = 1.0
    A[2, 2] = 2.0
    A[3, 3] = 6.0
    powers = T ** np.arange(8, dtype=float)
    k = np.arange(8, dtype=float)
    A[4] = powers  # p(T)
    A[5, 1:] = k[1:] * powers[:-1]  # p'(T)
    A[6, 2:] = k[2:] * (k[2:] - 1) * powers[:-2]  # p''(T)
    A[7, 3:] = k[3:] * (k[3:] - 1) * (k[3:] - 2) * powers[:-3]  # p'''(T)
    b = np.array([x0, dx0, ddx0, 0.0, xf, dxf, ddxf, 0.0])
    return np.linalg.solve(A, b)


def _poly_eval(c, t):
    """(pos, vel, acc) of an ascending-coefficient polynomial at t."""
    k = np.arange(len(c), dtype=float)
    tp = t ** k
    pos = float(np.dot(c, tp))
    vel = float(np.dot(c[1:] * k[1:], tp[:-1]))
    acc = float(np.dot(c[2:] * k[2:] * (k[2:] - 1), tp[:-2]))
    return pos, vel, acc


class FirmwareWrapper:
    """Reference-compatible SITL wrapper (reset/step + send*Cmd API)."""

    # Configurable hardware-response delays (reference firmware_wrapper.py:14-16,
    # 129-131): firmware loops between commanding an action and the motors
    # responding (ACTION_DELAY), and between a motion and the sensors
    # registering it (SENSOR_DELAY).  STATE_DELAY is unsupported upstream too.
    ACTION_DELAY = 0
    SENSOR_DELAY = 0
    STATE_DELAY = 0
    GYRO_LPF_CUTOFF_FREQ = 80.0
    ACCEL_LPF_CUTOFF_FREQ = 30.0

    def __init__(self, env_func, firmware_freq: int = 500, ctrl_freq: int = 25,
                 verbose=False, action_delay: int = None, sensor_delay: int = None,
                 **kwargs):
        if action_delay is not None:
            self.ACTION_DELAY = int(action_delay)
        if sensor_delay is not None:
            self.SENSOR_DELAY = int(sensor_delay)
        if self.STATE_DELAY:
            raise NotImplementedError("State delay is not implemented. Leave at 0.")
        self.env = env_func() if callable(env_func) else env_func
        assert self.env.ctrl_freq == firmware_freq, (
            "the wrapped env must run at the firmware frequency "
            "(the reference rewrites ctrl_freq to 500 Hz, getting_started.py:69-83)"
        )
        self.firmware_freq = firmware_freq
        self.ctrl_freq = ctrl_freq
        self.firmware_dt = 1.0 / firmware_freq
        self.ctrl_dt = 1.0 / ctrl_freq
        self.verbose = verbose
        self._env_step = jax.jit(self.env.step)
        self._env_reset = jax.jit(self.env.reset)

    # -- lifecycle -------------------------------------------------------------
    def reset(self, seed: int = 0):
        self.ms = MellingerState.create()
        self.tick = 0
        self.pwms = np.zeros(4)
        self.action = np.zeros(4)
        self.command_queue: list = []
        self.tumble_counter = 0
        self._error = False
        # Delay ring buffers (firmware_wrapper.py:129-131).
        self.action_history = [np.zeros(4) for _ in range(self.ACTION_DELAY)]
        self.sensor_history = [
            [np.zeros(3), np.zeros(3)] for _ in range(self.SENSOR_DELAY)
        ]
        self.full_state_cmd_override = True  # until a HL command is sent
        self.setpoint = {
            "pos": np.zeros(3), "vel": np.zeros(3), "acc": np.zeros(3),
            "yaw": 0.0, "omega": np.zeros(3),
        }
        self._plan = None  # (kind, t0, duration, p0, p1, yaw0, yaw1)
        # NOTE: the reference initializes acclpf with GYRO_LPF_CUTOFF_FREQ and
        # gyrolpf with ACCEL_LPF_CUTOFF_FREQ — the cutoffs are swapped
        # relative to their names (firmware_wrapper.py:137-138).  The swap is
        # load-bearing: the 30 Hz gyro LPF is what keeps the stock
        # KD_OMEGA_RP=200 derivative term stable.  Reproduced exactly.
        self.acclpf = [Lpf2p(self.firmware_freq, self.GYRO_LPF_CUTOFF_FREQ) for _ in range(3)]
        self.gyrolpf = [Lpf2p(self.firmware_freq, self.ACCEL_LPF_CUTOFF_FREQ) for _ in range(3)]
        self.last_pos_pid_call = 0.0
        self.last_att_pid_call = 0.0
        self.env_state, obs, info = self._env_reset(jax.random.key(seed))
        o = np.asarray(obs)
        self.prev_vel = np.array([o[1], o[3], o[5]])
        self.prev_rpy = np.array([o[6], o[7], o[8]])
        self.setpoint["pos"] = np.array([o[0], o[2], o[4]])
        self.states = []
        return obs, info

    def close(self):
        pass

    # -- main loop (firmware_wrapper.py:208-295) --------------------------------
    def step(self, sim_time: float, action):
        self._process_command_queue(sim_time)
        obs = reward = done = info = None
        action = np.asarray(action, dtype=np.float32)
        while self.tick / self.firmware_freq < sim_time + self.ctrl_dt:
            self.env_state, obs_j, reward, done, info = self._env_step(
                self.env_state, jnp.asarray(action)
            )
            obs = np.asarray(obs_j)
            cur_pos = np.array([obs[0], obs[2], obs[4]])
            cur_vel = np.array([obs[1], obs[3], obs[5]])
            cur_rpy = np.array([obs[6], obs[7], obs[8]])
            # Finite-difference sensors (firmware_wrapper.py:248-268).
            rates = (cur_rpy - self.prev_rpy) / self.firmware_dt
            self.prev_rpy = cur_rpy
            acc = (cur_vel - self.prev_vel) / self.firmware_dt / 9.8 + np.array([0, 0, 1.0])
            self.prev_vel = cur_vel
            # Sensor delay (firmware_wrapper.py:264-268): the controller sees
            # the measurement from SENSOR_DELAY loops ago; LPFs apply at
            # sensorData-update time, i.e. on the delayed sample.
            if self.SENSOR_DELAY:
                acc_meas, rates_meas = self.sensor_history[0]
                self.sensor_history = self.sensor_history[1:] + [[acc, rates]]
            else:
                acc_meas, rates_meas = acc, rates
            gyro = np.array([self.gyrolpf[i].apply(rates_meas[i]) for i in range(3)])
            acc_f = np.array([self.acclpf[i].apply(acc_meas[i]) for i in range(3)])

            # Tumble detection (firmware_wrapper.py:421-431) — the reference
            # checks state.acc.z, the UNFILTERED undelayed world acc.
            if acc[2] < -0.5:
                self.tumble_counter += 1
            else:
                self.tumble_counter = 0
            if self.tumble_counter >= 30:
                self.pwms = np.zeros(4)
                self._error = True

            # Setpoint update from the active HL plan.
            self._update_setpoint(self.tick / self.firmware_freq)

            # Controller tick gating (firmware_wrapper.py:433-446): attitude
            # PID when >2 ms since the last call, position PID when >10 ms;
            # controllerMellinger executes on the attitude cadence
            # (RATE_DO_EXECUTE(ATTITUDE_RATE)), PWMs zero-order-hold between
            # executions.  With cur_time = tick/500 the float comparison
            # fires every OTHER loop — the reference's effective 250 Hz.
            cur_time = self.tick / self.firmware_freq
            if cur_time - self.last_att_pid_call > 0.002:
                run_ctrl = True
                self.last_att_pid_call = cur_time
                if cur_time - self.last_pos_pid_call > 0.01:
                    self.last_pos_pid_call = cur_time
            else:
                run_ctrl = False
            if not self._error and run_ctrl:
                control, self.ms = mellinger_control(
                    self.ms,
                    self.firmware_dt,
                    jnp.asarray(cur_pos, jnp.float32),
                    jnp.asarray(cur_vel, jnp.float32),
                    jnp.asarray(cur_rpy, jnp.float32),
                    jnp.asarray(gyro, jnp.float32),
                    jnp.asarray(self.setpoint["pos"], jnp.float32),
                    jnp.asarray(self.setpoint["vel"], jnp.float32),
                    jnp.asarray(self.setpoint["acc"], jnp.float32),
                    jnp.asarray(self.setpoint["yaw"], jnp.float32),
                    jnp.asarray(self.setpoint["omega"], jnp.float32),
                )
                self.pwms = np.asarray(power_distribution(control))

            # PWM -> per-motor forces, firmware motor order [3, 2, 1, 0]
            # (firmware_wrapper.py:277-278).
            rpm = PWM2RPM_SCALE * np.clip(self.pwms, MIN_PWM, MAX_PWM) + PWM2RPM_CONST
            new_action = (KF * rpm**2)[[3, 2, 1, 0]]
            # Keep the emitted thrusts inside the env's physical input bounds:
            # at the PWM ceiling the f64 thrust equals the bound exactly and
            # the env's f32 cast can tip it ~1e-7 over, tripping the default
            # input constraint (done_on_violation ends the episode).  Same
            # guard as the sim-only PID path (competition/controller.py
            # _clip_forces).
            new_action = np.clip(
                new_action,
                np.asarray(self.env.spaces.action_low, np.float32),
                np.asarray(self.env.spaces.action_high, np.float32),
            )
            # Action delay (firmware_wrapper.py:283-287): motors respond to
            # the command issued ACTION_DELAY loops ago.
            if self.ACTION_DELAY:
                delayed = self.action_history[0]
                self.action_history = self.action_history[1:] + [new_action]
                new_action = delayed
            if self._error:
                new_action = np.zeros(4)
                done = True
            action = new_action
            self.action = action
            self.tick += 1
            if bool(done):
                break
        return obs, float(reward), bool(done), info, action

    # -- high-level command API (firmware_wrapper.py:483-663) -------------------
    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(("_fullState", (np.asarray(pos, float), np.asarray(vel, float), np.asarray(acc, float), float(yaw), np.asarray(rpy_rate, float))))

    def sendTakeoffCmd(self, height, duration):
        self.command_queue.append(("_takeoff", (float(height), float(duration))))

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append(("_takeoff", (float(height), float(duration), float(yaw))))

    def sendLandCmd(self, height, duration):
        self.command_queue.append(("_land", (float(height), float(duration))))

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append(("_land", (float(height), float(duration), float(yaw))))

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append(("_goto", (np.asarray(pos, float), float(yaw), float(duration_s), bool(relative))))

    def sendStopCmd(self):
        self.command_queue.append(("_stop", ()))

    def sendNotifySetpointStop(self, *args):
        self.command_queue.append(("_notify_stop", ()))

    def _process_command_queue(self, sim_time):
        if self.command_queue:
            cmd, args = self.command_queue.pop(0)
            self._cmd_time = sim_time
            getattr(self, cmd)(sim_time, *args)

    # -- command implementations -------------------------------------------------
    def _fullState(self, t, pos, vel, acc, yaw, rpy_rate):
        self.full_state_cmd_override = True
        self._plan = None
        self.setpoint = {"pos": pos, "vel": vel, "acc": acc, "yaw": yaw, "omega": rpy_rate}

    def _plan_poly7(self, t, duration, p1, yaw1):
        """Plan a 7th-order no-jerk move from the CURRENT setpoint state to
        (p1, yaw1) at rest — the firmware planner's plan_takeoff/plan_land/
        plan_go_to shape (crtpCommanderHighLevel* -> pptraj poly7_nojerk)."""
        p0 = np.asarray(self.setpoint["pos"], float)
        v0 = np.asarray(self.setpoint["vel"], float)
        a0 = np.asarray(self.setpoint["acc"], float)
        coeffs = np.stack([
            _poly7_nojerk(duration, p0[i], v0[i], a0[i], float(p1[i]), 0.0, 0.0)
            for i in range(3)
        ])
        yaw_c = _poly7_nojerk(duration, float(self.setpoint["yaw"]), 0.0, 0.0,
                              float(yaw1), 0.0, 0.0)
        self._plan = ("poly7", t, max(float(duration), 1e-6), coeffs, yaw_c)

    def _takeoff(self, t, height, duration, yaw=0.0):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        self._plan_poly7(t, duration, [p0[0], p0[1], height], yaw)

    def _land(self, t, height, duration, yaw=0.0):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        self._plan_poly7(t, duration, [p0[0], p0[1], height], yaw)

    def _goto(self, t, pos, yaw, duration, relative):
        self.full_state_cmd_override = False
        p0 = np.asarray(self.setpoint["pos"], float)
        p1 = p0 + np.asarray(pos, float) if relative else np.asarray(pos, float)
        self._plan_poly7(t, duration, p1, yaw)

    def _stop(self, t):
        self.full_state_cmd_override = False
        self._plan = None
        self.pwms = np.zeros(4)
        self._error = True  # motors off

    def _notify_stop(self, t):
        self.full_state_cmd_override = False

    def _update_setpoint(self, t):
        if self.full_state_cmd_override or self._plan is None:
            return
        kind, t0, duration, coeffs, yaw_c = self._plan
        tau = float(np.clip(t - t0, 0.0, duration))
        pva = np.array([_poly_eval(coeffs[i], tau) for i in range(3)])
        yaw, yaw_rate, _ = _poly_eval(yaw_c, tau)
        if t - t0 >= duration:
            # Plan finished: hold the endpoint at rest (planner's hover hold).
            pva[:, 1:] = 0.0
            yaw_rate = 0.0
        self.setpoint = {
            "pos": pva[:, 0], "vel": pva[:, 1], "acc": pva[:, 2],
            "yaw": yaw, "omega": np.array([0.0, 0.0, yaw_rate]),
        }
