"""Mellinger geometric controller (pure JAX), Crazyflie-firmware numerics.

TPU-native counterpart of the pycffirmware ``controllerMellinger`` the
reference drives through SWIG at 500 Hz (firmware_wrapper.py:446-461).
Instead of binding the C firmware, the controller math is re-implemented from
the public Crazyflie firmware (controller_mellinger.c) with its default
gains, as a pure function over an explicit state PyTree — so thousands of
emulated firmware loops run in lockstep under vmap/scan.

Structure (Mellinger & Kumar 2011):
  position PID -> desired thrust vector F_des;
  thrust = massThrust * F_des . z_body;
  desired attitude from (F_des direction, commanded yaw);
  moments = -kR eR + kw ew + ki integral(eR) + kd_omega d(ew)/dt;
  X-configuration power distribution -> 4 motor PWMs
  (firmware_wrapper.py:688-707 _powerDistribution, including the brushed
  motor thrust->PWM map at :668-677).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.ops.rotations import rot_xyz

# Firmware default gains (controller_mellinger.c).
MASS_FW = 0.032
MASS_THRUST = 132000.0
KP = np.array([0.4, 0.4, 1.25])
KD = np.array([0.2, 0.2, 0.4])
KI = np.array([0.05, 0.05, 0.05])
I_RANGE = np.array([2.0, 2.0, 0.4])
KR_XY, KW_XY = 70000.0, 20000.0
KI_M_XY, I_RANGE_M_XY = 0.0, 1.0
KR_Z, KW_Z = 60000.0, 12000.0
KI_M_Z, I_RANGE_M_Z = 500.0, 1500.0
# Stock firmware gain (controller_mellinger.c kd_omega_rp = 200), run against
# the 80 Hz-low-passed finite-difference gyro the wrapper computes — the same
# signal path the real firmware sees (firmware_wrapper.py:248-268 + lpf2p).
KD_OMEGA_RP = 200.0
GRAVITY_MAG = 9.81
THRUST_MIN, THRUST_MAX = 20000.0, 65535.0  # control thrust clamp (PWM units)
MOMENT_CLAMP = 32000.0
MAX_PWM = 65535.0
SUPPLY_VOLTAGE = 3.0


class MellingerState(struct.PyTreeNode):
    i_error_pos: jnp.ndarray  # (3,)
    i_error_m: jnp.ndarray  # (3,) attitude integral
    prev_omega_rp: jnp.ndarray  # (2,) for the omega derivative term
    prev_setpoint_omega_rp: jnp.ndarray  # (2,)

    @classmethod
    def create(cls, dtype=jnp.float32):
        return cls(
            i_error_pos=jnp.zeros(3, dtype),
            i_error_m=jnp.zeros(3, dtype),
            prev_omega_rp=jnp.zeros(2, dtype),
            prev_setpoint_omega_rp=jnp.zeros(2, dtype),
        )


def mellinger_control(
    ms: MellingerState,
    dt,
    pos,
    vel,
    rpy,
    omega,  # body rates (rad/s)
    sp_pos,
    sp_vel=None,
    sp_acc=None,
    sp_yaw=0.0,
    sp_omega=None,  # feed-forward body rates (rad/s)
    mass: float = MASS_FW,
    kd_omega_rp: float = KD_OMEGA_RP,
):
    """One Mellinger tick -> (control dict, new state).

    control: {"thrust", "roll", "pitch", "yaw"} in firmware PWM-scale units,
    to be mixed by ``power_distribution``.
    """
    dtype = pos.dtype
    z3 = jnp.zeros(3, dtype)
    sp_vel = z3 if sp_vel is None else sp_vel
    sp_acc = z3 if sp_acc is None else sp_acc
    sp_omega = z3 if sp_omega is None else sp_omega

    r_error = sp_pos - pos
    v_error = sp_vel - vel
    i_error = jnp.clip(
        ms.i_error_pos + r_error * dt, -jnp.asarray(I_RANGE, dtype), jnp.asarray(I_RANGE, dtype)
    )
    kp, kd, ki = (jnp.asarray(a, dtype) for a in (KP, KD, KI))
    target_thrust = mass * sp_acc + kp * r_error + kd * v_error + ki * i_error
    target_thrust = target_thrust.at[2].add(mass * GRAVITY_MAG)

    R = rot_xyz(rpy[0], rpy[1], rpy[2])
    z_axis = R[:, 2]
    current_thrust = MASS_THRUST * jnp.dot(target_thrust, z_axis)

    z_des = target_thrust / jnp.linalg.norm(target_thrust)
    x_c = jnp.stack([jnp.cos(sp_yaw), jnp.sin(sp_yaw), jnp.zeros((), dtype)])
    y_des_un = jnp.cross(z_des, x_c)
    y_des = y_des_un / jnp.linalg.norm(y_des_un)
    x_des = jnp.cross(y_des, z_des)
    Rdes = jnp.stack([x_des, y_des, z_des], axis=-1)

    eRM = 0.5 * (Rdes.T @ R - R.T @ Rdes)
    eR = jnp.stack([eRM[2, 1], eRM[0, 2], eRM[1, 0]])
    ew = sp_omega - omega
    # d(omega)/dt damping on roll/pitch (controller_mellinger.c err_d terms).
    err_d = (
        (sp_omega[:2] - ms.prev_setpoint_omega_rp) - (omega[:2] - ms.prev_omega_rp)
    ) / jnp.maximum(dt, 1e-6)
    i_error_m = ms.i_error_m + (-eR) * dt
    i_error_m = i_error_m.at[:2].set(jnp.clip(i_error_m[:2], -I_RANGE_M_XY, I_RANGE_M_XY))
    i_error_m = i_error_m.at[2].set(jnp.clip(i_error_m[2], -I_RANGE_M_Z, I_RANGE_M_Z))

    # NOTE on kd_omega_rp: the stock 200 is tuned against a REAL MEMS gyro.
    # The SITL gyro is a finite-difference of Euler angles through a 30 Hz
    # LPF; err_d differentiates that reconstruction AGAIN at 500 Hz, and the
    # resulting lag+noise turns the term into negative rate-loop damping —
    # measured: a 2 m/s hover kick RETURNS at 2.4 m/s and exits the arena
    # with 200, damps cleanly with 0.  Stock value kept as the default for
    # firmware parity; the competition stack passes 0 (see
    # competition/getting_started.py).
    Mx = -KR_XY * eR[0] + KW_XY * ew[0] + KI_M_XY * i_error_m[0] + kd_omega_rp * err_d[0]
    My = -KR_XY * eR[1] + KW_XY * ew[1] + KI_M_XY * i_error_m[1] + kd_omega_rp * err_d[1]
    Mz = -KR_Z * eR[2] + KW_Z * ew[2] + KI_M_Z * i_error_m[2]

    # Sign conventions at the mixer: with the X-configuration mixing
    # (power_distribution) and the firmware->env motor remap, a positive
    # control.pitch / control.yaw produces a NEGATIVE physical body moment —
    # the firmware compensates with its legacy inverted-pitch convention
    # (controller_mellinger.c flips eR.y/gyro.y; control->yaw = -M.z).  The
    # moments above are in the consistent SDFormat convention, so pitch and
    # yaw are negated here.
    control = {
        "thrust": jnp.clip(current_thrust, THRUST_MIN, THRUST_MAX),
        "roll": jnp.clip(Mx, -MOMENT_CLAMP, MOMENT_CLAMP),
        "pitch": jnp.clip(-My, -MOMENT_CLAMP, MOMENT_CLAMP),
        "yaw": jnp.clip(-Mz, -MOMENT_CLAMP, MOMENT_CLAMP),
    }
    new_state = MellingerState(
        i_error_pos=i_error,
        i_error_m=i_error_m,
        prev_omega_rp=omega[:2],
        prev_setpoint_omega_rp=sp_omega[:2],
    )
    return control, new_state


def _motors_get_pwm(thrust):
    """Brushed-motor thrust->PWM map (firmware_wrapper.py:668-677)."""
    t = thrust / 65536.0 * 60.0
    volts = -0.0006239 * t**2 + 0.088 * t
    percentage = jnp.minimum(1.0, volts / SUPPLY_VOLTAGE)
    return percentage * MAX_PWM


def power_distribution(control):
    """X-configuration mixing -> 4 PWMs (firmware_wrapper.py:688-707)."""
    r = control["roll"] / 2.0
    p = control["pitch"] / 2.0
    t, y = control["thrust"], control["yaw"]
    raw = jnp.stack([t - r + p + y, t - r - p - y, t + r - p + y, t + r + p - y])
    limited = jnp.clip(raw, 0.0, MAX_PWM)
    return _motors_get_pwm(limited)


class MellingerController:
    """Registry-facing shell: track a position setpoint on the 3D quadrotor.

    A lightweight stand-in for full firmware emulation (see
    envs/firmware.py for the SITL wrapper with command queue + sensor path).
    """

    def __init__(self, env, **kwargs):
        from safe_control_gym_tpu.envs.quadrotor import KF, PWM2RPM_CONST, PWM2RPM_SCALE, MIN_PWM

        self.env = env
        self.dt = env.ctrl_timestep
        self.x_goal = jnp.asarray(env.x_goal)
        self.ms = MellingerState.create()
        self._kf = KF
        self._scale, self._const, self._min_pwm = PWM2RPM_SCALE, PWM2RPM_CONST, MIN_PWM
        self._step_i = 0
        self._make_lpf()

    def _make_lpf(self):
        # Same gyro conditioning as the SITL wrapper: finite-difference Euler
        # rates through the reference's (swapped-cutoff) 30 Hz lpf2p — the
        # stock KD_OMEGA_RP=200 derivative term is only stable against this
        # filtered signal, not raw analytic body rates.
        from safe_control_gym_tpu.controllers.firmware import FirmwareWrapper, Lpf2p

        fs = 1.0 / self.dt
        self._gyro_lpf = [
            Lpf2p(fs, FirmwareWrapper.ACCEL_LPF_CUTOFF_FREQ) for _ in range(3)
        ]
        self._prev_rpy = None

    def reset(self):
        self.ms = MellingerState.create()
        self._step_i = 0
        self._make_lpf()

    def select_action(self, obs, info=None):
        x = jnp.asarray(obs)
        pos = jnp.stack([x[0], x[2], x[4]])
        vel = jnp.stack([x[1], x[3], x[5]])
        rpy = x[6:9]
        rpy_np = np.asarray(x[6:9], dtype=float)
        if self._prev_rpy is None:
            rates = np.zeros(3)
        else:
            rates = (rpy_np - self._prev_rpy) / self.dt
        self._prev_rpy = rpy_np
        omega = jnp.asarray(
            [self._gyro_lpf[i].apply(rates[i]) for i in range(3)], x.dtype
        )
        g = (
            self.x_goal
            if self.x_goal.ndim == 1
            else self.x_goal[min(self._step_i, self.x_goal.shape[0] - 1)]
        )
        sp_pos = jnp.stack([g[0], g[2], g[4]])
        sp_vel = jnp.stack([g[1], g[3], g[5]])
        control, self.ms = mellinger_control(
            self.ms, self.dt, pos, vel, rpy, omega, sp_pos, sp_vel
        )
        pwms = power_distribution(control)
        rpm = self._scale * jnp.clip(pwms, self._min_pwm, MAX_PWM) + self._const
        # Firmware motor numbering -> env motor numbering ([3, 2, 1, 0],
        # firmware_wrapper.py:277-278).
        forces = (self._kf * rpm**2)[jnp.asarray([3, 2, 1, 0])]
        self._step_i += 1
        import numpy as _np

        return _np.asarray(forces)
