"""DSL Crazyflie two-stage PID controller (pure JAX, vmappable).

TPU-native counterpart of the reference's PID
(safe_control_gym/controllers/pid/pid.py and the
``PIDController`` in envs/gym_pybullet_drones/quadrotor_utils.py:70-278):
position PID -> target thrust + attitude, attitude PID -> per-motor RPM
through the mixer matrix.  Controller state (integral and last-error terms)
is an explicit PyTree, so thousands of PID instances run in lockstep under
``vmap`` — the reference steps one drone at a time on the host.

Angle conventions follow the engine's SDFormat extrinsic-XYZ Euler state
(the reference converts through quaternions; its target-rotation extraction
uses scipy intrinsic 'XYZ' — we stay in one consistent extrinsic convention).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.envs.benchmark import Task
from safe_control_gym_tpu.envs.quadrotor import (
    KF, MASS, GRAVITY_ACC, MAX_PWM, MIN_PWM, PWM2RPM_CONST, PWM2RPM_SCALE, QuadType,
)
from safe_control_gym_tpu.ops.rotations import rot_xyz

# Default gains (quadrotor_utils.py:84-89).
P_FOR = np.array([0.4, 0.4, 1.25])
I_FOR = np.array([0.05, 0.05, 0.05])
D_FOR = np.array([0.2, 0.2, 0.5])
P_TOR = np.array([70000.0, 70000.0, 60000.0])
I_TOR = np.array([0.0, 0.0, 500.0])
D_TOR = np.array([20000.0, 20000.0, 12000.0])
MIXER = np.array([[0.5, -0.5, 1.0], [0.5, 0.5, -1.0], [-0.5, 0.5, 1.0], [-0.5, -0.5, -1.0]])


class PIDState(struct.PyTreeNode):
    """Integrators and last errors (quadrotor_utils.py:126-137)."""

    integral_pos_e: jnp.ndarray
    integral_rpy_e: jnp.ndarray
    last_rpy: jnp.ndarray

    @classmethod
    def create(cls, dtype=jnp.float32):
        z = jnp.zeros(3, dtype)
        return cls(z, z, z)


def _mat_to_euler_xyz(R):
    """Extrinsic-XYZ Euler angles from R = Rz(psi)Ry(theta)Rx(phi)."""
    theta = jnp.arcsin(-R[2, 0])
    phi = jnp.arctan2(R[2, 1], R[2, 2])
    psi = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.stack([phi, theta, psi])


def pid_control(
    state: PIDState,
    dt,
    cur_pos,
    cur_rpy,
    cur_vel,
    target_pos,
    target_rpy=None,
    target_vel=None,
    target_rpy_rates=None,
    g: float = GRAVITY_ACC,
    mass: float = MASS,
):
    """One PID step -> (rpm (4,), new_state, pos_error, yaw_error).

    Mirrors PIDController.compute_control / _compute_force_and_euler /
    _compute_rpms (quadrotor_utils.py:139-278).
    """
    dtype = cur_pos.dtype
    zero3 = jnp.zeros(3, dtype)
    target_rpy = zero3 if target_rpy is None else target_rpy
    target_vel = zero3 if target_vel is None else target_vel
    target_rpy_rates = zero3 if target_rpy_rates is None else target_rpy_rates
    gravity = g * mass

    R = rot_xyz(cur_rpy[0], cur_rpy[1], cur_rpy[2])
    pos_e = target_pos - cur_pos
    vel_e = target_vel - cur_vel
    integral_pos_e = jnp.clip(state.integral_pos_e + pos_e * dt, -2.0, 2.0)
    integral_pos_e = integral_pos_e.at[2].set(jnp.clip(integral_pos_e[2], -0.15, 0.15))
    target_thrust = (
        jnp.asarray(P_FOR, dtype) * pos_e
        + jnp.asarray(I_FOR, dtype) * integral_pos_e
        + jnp.asarray(D_FOR, dtype) * vel_e
        + jnp.asarray([0.0, 0.0, gravity], dtype)
    )
    scalar_thrust = jnp.maximum(0.0, jnp.dot(target_thrust, R[:, 2]))
    thrust_pwm = (jnp.sqrt(scalar_thrust / (4 * KF)) - PWM2RPM_CONST) / PWM2RPM_SCALE
    # Desired attitude from thrust direction + commanded yaw
    # (quadrotor_utils.py:228-234).
    target_z = target_thrust / jnp.linalg.norm(target_thrust)
    target_xc = jnp.stack(
        [jnp.cos(target_rpy[2]), jnp.sin(target_rpy[2]), jnp.zeros((), dtype)]
    )
    yc = jnp.cross(target_z, target_xc)
    target_y = yc / jnp.linalg.norm(yc)
    target_x = jnp.cross(target_y, target_z)
    Rt = jnp.stack([target_x, target_y, target_z], axis=-1)
    target_euler = _mat_to_euler_xyz(Rt)

    # Attitude PID (quadrotor_utils.py:239-278).
    Rd = rot_xyz(target_euler[0], target_euler[1], target_euler[2])
    rot_e_m = Rd.T @ R - R.T @ Rd
    rot_e = jnp.stack([rot_e_m[2, 1], rot_e_m[0, 2], rot_e_m[1, 0]])
    rpy_rates_e = target_rpy_rates - (cur_rpy - state.last_rpy) / dt
    integral_rpy_e = jnp.clip(state.integral_rpy_e - rot_e * dt, -1500.0, 1500.0)
    integral_rpy_e = integral_rpy_e.at[:2].set(jnp.clip(integral_rpy_e[:2], -1.0, 1.0))
    target_torques = (
        -jnp.asarray(P_TOR, dtype) * rot_e
        + jnp.asarray(D_TOR, dtype) * rpy_rates_e
        + jnp.asarray(I_TOR, dtype) * integral_rpy_e
    )
    target_torques = jnp.clip(target_torques, -3200.0, 3200.0)
    pwm = jnp.clip(thrust_pwm + jnp.asarray(MIXER, dtype) @ target_torques, MIN_PWM, MAX_PWM)
    rpm = PWM2RPM_SCALE * pwm + PWM2RPM_CONST
    new_state = PIDState(integral_pos_e, integral_rpy_e, cur_rpy)
    return rpm, new_state, pos_e, target_euler[2] - cur_rpy[2]


class PID(BaseController):
    """Eval controller for the quadrotor env (reference pid.py:65-152 runs it
    on the 2D quad with paired motor forces)."""

    def __init__(self, env, **kwargs):
        super().__init__(env, **kwargs)
        self.quad_type = QuadType(env.config.quad_type)
        self.task = Task(env.config.task)
        self.dt = env.ctrl_timestep
        self.x_goal = jnp.asarray(env.x_goal)
        self.pid_state = PIDState.create()
        self._step_i = 0

    def reset(self):
        self.pid_state = PIDState.create()
        self._step_i = 0

    def _targets(self, k):
        if self.task == Task.STABILIZATION:
            g = self.x_goal
        else:
            g = self.x_goal[jnp.clip(k, 0, self.x_goal.shape[0] - 1)]
        if self.quad_type == QuadType.ONE_D:
            pos = jnp.stack([0.0 * g[0], 0.0 * g[0], g[0]])
            vel = jnp.stack([0.0 * g[1], 0.0 * g[1], g[1]])
        elif self.quad_type == QuadType.TWO_D:
            pos = jnp.stack([g[0], 0.0 * g[0], g[2]])
            vel = jnp.stack([g[1], 0.0 * g[1], g[3]])
        else:
            pos = jnp.stack([g[0], g[2], g[4]])
            vel = jnp.stack([g[1], g[3], g[5]])
        return pos, vel

    def _unpack(self, obs):
        x = jnp.asarray(obs)
        if self.quad_type == QuadType.ONE_D:
            pos = jnp.stack([0.0 * x[0], 0.0 * x[0], x[0]])
            vel = jnp.stack([0.0 * x[1], 0.0 * x[1], x[1]])
            rpy = jnp.zeros(3, x.dtype)
        elif self.quad_type == QuadType.TWO_D:
            pos = jnp.stack([x[0], 0.0 * x[0], x[2]])
            vel = jnp.stack([x[1], 0.0 * x[1], x[3]])
            rpy = jnp.stack([0.0 * x[4], x[4], 0.0 * x[4]])
        else:
            pos = jnp.stack([x[0], x[2], x[4]])
            vel = jnp.stack([x[1], x[3], x[5]])
            rpy = x[6:9]
        return pos, vel, rpy

    def select_action(self, obs, info=None):
        pos, vel, rpy = self._unpack(obs)
        t_pos, t_vel = self._targets(self._step_i)
        rpm, self.pid_state, _, _ = pid_control(
            self.pid_state, self.dt, pos, rpy, vel, t_pos, target_vel=t_vel
        )
        forces = np.asarray(rpm) ** 2 * KF
        self._step_i += 1
        if self.quad_type == QuadType.ONE_D:
            return np.array([forces.sum()])
        if self.quad_type == QuadType.TWO_D:
            # Paired motor forces (pid.py eval loop: action = (f1+f4, f2+f3)).
            return np.array([forces[0] + forces[3], forces[1] + forces[2]])
        return forces
