"""Quadrotor environment (pure JAX): 1D / 2D / 3D Crazyflie-class quadrotor.

TPU-native re-design of the reference's PyBullet quadrotor
(safe_control_gym/envs/gym_pybullet_drones/quadrotor.py + base_aviary.py).
Instead of stepping a C++ physics engine through ~150 FFI crossings per
control step (SURVEY §3.1), the ground-truth dynamics ARE the closed-form
rigid-body ODE the reference ships as its CasADi "prior"
(quadrotor.py:581-697), integrated with explicit RK4 at the physics rate —
so "simulator" and "symbolic model" collapse into one jit/vmap-able function.

Capability parity with the reference:
  * quad types 1D (z), 2D (x-z), 3D (quadrotor.py:594-674 dynamics);
  * the thrust -> PWM -> RPM -> per-motor-force actuation pipeline including
    PWM clipping (quadrotor.py:815-842, quadrotor_utils.py:21-67);
  * physics modes: ``pyb`` (RK4 on the analytic ODE), ``dyn`` (explicit
    Euler, reference base_aviary.py:522-576), plus ``pyb_gnd`` / ``pyb_drag``
    / ``pyb_dw`` / ``pyb_gnd_drag_dw`` aero augmentations
    (base_aviary.py:437-520; downwash is a no-op for a single drone);
  * stabilization + trajectory-tracking tasks with figure8/circle/square
    references (quadrotor.py:261-329);
  * rl_reward / quadratic / competition costs (quadrotor.py:886-954);
  * done logic: goal reached, out-of-bound masks, collision, completion,
    time-limit truncation (quadrotor.py:956-1002, benchmark_env.py:458-462);
  * constraints, obs/action/dynamics disturbances, adversary channel
    (benchmark_env.py:256-266), domain randomization of inertial properties
    and initial state (quadrotor.py:454-493) — all per-env, carried in the
    state PyTree so every env in a batch draws its own physics;
  * IROS-2022 competition layer: gates/obstacles maze with randomized poses
    (quadrotor.py:370-451), gate-passing detection, collision detection, and
    sparse competition reward (quadrotor.py:932-954, 1059-1133) — as analytic
    geometry (envs/gates.py) instead of PyBullet ray casts.
"""

from __future__ import annotations

import dataclasses
import math
from enum import IntEnum
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.envs import benchmark as bm
from safe_control_gym_tpu.envs import gates as gate_geom
from safe_control_gym_tpu.envs.benchmark import Cost, EnvSpaces, FnEnv, Task
from safe_control_gym_tpu.envs.constraints import build_constraints
from safe_control_gym_tpu.envs.disturbances import build_disturbances
from safe_control_gym_tpu.models.dynamics_model import DynamicsModel
from safe_control_gym_tpu.ops.integrators import rk4_step
from safe_control_gym_tpu.ops.rotations import body_z_world, rot_xyz, transform_trajectory

BIG = 1e30


class QuadType(IntEnum):
    """Reference quadrotor_utils.py:11-18."""

    ONE_D = 1
    TWO_D = 2
    THREE_D = 3


# --------------------------------------------------------------------------
# cf2x.urdf physical constants (parsed by the reference at
# base_aviary.py:612-651; IROS-2022 measured mass).
# --------------------------------------------------------------------------
MASS = 0.03454
ARM_L = 0.0397
J_DIAG = (1.4e-5, 1.4e-5, 2.17e-5)
KF = 3.16e-10
KM = 7.94e-12
THRUST2WEIGHT = 2.25
PWM2RPM_SCALE = 0.2685
PWM2RPM_CONST = 4070.3
MIN_PWM = 20000.0
MAX_PWM = 65535.0
GND_EFF_COEFF = 11.36859
PROP_RADIUS = 2.31348e-2
DRAG_COEFF = (9.1785e-7, 9.1785e-7, 10.311e-7)
GRAVITY_ACC = 9.8
GROUND_PLANE_Z = 0.0

# Derived (base_aviary.py:138-147).
GRAVITY_FORCE = GRAVITY_ACC * MASS
MAX_RPM = math.sqrt((THRUST2WEIGHT * GRAVITY_FORCE) / (4 * KF))
MAX_THRUST = 4 * KF * MAX_RPM**2
GND_EFF_H_CLIP = 0.25 * PROP_RADIUS * math.sqrt(
    (15 * MAX_RPM**2 * KF * GND_EFF_COEFF) / MAX_THRUST
)

# Default randomization infos (quadrotor.py:45-134).
_DEFAULT_INERTIAL_RAND = {
    "M": {"distrib": "uniform", "low": 0.022, "high": 0.032},
    "Ixx": {"distrib": "uniform", "low": 1.3e-5, "high": 1.5e-5},
    "Iyy": {"distrib": "uniform", "low": 1.3e-5, "high": 1.5e-5},
    "Izz": {"distrib": "uniform", "low": 2.07e-5, "high": 2.27e-5},
}
_DEFAULT_INIT_RAND = {
    "init_x": {"distrib": "uniform", "low": -0.5, "high": 0.5},
    "init_x_dot": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_y": {"distrib": "uniform", "low": -0.5, "high": 0.5},
    "init_y_dot": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_z": {"distrib": "uniform", "low": 0.1, "high": 1.5},
    "init_z_dot": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_phi": {"distrib": "uniform", "low": -0.3, "high": 0.3},
    "init_theta": {"distrib": "uniform", "low": -0.3, "high": 0.3},
    "init_psi": {"distrib": "uniform", "low": -0.3, "high": 0.3},
    "init_p": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_theta_dot": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_q": {"distrib": "uniform", "low": -0.01, "high": 0.01},
    "init_r": {"distrib": "uniform", "low": -0.01, "high": 0.01},
}
_DEFAULT_TASK_INFO = {
    "stabilization_goal": [0, 1],
    "stabilization_goal_tolerance": 0.05,
    "trajectory_type": "circle",
    "num_cycles": 1,
    "trajectory_plane": "zx",
    "trajectory_position_offset": [0.5, 0],
    "trajectory_scale": -0.5,
    "proj_point": [0, 0, 0.5],
    "proj_normal": [0, 1, 1],
}

STATE_LABELS = {
    QuadType.ONE_D: ("z", "z_dot"),
    QuadType.TWO_D: ("x", "x_dot", "z", "z_dot", "theta", "theta_dot"),
    QuadType.THREE_D: (
        "x", "x_dot", "y", "y_dot", "z", "z_dot",
        "phi", "theta", "psi", "p", "q", "r",
    ),
}
INIT_LABELS = {
    QuadType.ONE_D: ("init_x", "init_x_dot"),  # aliased to (z, z_dot), quadrotor.py:208
    QuadType.TWO_D: ("init_x", "init_x_dot", "init_z", "init_z_dot",
                     "init_theta", "init_theta_dot"),
    QuadType.THREE_D: ("init_x", "init_x_dot", "init_y", "init_y_dot",
                       "init_z", "init_z_dot", "init_phi", "init_theta",
                       "init_psi", "init_p", "init_q", "init_r"),
}


@dataclasses.dataclass(frozen=True)
class QuadrotorConfig:
    quad_type: int = 2
    physics: str = "pyb"
    seed: Optional[int] = None
    ctrl_freq: int = 50
    pyb_freq: int = 50
    episode_len_sec: float = 5.0
    task: str = "stabilization"
    task_info: Optional[dict] = None
    cost: str = "rl_reward"
    normalized_rl_action_space: bool = False
    norm_act_scale: float = 0.1
    obs_goal_horizon: int = 0
    # Initial state.
    init_state: Optional[Any] = None
    randomized_init: bool = True
    init_state_randomization_info: Optional[dict] = None
    # Inertial properties.
    inertial_prop: Optional[Any] = None
    prior_prop: Optional[Any] = None
    randomized_inertial_prop: bool = False
    inertial_prop_randomization_info: Optional[dict] = None
    # Constraints.
    constraints: Optional[tuple] = None
    done_on_violation: bool = False
    use_constraint_penalty: bool = False
    constraint_penalty: float = -1.0
    # Disturbances / adversary.
    disturbances: Optional[dict] = None
    adversary_disturbance: Optional[str] = None
    adversary_disturbance_offset: float = 0.0
    adversary_disturbance_scale: float = 0.01
    # Reward shaping.
    rew_state_weight: Any = 1.0
    rew_act_weight: Any = 0.0001
    rew_exponential: bool = True
    done_on_out_of_bound: bool = True
    info_mse_metric_state_weight: Optional[Any] = None
    # Competition maze.
    gates: Optional[tuple] = None
    obstacles: Optional[tuple] = None
    randomized_gates_and_obstacles: bool = False
    gates_and_obstacles_randomization_info: Optional[dict] = None
    done_on_collision: bool = False
    done_on_completion: bool = False
    # Engine.
    dtype: Any = jnp.float32
    q_weight: Optional[Any] = None
    r_weight: Optional[Any] = None
    # Fused Pallas substep kernel for the batched 3D hot path:
    # None = auto (TPU backend, f32, eligible batch), False = never,
    # True = force (interpret mode off-TPU; tests).
    use_pallas: Optional[bool] = None
    # Trajectory-goal lookup strategy: one-hot MXU contraction (fast on TPU)
    # vs plain gather (fast on CPU).  None = auto from the default backend at
    # construction time; pin explicitly when building under one backend but
    # stepping under another.
    onehot_goal: Optional[bool] = None


class QuadState(struct.PyTreeNode):
    x: jnp.ndarray  # (nx,)
    key: jnp.ndarray
    ctrl_step: jnp.ndarray
    pyb_step: jnp.ndarray
    # Counter-based reset stream identity (ops/ctr_prng.py): reset draws are
    # pure functions of (env_seed, episode_idx, slot), shared bit-exactly
    # with the whole-rollout Pallas engine.
    env_seed: jnp.ndarray  # int32 counter-PRNG identity (ops/ctr_prng.py)
    episode_idx: jnp.ndarray  # int32
    # Per-episode randomized physics (quadrotor.py:454-475).
    mass: jnp.ndarray
    j_diag: jnp.ndarray  # (3,)
    dist_sched: dict
    cnstr_violation: jnp.ndarray
    adv_force: jnp.ndarray  # (3,) world-frame adversary dynamics force
    adv_act: jnp.ndarray  # (nu,) adversary action offset
    # Competition maze state.
    gates_eff: jnp.ndarray  # (NG, 4): x, y, yaw, aperture height
    obstacles_eff: jnp.ndarray  # (NO, 2): x, y
    current_gate: jnp.ndarray  # int32
    stepped_through_gate: jnp.ndarray  # bool
    currently_collided: jnp.ndarray  # bool
    at_goal_pos: jnp.ndarray  # bool
    steps_at_goal: jnp.ndarray  # int32
    task_completed: jnp.ndarray  # bool


# --------------------------------------------------------------------------
# Actuation pipeline (quadrotor_utils.py:21-67).
# --------------------------------------------------------------------------

def cmd2pwm(thrust, dtype):
    """Thrust command(s) -> 4 motor PWMs. thrust: (1,), (2,) or (4,)."""
    n_motor = 4 // thrust.shape[-1]
    thrust = jnp.maximum(thrust, 0.0)
    pwm = (jnp.sqrt(thrust / n_motor / KF) - PWM2RPM_CONST) / PWM2RPM_SCALE
    if thrust.shape[-1] == 1:
        pwm = jnp.repeat(pwm, 4, axis=-1)
    elif thrust.shape[-1] == 2:
        pwm = jnp.concatenate([pwm, pwm[..., ::-1]], axis=-1)  # motors (T1,T2,T2,T1)
    return jnp.clip(pwm, MIN_PWM, MAX_PWM).astype(dtype)


def pwm2rpm(pwm):
    return PWM2RPM_SCALE * pwm + PWM2RPM_CONST


# --------------------------------------------------------------------------
# Closed-form continuous dynamics (quadrotor.py:594-674), with optional
# aero augmentation terms (base_aviary.py:437-520) and external world force.
# All take per-motor squared-rpm forces f (4,) and return x_dot.
# --------------------------------------------------------------------------

def quad_fc_1d(x, forces, mass, ext_fz, g=GRAVITY_ACC):
    T = jnp.sum(forces, axis=-1)
    z_dot = x[..., 1]
    z_dd = T / mass - g + ext_fz / mass
    return jnp.stack([z_dot, z_dd], -1)


def quad_fc_2d(x, forces, mass, iyy, ext_fx, ext_fz, g=GRAVITY_ACC):
    # Effective paired thrusts: T1 = motors 1&4, T2 = motors 2&3
    # (cmd2pwm pairing, quadrotor_utils.py:44-45).
    T1 = forces[..., 0] + forces[..., 3]
    T2 = forces[..., 1] + forces[..., 2]
    theta = x[..., 4]
    x_dd = jnp.sin(theta) * (T1 + T2) / mass + ext_fx / mass
    z_dd = jnp.cos(theta) * (T1 + T2) / mass - g + ext_fz / mass
    theta_dd = ARM_L * (T2 - T1) / iyy / np.sqrt(2.0)
    return jnp.stack(
        [x[..., 1], x_dd, x[..., 3], z_dd, x[..., 5], theta_dd], -1
    )


def quad_fc_3d(x, forces, mass, j_diag, ext_f, g=GRAVITY_ACC, km_over_kf=KM / KF):
    """Full 3D rigid body (quadrotor.py:624-674): SDFormat Euler angles,
    body rates (p, q, r), world-frame velocity."""
    phi, theta, psi = x[..., 6], x[..., 7], x[..., 8]
    pqr = x[..., 9:12]
    f1, f2, f3, f4 = forces[..., 0], forces[..., 1], forces[..., 2], forces[..., 3]
    # Thrust direction = body z-axis in world frame; closed form instead of
    # Rob @ [0, 0, T] (TPU f32 matmuls default to bf16 — see ops/rotations.py).
    T = f1 + f2 + f3 + f4
    zb = body_z_world(phi, theta, psi)
    gvec = jnp.stack([jnp.zeros_like(f1), jnp.zeros_like(f1), jnp.full_like(f1, g)], -1)
    m = jnp.asarray(mass)[..., None]
    pos_dd = zb * T[..., None] / m - gvec + ext_f / m
    # Body moments (quadrotor.py:667-669).
    l_sq2 = ARM_L / np.sqrt(2.0)
    Mb = jnp.stack(
        [
            l_sq2 * (f1 + f2 - f3 - f4),
            l_sq2 * (-f1 + f2 + f3 - f4),
            km_over_kf * (f1 - f2 + f3 - f4),
        ],
        -1,
    )
    Jw = j_diag * pqr
    gyro = jnp.cross(pqr, Jw)
    rate_dot = (Mb - gyro) / j_diag
    # Euler-angle kinematics (quadrotor.py:671-673).
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    tth, cth = jnp.tan(theta), jnp.cos(theta)
    p_, q_, r_ = pqr[..., 0], pqr[..., 1], pqr[..., 2]
    ang_dot = jnp.stack(
        [
            p_ + sphi * tth * q_ + cphi * tth * r_,
            cphi * q_ - sphi * r_,
            sphi / cth * q_ + cphi / cth * r_,
        ],
        -1,
    )
    return jnp.concatenate(
        [
            jnp.stack(
                [x[..., 1], pos_dd[..., 0], x[..., 3], pos_dd[..., 1],
                 x[..., 5], pos_dd[..., 2]],
                -1,
            ),
            ang_dot,
            rate_dot,
        ],
        -1,
    )


def _weights_vec(w, dim, dtype):
    w = np.asarray(w, dtype=float).reshape(-1)
    if w.size == 1:
        w = np.full(dim, w[0])
    assert w.size == dim, f"weight size {w.size} != {dim}"
    # NumPy on purpose: these are build-time closure constants of traced
    # functions; a device array here costs a device_get at every lowering
    # (minutes over a remote tunnel).
    return np.asarray(w, dtype)


def make_quadrotor(config: QuadrotorConfig = QuadrotorConfig()) -> FnEnv:
    cfg = config
    dtype = cfg.dtype
    quad_type = QuadType(cfg.quad_type)
    task = Task(cfg.task)
    cost = Cost(cfg.cost)
    n_sub = bm.check_timing(cfg.pyb_freq, cfg.ctrl_freq)
    ctrl_dt = 1.0 / cfg.ctrl_freq
    pyb_dt = 1.0 / cfg.pyb_freq
    max_steps = int(cfg.episode_len_sec * cfg.ctrl_freq)
    task_info = {**_DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    physics = cfg.physics
    if physics not in ("pyb", "dyn", "pyb_gnd", "pyb_drag", "pyb_dw", "pyb_gnd_drag_dw"):
        raise ValueError(f"unknown physics mode {physics!r}")
    use_gnd = physics in ("pyb_gnd", "pyb_gnd_drag_dw")
    use_drag = physics in ("pyb_drag", "pyb_gnd_drag_dw")

    nx = {QuadType.ONE_D: 2, QuadType.TWO_D: 6, QuadType.THREE_D: 12}[quad_type]
    nu = {QuadType.ONE_D: 1, QuadType.TWO_D: 2, QuadType.THREE_D: 4}[quad_type]

    # Nominal inertial properties with optional override (quadrotor.py:241-256).
    nom_mass, nom_j = MASS, np.array(J_DIAG)
    ip = cfg.inertial_prop
    if ip is not None:
        if isinstance(ip, dict):
            nom_mass = float(ip.get("M", ip.get("mass", nom_mass)))
            nom_j[0] = float(ip.get("Ixx", ip.get("ixx", nom_j[0])))
            nom_j[1] = float(ip.get("Iyy", ip.get("iyy", nom_j[1])))
            nom_j[2] = float(ip.get("Izz", ip.get("izz", nom_j[2])))
        else:
            arr = np.asarray(ip, dtype=float)
            if quad_type == QuadType.ONE_D:
                nom_mass = float(arr[0])
            elif quad_type == QuadType.TWO_D:
                nom_mass, nom_j[1] = float(arr[0]), float(arr[1])
            else:
                nom_mass, nom_j[0], nom_j[1], nom_j[2] = map(float, arr)

    # Spaces (quadrotor.py:699-806).
    x_thr, y_thr, z_thr = 5.0, 5.0, 2.5
    phi_thr = theta_thr = 85 * math.pi / 180
    psi_thr = math.pi
    if quad_type == QuadType.ONE_D:
        s_low = np.array([GROUND_PLANE_Z, -BIG])
        s_high = np.array([z_thr, BIG])
        oob_mask = np.array([1, 0])
    elif quad_type == QuadType.TWO_D:
        s_low = np.array([-x_thr, -BIG, GROUND_PLANE_Z, -BIG, -theta_thr, -BIG])
        s_high = np.array([x_thr, BIG, z_thr, BIG, theta_thr, BIG])
        oob_mask = np.array([1, 0, 1, 0, 1, 0])
    else:
        s_low = np.array(
            [-x_thr, -BIG, -y_thr, -BIG, GROUND_PLANE_Z, -BIG,
             -phi_thr, -theta_thr, -psi_thr, -BIG, -BIG, -BIG]
        )
        s_high = np.array(
            [x_thr, BIG, y_thr, BIG, z_thr, BIG,
             phi_thr, theta_thr, psi_thr, BIG, BIG, BIG]
        )
        oob_mask = np.array([1, 0, 1, 0, 1, 0, 1, 1, 1, 0, 0, 0])

    hover_thrust = GRAVITY_ACC * nom_mass / nu
    if cfg.normalized_rl_action_space:
        a_low, a_high = -np.ones(nu), np.ones(nu)
    else:
        n_motors = 4 / nu
        a_low = np.full(
            nu, KF * n_motors * (PWM2RPM_SCALE * MIN_PWM + PWM2RPM_CONST) ** 2
        )
        a_high = np.full(
            nu, KF * n_motors * (PWM2RPM_SCALE * MAX_PWM + PWM2RPM_CONST) ** 2
        )

    # Goal references (quadrotor.py:261-329).
    u_goal = np.ones(nu) * nom_mass * GRAVITY_ACC / nu
    if task == Task.STABILIZATION:
        sg = task_info["stabilization_goal"]
        if quad_type == QuadType.ONE_D:
            x_goal = np.array([sg[1], 0.0])
        elif quad_type == QuadType.TWO_D:
            x_goal = np.array([sg[0], 0.0, sg[1], 0.0, 0.0, 0.0])
        else:
            # 3D goal is (x, y, z); a 2-element default [x, z] (the reference
            # class default, quadrotor.py:137) is lifted to (x, 0, z).
            sg3 = list(sg) if len(sg) >= 3 else [sg[0], 0.0, sg[-1]]
            x_goal = np.hstack([sg3[0], 0.0, sg3[1], 0.0, sg3[2], 0.0, np.zeros(6)])
    else:
        pos, vel, _ = bm.generate_trajectory(
            traj_type=task_info["trajectory_type"],
            traj_length=cfg.episode_len_sec,
            num_cycles=task_info["num_cycles"],
            traj_plane=task_info["trajectory_plane"],
            position_offset=task_info["trajectory_position_offset"],
            scaling=task_info["trajectory_scale"],
            sample_time=ctrl_dt,
        )
        if quad_type == QuadType.ONE_D:
            x_goal = np.stack([pos[:, 2], vel[:, 2]], -1)
        elif quad_type == QuadType.TWO_D:
            z = np.zeros(pos.shape[0])
            x_goal = np.stack([pos[:, 0], vel[:, 0], pos[:, 2], vel[:, 2], z, z], -1)
        else:
            pos_t, vel_t = transform_trajectory(
                jnp.asarray(pos), jnp.asarray(vel),
                task_info["proj_point"], task_info["proj_normal"],
            )
            pos_t, vel_t = np.asarray(pos_t), np.asarray(vel_t)
            z = np.zeros(pos.shape[0])
            x_goal = np.stack(
                [pos_t[:, 0], vel_t[:, 0], pos_t[:, 1], vel_t[:, 1],
                 pos_t[:, 2], vel_t[:, 2], z, z, z, z, z, z], -1
            )

    mul = 1
    if cost == Cost.RL_REWARD and cfg.obs_goal_horizon > 0:
        mul = (1 + cfg.obs_goal_horizon) if task == Task.TRAJ_TRACKING else 2
    spaces = EnvSpaces(
        state_low=s_low,
        state_high=s_high,
        action_low=a_low,
        action_high=a_high,
        obs_low=np.concatenate([s_low] * mul),
        obs_high=np.concatenate([s_high] * mul),
    )

    constraints = build_constraints(cfg.constraints, spaces)
    dist_specs = cfg.disturbances or {}
    dyn_dim = int(quad_type)  # DISTURBANCE_MODES dims (quadrotor.py:808-813)
    dist_progs = {
        "observation": build_disturbances(
            dist_specs.get("observation"), nx, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
        "action": build_disturbances(
            dist_specs.get("action"), nu, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
        "dynamics": build_disturbances(
            dist_specs.get("dynamics"), dyn_dim, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
    }

    init_rand = {k: v for k, v in _DEFAULT_INIT_RAND.items() if k in INIT_LABELS[quad_type]}
    if cfg.init_state_randomization_info is not None:
        init_rand = dict(cfg.init_state_randomization_info)
    inertial_rand = dict(_DEFAULT_INERTIAL_RAND)
    if quad_type == QuadType.ONE_D:
        for k in ("Ixx", "Iyy", "Izz"):
            inertial_rand.pop(k, None)
    elif quad_type == QuadType.TWO_D:
        for k in ("Ixx", "Izz"):
            inertial_rand.pop(k, None)
    if cfg.inertial_prop_randomization_info is not None:
        inertial_rand = dict(cfg.inertial_prop_randomization_info)

    init_state = cfg.init_state
    if init_state is None:
        init_state = {}
    elif isinstance(init_state, (list, tuple, np.ndarray)):
        init_state = dict(zip(INIT_LABELS[quad_type], np.asarray(init_state)))

    # Competition maze (static nominal poses).
    gates_nom = np.asarray(cfg.gates if cfg.gates else np.zeros((0, 7)), dtype=float).reshape(-1, 7)
    obstacles_nom = np.asarray(
        cfg.obstacles if cfg.obstacles else np.zeros((0, 6)), dtype=float
    ).reshape(-1, 6)
    NG, NO = gates_nom.shape[0], obstacles_nom.shape[0]
    gate_types = gates_nom[:, 6].astype(int) if NG else np.zeros(0, int)
    gate_heights_nom = np.array([gate_geom.GATE_HEIGHTS[t] for t in gate_types])
    go_rand = cfg.gates_and_obstacles_randomization_info or {}

    rew_state_w = _weights_vec(cfg.rew_state_weight, nx, dtype)
    rew_act_w = _weights_vec(cfg.rew_act_weight, nu, dtype)
    if cfg.info_mse_metric_state_weight is None:
        mse_w_np = {
            QuadType.ONE_D: [1, 0],
            QuadType.TWO_D: [1, 0, 1, 0, 0, 0],
            QuadType.THREE_D: [1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0],
        }[quad_type]
    else:
        mse_w_np = cfg.info_mse_metric_state_weight
    mse_w = _weights_vec(mse_w_np, nx, dtype)
    # All build-time constants stay NumPy (embedded free at lowering; device
    # arrays would each cost a device_get per trace — see _weights_vec note).
    Q = np.diag(_weights_vec(cfg.q_weight, nx, dtype)) if cfg.q_weight is not None else np.eye(nx, dtype=dtype)
    R = np.diag(_weights_vec(cfg.r_weight, nu, dtype)) if cfg.r_weight is not None else np.eye(nu, dtype=dtype)
    x_goal_j = np.asarray(x_goal, dtype)
    u_goal_j = np.asarray(u_goal, dtype)
    goal_tol = float(task_info["stabilization_goal_tolerance"])
    drag_coeff = np.asarray(DRAG_COEFF, dtype)

    def _extend_obs(obs, next_step):
        if mul == 1:
            return obs
        if task == Task.TRAJ_TRACKING:
            idx = jnp.clip(
                next_step + jnp.arange(cfg.obs_goal_horizon), 0, x_goal_j.shape[0] - 1
            )
            return jnp.concatenate([obs, _goal_rows(idx).reshape(-1)])
        return jnp.concatenate([obs, x_goal_j.reshape(-1)])

    def _obs(state: QuadState, key):
        obs = state.x
        prog = dist_progs["observation"]
        if prog is not None:
            obs = prog.apply(
                state.dist_sched["observation"], key, state.ctrl_step, state.pyb_step,
                obs, x=state.x,
            )
        return _extend_obs(obs, state.ctrl_step + 1)

    # TPU gathers over the trajectory table are slow (kCustom gather,
    # measured ~23 us/step at B=4096); a one-hot contraction rides the MXU
    # instead (~1 us).  CPU keeps the plain gather.  cfg.onehot_goal pins the
    # choice; None auto-detects from the default backend at construction.
    if cfg.onehot_goal is not None:
        _onehot_goal = bool(cfg.onehot_goal) and task == Task.TRAJ_TRACKING
    else:
        _onehot_goal = (
            task == Task.TRAJ_TRACKING
            and jax.devices()[0].platform in ("tpu", "axon")
        )

    def _goal_rows(steps):
        """Trajectory reference row(s) for (possibly batched) step indices."""
        wp = jnp.clip(steps, 0, x_goal_j.shape[0] - 1)
        if _onehot_goal:
            # HIGHEST precision: the default TPU matmul rounds the f32 table
            # to bf16 (~0.4% goal-position error) — this lookup must be exact.
            oh = jax.nn.one_hot(wp, x_goal_j.shape[0], dtype=x_goal_j.dtype)
            return jnp.matmul(oh, x_goal_j, precision=jax.lax.Precision.HIGHEST)
        # jnp view of the NumPy table: embeds as an in-program constant
        # (NumPy can't be fancy-indexed by a tracer).
        return jnp.asarray(x_goal_j)[wp]

    def _pos3d(x):
        """World position of the drone for any quad type."""
        if quad_type == QuadType.ONE_D:
            return jnp.stack([jnp.zeros_like(x[0]), jnp.zeros_like(x[0]), x[0]])
        if quad_type == QuadType.TWO_D:
            return jnp.stack([x[0], jnp.zeros_like(x[0]), x[2]])
        return jnp.stack([x[0], x[2], x[4]])

    # -- continuous dynamics with actuation forces baked in -------------------
    def _fc(x, forces, mass, j_diag, ext_f3):
        """x' given per-motor forces (4,) and world disturbance force (3,)."""
        if use_gnd or use_drag:
            forces, ext_f3 = _aero(x, forces, ext_f3)
        if quad_type == QuadType.ONE_D:
            return quad_fc_1d(x, forces, mass, ext_f3[2])
        if quad_type == QuadType.TWO_D:
            return quad_fc_2d(x, forces, mass, j_diag[1], ext_f3[0], ext_f3[2])
        return quad_fc_3d(x, forces, mass, j_diag, ext_f3)

    def _aero(x, forces, ext_f3):
        """Ground-effect / drag augmentation (base_aviary.py:437-496).

        Ground effect adds per-motor thrust (affects moments too); drag adds a
        body-frame force proportional to body-frame velocity and total prop
        speed.  Prop heights are approximated by the CoM height.
        """
        if quad_type == QuadType.ONE_D:
            z, vel = x[0], jnp.stack([jnp.zeros_like(x[1]), jnp.zeros_like(x[1]), x[1]])
            rob = jnp.eye(3, dtype=x.dtype)
            phi = theta = jnp.zeros_like(z)
        elif quad_type == QuadType.TWO_D:
            z = x[2]
            vel = jnp.stack([x[1], jnp.zeros_like(x[1]), x[3]])
            rob = rot_xyz(jnp.zeros_like(x[4]), x[4], jnp.zeros_like(x[4]))
            phi, theta = jnp.zeros_like(x[4]), x[4]
        else:
            z = x[4]
            vel = jnp.stack([x[1], x[3], x[5]])
            rob = rot_xyz(x[6], x[7], x[8])
            phi, theta = x[6], x[7]
        if use_gnd:
            h = jnp.maximum(z, GND_EFF_H_CLIP)
            ge = forces * GND_EFF_COEFF * (PROP_RADIUS / (4 * h)) ** 2
            upright = (jnp.abs(phi) < np.pi / 2) & (jnp.abs(theta) < np.pi / 2)
            forces = forces + jnp.where(upright, ge, 0.0)
        if use_drag:
            rpm_sum = jnp.sum(2 * np.pi * jnp.sqrt(forces / KF) / 60)
            drag_body = -drag_coeff * rpm_sum * (rob.T @ vel)
            ext_f3 = ext_f3 + rob @ drag_body
        return forces, ext_f3

    # Consolidated reset randomization: one uniform draw covers inertia (4)
    # + initial state (nx) fields.  Per-field keyed draws cost ~19 threefry
    # invocations per masked auto-reset step (~6 us/step at B=4096 on v5p);
    # one (4+nx,) draw with precomputed affine bounds is a single pass.
    def _rand_bounds():
        names = ["M", "Ixx", "Iyy", "Izz"]
        infos = [inertial_rand if cfg.randomized_inertial_prop else {}] * 4
        names += list(INIT_LABELS[quad_type])
        infos += [init_rand if cfg.randomized_init else {}] * nx
        lo, hi = [], []
        for name, info in zip(names, infos):
            if name in info:
                lo.append(float(info[name]["low"]))
                hi.append(float(info[name]["high"]))
            else:
                lo.append(0.0)
                hi.append(0.0)
        # Host (NumPy) constants, deliberately: build-time jnp.asarray would
        # commit these to the device, and every later trace of reset() then
        # pays a device_get to embed them as MLIR constants — ~84 s EACH over
        # a remote-tunnel backend (measured; 3 constants made env.reset's
        # lowering take 250 s).  NumPy closure constants embed for free.
        return np.asarray(lo, dtype), np.asarray(hi, dtype)

    _rand_lo, _rand_hi = _rand_bounds()
    _nominal_rand = np.asarray(
        [nom_mass, *nom_j]
        + [float(init_state.get(n, 0.0)) for n in INIT_LABELS[quad_type]],
        dtype,
    )

    def _reset_core(env_seed, episode_idx, noise_key, obs_key):
        """Counter-based reset draws (ops/ctr_prng.py): every randomization
        channel is a pure function of (env_seed, episode_idx, slot), shared
        bit-exactly with the whole-rollout Pallas engine's in-kernel
        auto-reset (fast_env.step_env_core).  Slot layout: 0..3 inertia,
        4..4+nx-1 init state, 4+nx impulse offset, then 3 per gate
        (x, y, yaw) and 2 per obstacle (x, y).

        ``noise_key`` seeds the carried step-noise stream (disturbance /
        observation noise — engine-specific by design); ``obs_key`` the
        reset observation's noise draw."""
        from safe_control_gym_tpu.ops import ctr_prng

        n_slots = 4 + nx + 1 + 3 * NG + 2 * NO
        base = ctr_prng.episode_base(env_seed, episode_idx)
        u_all = ctr_prng.uniform_slots(base, n_slots).astype(dtype)
        k_do, k_da, k_dd = (jax.random.fold_in(noise_key, i) for i in (11, 12, 13))
        # Inertial + initial-state randomization (additive uniform,
        # quadrotor.py:454-493) in one fused draw.
        u = u_all[: 4 + nx]
        drawn = _nominal_rand + _rand_lo + u * (_rand_hi - _rand_lo)
        mass = drawn[0]
        j_diag = drawn[1:4]
        x0 = drawn[4:]
        # Gate / obstacle pose randomization (quadrotor.py:370-434).
        g_xy = jnp.asarray(gates_nom[:, :2], dtype) if NG else jnp.zeros((0, 2), dtype)
        g_yaw = jnp.asarray(gates_nom[:, 5], dtype) if NG else jnp.zeros((0,), dtype)
        g_h = jnp.asarray(gate_heights_nom, dtype) if NG else jnp.zeros((0,), dtype)
        o_xy = jnp.asarray(obstacles_nom[:, :2], dtype) if NO else jnp.zeros((0, 2), dtype)
        if cfg.randomized_gates_and_obstacles:
            gi = go_rand.get("gates", {"low": -0.15, "high": 0.15})
            oi = go_rand.get("obstacles", {"low": -0.15, "high": 0.15})
            m0 = 4 + nx + 1
            if NG:
                ug = u_all[m0:m0 + 3 * NG].reshape(NG, 3)
                glo, ghi = float(gi["low"]), float(gi["high"])
                g_xy = g_xy + glo + ug[:, :2] * (ghi - glo)
                g_yaw = g_yaw + glo + ug[:, 2] * (ghi - glo)
            if NO:
                uo = u_all[m0 + 3 * NG:m0 + 3 * NG + 2 * NO].reshape(NO, 2)
                olo, ohi = float(oi["low"]), float(oi["high"])
                o_xy = o_xy + olo + uo * (ohi - olo)
        gates_eff = jnp.concatenate([g_xy, g_yaw[:, None], g_h[:, None]], -1)
        sched = {
            m: (p.init(k) if p is not None else jnp.zeros((0,), jnp.int32))
            for (m, p), k in zip(dist_progs.items(), [k_do, k_da, k_dd])
        }
        # Impulse step offsets come from the shared counter stream (slot
        # 4+nx), overriding the keyed randint: floor(u * max_steps), the
        # same formula the kernel applies on in-kernel resets.
        dyn_sched = sched.get("dynamics")
        if isinstance(dyn_sched, dict) and dyn_sched.get("offsets") is not None \
                and np.prod(dyn_sched["offsets"].shape) == 1:
            dyn_sched = dict(dyn_sched)
            dyn_sched["offsets"] = jnp.floor(
                u_all[4 + nx] * max_steps
            ).astype(jnp.int32).reshape(dyn_sched["offsets"].shape)
            sched["dynamics"] = dyn_sched
        state = QuadState(
            x=x0,
            key=noise_key,
            ctrl_step=jnp.zeros((), jnp.int32),
            pyb_step=jnp.zeros((), jnp.int32),
            env_seed=env_seed,
            episode_idx=jnp.asarray(episode_idx, jnp.int32),
            mass=mass,
            j_diag=j_diag,
            dist_sched=sched,
            cnstr_violation=jnp.zeros((), bool),
            adv_force=jnp.zeros((3,), dtype),
            adv_act=jnp.zeros((nu,), dtype),
            gates_eff=gates_eff,
            obstacles_eff=o_xy,
            current_gate=jnp.zeros((), jnp.int32),
            stepped_through_gate=jnp.zeros((), bool),
            currently_collided=jnp.zeros((), bool),
            at_goal_pos=jnp.zeros((), bool),
            steps_at_goal=jnp.zeros((), jnp.int32),
            task_completed=jnp.zeros((), bool),
        )
        obs = _obs(state, obs_key)
        info = {}
        if constraints is not None:
            info["constraint_values_state"] = constraints.get_state_values(state.x)
        return state, obs, info

    def reset(key):
        from safe_control_gym_tpu.ops import ctr_prng

        env_seed = ctr_prng.env_seed_from_key(key)
        noise_key = jax.random.fold_in(key, 7919)
        return _reset_core(
            env_seed, jnp.zeros((), jnp.int32), noise_key,
            jax.random.fold_in(noise_key, jnp.int32(-1)),
        )

    def reset_episode(state: QuadState, noise_key):
        """Fresh episode for an auto-resetting env: same env identity, next
        episode index — the masked-reset path (vector.py) and the in-kernel
        path (fast_env) draw identical randomization from this counter."""
        return _reset_core(
            state.env_seed, state.episode_idx + 1, noise_key,
            jax.random.fold_in(noise_key, jnp.int32(-1)),
        )

    def set_adversary_control(state: QuadState, adv_action):
        """Functional analogue of env.set_adversary_control (benchmark_env.py:256-266)."""
        adv = jnp.clip(jnp.asarray(adv_action, dtype), -1.0, 1.0)
        adv = adv * cfg.adversary_disturbance_scale + cfg.adversary_disturbance_offset
        if cfg.adversary_disturbance == "action":
            return state.replace(adv_act=adv)
        if cfg.adversary_disturbance == "dynamics":
            if quad_type == QuadType.ONE_D:
                f = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), adv.reshape(())])
            elif quad_type == QuadType.TWO_D:
                f = jnp.stack([adv[0], jnp.zeros((), dtype), adv[1]])
            else:
                f = adv.reshape(3)
            return state.replace(adv_force=f)
        raise RuntimeError("adversary_disturbance is not configured for this env.")

    # Fused Pallas fast path for the batched 3D substep loop (ops/pallas_quad).
    # The unbatched primal below is the exact historical chain, so per-env
    # numerics (and the CPU oracle tests) are untouched; only eligible
    # vmapped TPU executions route to the fused kernel.
    fused_integrator = None
    if (
        quad_type == QuadType.THREE_D
        and not (use_gnd or use_drag)
        and cfg.use_pallas is not False
    ):
        from safe_control_gym_tpu.ops.pallas_quad import make_quad3d_integrator

        def _xla_substeps(x, thrust, ext_f3, mass, j_diag):
            # Identical chain to the unfused path: actuation pipeline then
            # the substep loop (the kernel fuses both; the primal must match).
            forces = pwm2rpm(cmd2pwm(thrust, dtype)) ** 2 * KF
            fc_l = lambda xx, uu: _fc(xx, uu, mass, j_diag, ext_f3)
            if physics == "dyn":
                for _ in range(n_sub):
                    x = x + pyb_dt * fc_l(x, forces)
            else:
                for _ in range(n_sub):
                    x = rk4_step(fc_l, x, forces, pyb_dt)
            return x

        fused_integrator = make_quad3d_integrator(
            _xla_substeps, pyb_dt, n_sub, euler=(physics == "dyn"),
            actuation=True, force_pallas=cfg.use_pallas,
        )

    def step(state: QuadState, action):
        key, k_step = jax.random.split(state.key)
        k_act = jax.random.fold_in(k_step, 0)
        k_dyn = jax.random.fold_in(k_step, 1)
        k_obs = jax.random.fold_in(k_step, 2)

        action = jnp.asarray(action, dtype).reshape(nu)
        # Preprocess (quadrotor.py:815-842).
        if cfg.normalized_rl_action_space:
            clipped = jnp.clip(action, -1.0, 1.0)
            thrust = (1.0 + cfg.norm_act_scale * clipped) * hover_thrust
        else:
            thrust = jnp.clip(action, jnp.asarray(a_low, dtype), jnp.asarray(a_high, dtype))
        preprocessed = thrust
        prog = dist_progs["action"]
        if prog is not None:
            thrust = prog.apply(
                state.dist_sched["action"], k_act, state.ctrl_step, state.pyb_step,
                thrust, x=state.x,
            )
        if cfg.adversary_disturbance == "action":
            thrust = thrust + state.adv_act
        if fused_integrator is None:
            rpm = pwm2rpm(cmd2pwm(thrust, dtype))
            forces = (rpm**2) * KF

        # Dynamics disturbance force (quadrotor.py:526-548).
        ext = jnp.zeros((dyn_dim,), dtype)
        prog = dist_progs["dynamics"]
        if prog is not None:
            ext = prog.apply(
                state.dist_sched["dynamics"], k_dyn, state.ctrl_step, state.pyb_step,
                ext, x=state.x,
            )
        if quad_type == QuadType.ONE_D:
            ext_f3 = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), ext[0]])
        elif quad_type == QuadType.TWO_D:
            ext_f3 = jnp.stack([ext[0], jnp.zeros((), dtype), ext[1]])
        else:
            ext_f3 = ext
        if cfg.adversary_disturbance == "dynamics":
            ext_f3 = ext_f3 + state.adv_force

        x = state.x
        if fused_integrator is not None:
            # Actuation pipeline runs inside the fused kernel (thrust in).
            x = fused_integrator(x, thrust, ext_f3, state.mass, state.j_diag)
        else:
            fc = lambda x, u: _fc(x, u, state.mass, state.j_diag, ext_f3)
            if physics == "dyn":
                for _ in range(n_sub):
                    x = x + pyb_dt * fc(x, forces)
            else:
                for _ in range(n_sub):
                    x = rk4_step(fc, x, forces, pyb_dt)

        sched = state.dist_sched
        if any(p is not None and p.has_brownian for p in dist_progs.values()):
            k_walk = jax.random.fold_in(k_step, 3)
            sched = {
                mode: (prog.evolve(sched[mode], jax.random.fold_in(k_walk, i))
                       if prog is not None else sched[mode])
                for i, (mode, prog) in enumerate(dist_progs.items())
            }
        new_state = state.replace(
            x=x,
            key=key,
            dist_sched=sched,
            adv_force=jnp.zeros((3,), dtype),
            adv_act=jnp.zeros((nu,), dtype),
        )

        info = {}
        # -- competition info: collision, gate progress (quadrotor.py:1029-1133)
        pos = _pos3d(x)
        collided = gate_geom.ground_collision(pos)
        if NG:
            g_hit = gate_geom.gate_collision(
                pos, new_state.gates_eff[:, :2], new_state.gates_eff[:, 2],
                new_state.gates_eff[:, 3],
            )
            collided = collided | jnp.any(g_hit)
        if NO:
            o_hit = gate_geom.obstacle_collision(pos, new_state.obstacles_eff)
            collided = collided | jnp.any(o_hit)
        info["collision"] = collided
        new_state = new_state.replace(currently_collided=collided)

        stepped_through = jnp.zeros((), bool)
        if NG:
            # Gate progress after the initial settling window
            # (quadrotor.py:1060: pyb_step_counter > 0.5 * PYB_FREQ).
            active = (state.pyb_step > 0.5 * cfg.pyb_freq) & (
                state.current_gate < NG
            )
            hits = gate_geom.gate_pass_hit(
                pos, new_state.gates_eff[:, :2], new_state.gates_eff[:, 2],
                new_state.gates_eff[:, 3],
            )
            cur_hit = jnp.where(
                active, hits[jnp.clip(state.current_gate, 0, NG - 1)], False
            )
            stepped_through = cur_hit
            new_gate = state.current_gate + cur_hit.astype(jnp.int32)
            new_state = new_state.replace(
                current_gate=new_gate, stepped_through_gate=cur_hit
            )
            in_range = gate_geom.gate_in_range(
                pos, new_state.gates_eff[:, :2], new_state.gates_eff[:, 3]
            )
            cg = jnp.clip(new_gate, 0, NG - 1)
            has_gate = new_gate < NG
            info["current_target_gate_id"] = jnp.where(has_gate, new_gate, -1)
            info["current_target_gate_in_range"] = jnp.where(has_gate, in_range[cg], False)
            # Pose exposed as [x, y, z, r, p, yaw]: effective when in range,
            # nominal otherwise (quadrotor.py:1101-1106).
            eff = new_state.gates_eff[cg]
            eff_pose = jnp.stack(
                [eff[0], eff[1], eff[3], jnp.zeros((), dtype), jnp.zeros((), dtype), eff[2]]
            )
            nom_pose = jnp.asarray(gates_nom[:, :6], dtype)[cg]
            info["current_target_gate_pos"] = jnp.where(
                info["current_target_gate_in_range"], eff_pose, nom_pose
            )
            info["current_target_gate_type"] = jnp.where(
                has_gate, jnp.asarray(gate_types, jnp.int32)[cg], -1
            )
        else:
            new_gate = state.current_gate
            info["current_target_gate_id"] = jnp.asarray(-1, jnp.int32)
            info["current_target_gate_in_range"] = jnp.zeros((), bool)
            info["current_target_gate_pos"] = jnp.zeros((6,), dtype)
            info["current_target_gate_type"] = jnp.asarray(-1, jnp.int32)

        # At-goal / task completion (quadrotor.py:1114-1133), 3D only.
        at_goal = jnp.zeros((), bool)
        completed = state.task_completed
        steps_at_goal = state.steps_at_goal
        if quad_type == QuadType.THREE_D:
            goal_xyz = jnp.stack([x_goal_j[..., 0], x_goal_j[..., 2], x_goal_j[..., 4]]) \
                if task == Task.STABILIZATION else \
                jnp.stack([x_goal_j[0, 0], x_goal_j[0, 2], x_goal_j[0, 4]])
            past_gates = new_gate >= NG
            near = jnp.linalg.norm(pos - goal_xyz) < goal_tol
            at_goal = past_gates & near
            steps_at_goal = jnp.where(at_goal, state.steps_at_goal + 1, 0)
            completed = completed | (steps_at_goal > cfg.ctrl_freq * 2)
        new_state = new_state.replace(
            at_goal_pos=at_goal, steps_at_goal=steps_at_goal, task_completed=completed
        )
        info["at_goal_position"] = at_goal
        info["task_completed"] = completed

        # -- done (quadrotor.py:956-1002)
        goal_reached = jnp.zeros((), bool)
        done = jnp.zeros((), bool)
        goal = x_goal_j if task == Task.STABILIZATION else _goal_rows(state.ctrl_step)
        if task == Task.STABILIZATION and cost == Cost.QUADRATIC:
            goal_reached = jnp.linalg.norm(x - goal) < goal_tol
            done = done | goal_reached
            info["goal_reached"] = goal_reached
        if cfg.done_on_out_of_bound:
            oob = (x < jnp.asarray(s_low, dtype)) | (x > jnp.asarray(s_high, dtype))
            done = done | jnp.any(oob * jnp.asarray(oob_mask, dtype) > 0)
        if cfg.done_on_collision:
            done = done | collided
        if cfg.done_on_completion:
            done = done | completed

        # -- reward (quadrotor.py:886-954)
        act_err = preprocessed - u_goal_j
        if cost == Cost.RL_REWARD:
            state_err = x - goal
            dist = jnp.sum(rew_state_w * state_err * state_err) + jnp.sum(
                rew_act_w * act_err * act_err
            )
            rew = jnp.exp(-dist) if cfg.rew_exponential else -dist
        elif cost == Cost.QUADRATIC:
            dx = x - goal
            du = preprocessed - u_goal_j
            rew = -(0.5 * dx @ Q @ dx + 0.5 * du @ R @ du)
        else:  # COMPETITION (quadrotor.py:932-954)
            rew = (
                100.0 * stepped_through.astype(dtype)
                + 100.0 * at_goal.astype(dtype)
                - 1000.0 * collided.astype(dtype)
                # Note: uses the PREVIOUS step's violation flag, matching the
                # reference's eval order (reward computed before after_step
                # re-evaluates constraints).
                - 100.0 * state.cnstr_violation.astype(dtype)
            )

        # -- mse metric (quadrotor.py:1014-1025)
        err = (x - goal) * mse_w
        info["mse"] = jnp.sum(err**2)

        # -- after_step (benchmark_env.py:422-463)
        violated = state.cnstr_violation
        if constraints is not None:
            c_val = constraints.get_values(x, action)
            violated = constraints.is_violated(c_val)
            info["constraint_values"] = c_val
            info["constraint_violation"] = violated.astype(jnp.int32)
            if cfg.done_on_violation:
                done = done | violated
            if cost == Cost.RL_REWARD and cfg.use_constraint_penalty:
                rew = jnp.where(
                    constraints.is_almost_active(c_val), rew + cfg.constraint_penalty, rew
                )
        # Numerical safety net: integrating past the Euler singularity
        # (|theta| -> pi/2 within one control step's substeps) or any other
        # blow-up produces non-finite state; NaN comparisons are all False,
        # so without this guard the episode would never terminate.  Freeze
        # the last finite state and end the episode.
        finite = jnp.all(jnp.isfinite(x))
        x = jnp.where(finite, x, state.x)
        done = done | ~finite
        new_state = new_state.replace(x=x)
        # The reward was computed from the blown-up state, so the terminal
        # step would still emit NaN and poison episode returns / advantages;
        # zero it alongside the state freeze.
        rew = jnp.where(finite, rew, jnp.zeros_like(rew))

        new_ctrl = state.ctrl_step + 1
        timeout = new_ctrl >= max_steps
        info["TimeLimit.truncated"] = timeout & ~done
        done = done | timeout
        new_state = new_state.replace(
            ctrl_step=new_ctrl,
            pyb_step=state.pyb_step + n_sub,
            cnstr_violation=violated,
        )
        obs = _obs(new_state, k_obs)
        return new_state, obs, jnp.asarray(rew, dtype), done, info

    # A-priori model on nominal parameters (ships to controllers like the
    # reference's reset-info symbolic model, quadrotor.py:1144).  Takes the
    # *commanded thrusts* as input (the symbolic model's U), not motor forces.
    nom_j_j = jnp.asarray(nom_j)

    def symbolic_fc(x_s, u_s):
        zero = jnp.zeros_like(u_s[..., 0])
        if quad_type == QuadType.ONE_D:
            # U = total thrust T (quadrotor.py:599-602).
            f = jnp.stack([u_s[..., 0], zero, zero, zero], -1)
            return quad_fc_1d(x_s, f, nom_mass, zero)
        if quad_type == QuadType.TWO_D:
            # U = (T1, T2) paired thrusts (quadrotor.py:613-621); map onto
            # motors (T1, T2, 0, 0) so T1 = f0+f3, T2 = f1+f2 reduce correctly.
            f = jnp.stack([u_s[..., 0], u_s[..., 1], zero, zero], -1)
            return quad_fc_2d(x_s, f, nom_mass, nom_j_j[1], zero, zero)
        return quad_fc_3d(x_s, u_s, jnp.asarray(nom_mass), nom_j_j, jnp.zeros(3, u_s.dtype))

    symbolic = DynamicsModel(fc_func=symbolic_fc, nx=nx, nu=nu, dt=ctrl_dt)

    return FnEnv(
        reset=reset,
        step=step,
        spaces=spaces,
        symbolic=symbolic,
        config=cfg,
        x_goal=x_goal,
        u_goal=u_goal,
        ctrl_freq=cfg.ctrl_freq,
        pyb_freq=cfg.pyb_freq,
        episode_len_sec=cfg.episode_len_sec,
        # Adversary channel setter (RARL/RAP; benchmark_env.py:256-266).
        extras={"set_adversary_control": set_adversary_control,
                # Counter-based per-episode reset (ops/ctr_prng.py) used by
                # the vectorized auto-reset path.
                "reset_episode": reset_episode},
    )


def make_quadrotor_from_dict(**kwargs) -> FnEnv:
    """Registry entry point: build from flat YAML kwargs (the reference passes
    ``make('quadrotor', **config.quadrotor_config)``, getting_started.py:76)."""
    known = {f.name for f in dataclasses.fields(QuadrotorConfig)}
    cfg_kwargs = {k: v for k, v in kwargs.items() if k in known}
    if "reseed_on_reset" in kwargs or "info_in_reset" in kwargs or "gui" in kwargs:
        pass  # host-loop concerns; the functional env is always reproducible
    return make_quadrotor(QuadrotorConfig(**cfg_kwargs))
