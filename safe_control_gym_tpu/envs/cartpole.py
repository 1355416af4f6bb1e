"""CartPole environment (pure JAX).

The IROS-2022 fork removed the CartPole env but kept its full config surface
(reference tests/scripts/verbose_api.yaml:1-90, Environment.CARTPOLE enum at
benchmark_env.py:43, SymmetricStateConstraint at constraints.py:371-415).
This implementation rebuilds it from that surface with the canonical
frictionless cart-pole dynamics used by upstream safe-control-gym (Florian
2007 / Barto et al.), as a closed-form ODE integrated with explicit RK4:

    state x = [x, x_dot, theta, theta_dot], input u = horizontal force F
    Mm   = m_cart + m_pole
    ml   = m_pole * l                  (l = half pole length)
    temp = (F + ml * theta_dot^2 sin(theta)) / Mm
    theta_dd = (g sin(theta) - cos(theta) temp) / (l (4/3 - m_pole cos^2(theta)/Mm))
    x_dd = temp - ml * theta_dd cos(theta) / Mm

Config keys (init_state, randomization infos, inertial_prop {pole_length,
pole_mass, cart_mass}, constraints, task_info, disturbances) mirror
verbose_api.yaml so reference YAMLs drop in unchanged.  Randomization is
*additive* to the nominal values, matching the reference's
``_randomize_values_by_info`` (benchmark_env.py:277-308).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.envs import benchmark as bm
from safe_control_gym_tpu.envs.benchmark import Cost, EnvSpaces, FnEnv, Task
from safe_control_gym_tpu.envs.constraints import build_constraints
from safe_control_gym_tpu.envs.disturbances import build_disturbances
from safe_control_gym_tpu.models.dynamics_model import DynamicsModel
from safe_control_gym_tpu.ops.integrators import rk4_step

BIG = 1e30


@dataclasses.dataclass(frozen=True)
class CartPoleConfig:
    seed: Optional[int] = None
    ctrl_freq: int = 50
    pyb_freq: int = 50
    episode_len_sec: float = 10.0
    task: str = "stabilization"
    task_info: Optional[dict] = None
    cost: str = "rl_reward"
    normalized_rl_action_space: bool = False
    # Initial state.
    init_state: Optional[Any] = None
    randomized_init: bool = True
    init_state_randomization_info: Optional[dict] = None
    # Inertial properties: {pole_length, pole_mass, cart_mass}.
    inertial_prop: Optional[dict] = None
    prior_prop: Optional[dict] = None
    randomized_inertial_prop: bool = False
    inertial_prop_randomization_info: Optional[dict] = None
    # Constraints / disturbances.
    constraints: Optional[tuple] = None
    done_on_violation: bool = False
    use_constraint_penalty: bool = False
    constraint_penalty: float = -1.0
    disturbances: Optional[dict] = None
    # Adversary channel (benchmark_env.py:256-266 is env-generic; cartpole is
    # the reference's canonical RARL task).
    adversary_disturbance: Optional[str] = None  # "action" | "dynamics"
    adversary_disturbance_offset: float = 0.0
    adversary_disturbance_scale: float = 0.01
    # RL reward shaping (mirrors upstream cartpole kwargs).
    rew_state_weight: Any = 1.0
    rew_act_weight: Any = 0.0001
    rew_exponential: bool = True
    done_on_out_of_bound: bool = True
    obs_goal_horizon: int = 0
    # Engine.
    dtype: Any = jnp.float32
    # Q/R for quadratic cost (None -> identity).
    q_weight: Optional[Any] = None
    r_weight: Optional[Any] = None


# Default randomization infos (verbose_api.yaml:15-52).
_DEFAULT_INIT_RAND = {
    "init_x": {"distrib": "uniform", "low": -0.05, "high": 0.05},
    "init_x_dot": {"distrib": "uniform", "low": -0.05, "high": 0.05},
    "init_theta": {"distrib": "uniform", "low": -0.05, "high": 0.05},
    "init_theta_dot": {"distrib": "uniform", "low": -0.05, "high": 0.05},
}
_DEFAULT_INERTIAL_RAND = {
    "pole_length": {"distrib": "uniform", "low": -0.05, "high": 0.05},
    "cart_mass": {"distrib": "uniform", "low": -0.05, "high": 0.05},
    "pole_mass": {"distrib": "uniform", "low": -0.05, "high": 0.05},
}
_DEFAULT_TASK_INFO = {
    "stabilization_goal": [0.0],
    "stabilization_goal_tolerance": 0.05,
    "trajectory_type": "circle",
    "num_cycles": 1,
    "trajectory_plane": "zx",
    "trajectory_position_offset": [0.0, 0.0],
    "trajectory_scale": 0.2,
}

GRAVITY = 9.8
ACTION_THRESHOLD = 10.0  # |F| <= 10 N (upstream cartpole action bound)
X_THRESHOLD = 2.4
THETA_THRESHOLD = 90.0 * np.pi / 180.0
STATE_LABELS = ("x", "x_dot", "theta", "theta_dot")


class CartPoleState(struct.PyTreeNode):
    x: jnp.ndarray  # (4,)
    key: jnp.ndarray
    ctrl_step: jnp.ndarray  # int32
    pyb_step: jnp.ndarray  # int32
    env_seed: jnp.ndarray  # int32 counter-PRNG identity (ops/ctr_prng.py)
    episode_idx: jnp.ndarray  # int32 episode counter for the reset stream
    pole_length: jnp.ndarray  # per-episode randomized physical params
    pole_mass: jnp.ndarray
    cart_mass: jnp.ndarray
    dist_sched: dict  # mode -> (n,) int32 offsets
    cnstr_violation: jnp.ndarray  # bool, carried across steps
    adv_force: jnp.ndarray  # (1,) adversary dynamics force on the cart
    adv_act: jnp.ndarray  # (1,) adversary action offset


def cartpole_fc(x, u, pole_length, pole_mass, cart_mass, g=GRAVITY):
    """Continuous-time cart-pole ODE; fully batched over leading dims."""
    x_dot, theta, theta_dot = x[..., 1], x[..., 2], x[..., 3]
    force = u[..., 0]
    l = pole_length / 2.0
    Mm = cart_mass + pole_mass
    ml = pole_mass * l
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    temp = (force + ml * theta_dot**2 * sin_t) / Mm
    theta_dd = (g * sin_t - cos_t * temp) / (l * (4.0 / 3.0 - pole_mass * cos_t**2 / Mm))
    x_dd = temp - ml * theta_dd * cos_t / Mm
    return jnp.stack([x_dot, x_dd, theta_dot, theta_dd], axis=-1)


def _weights_vec(w, dim, dtype):
    w = np.asarray(w, dtype=float).reshape(-1)
    if w.size == 1:
        w = np.full(dim, w[0])
    assert w.size == dim
    return jnp.asarray(w, dtype)


def make_cartpole(config: CartPoleConfig = CartPoleConfig()) -> FnEnv:
    """Build the functional CartPole env from a static config."""
    cfg = config
    dtype = cfg.dtype
    task = Task(cfg.task)
    cost = Cost(cfg.cost)
    n_sub = bm.check_timing(cfg.pyb_freq, cfg.ctrl_freq)
    ctrl_dt = 1.0 / cfg.ctrl_freq
    pyb_dt = 1.0 / cfg.pyb_freq
    max_steps = int(cfg.episode_len_sec * cfg.ctrl_freq)
    task_info = {**_DEFAULT_TASK_INFO, **(cfg.task_info or {})}

    # Nominal physical parameters.
    iprop = cfg.inertial_prop or {}
    nom_pole_length = float(iprop.get("pole_length", 1.0))
    nom_pole_mass = float(iprop.get("pole_mass", 0.1))
    nom_cart_mass = float(iprop.get("cart_mass", 1.0))

    # Spaces.
    state_low = np.array([-X_THRESHOLD * 2, -BIG, -THETA_THRESHOLD * 2, -BIG])
    state_high = -state_low
    if cfg.normalized_rl_action_space:
        act_low, act_high = np.array([-1.0]), np.array([1.0])
    else:
        act_low, act_high = np.array([-ACTION_THRESHOLD]), np.array([ACTION_THRESHOLD])

    # Goal references (upstream cartpole semantics: X_GOAL over [x, x_dot,
    # theta, theta_dot]).
    u_goal = np.zeros(1)
    if task == Task.STABILIZATION:
        x_goal = np.array([float(task_info["stabilization_goal"][0]), 0.0, 0.0, 0.0])
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
        x_goal = np.stack(
            [pos[:, 0], vel[:, 0], np.zeros(pos.shape[0]), np.zeros(pos.shape[0])], -1
        )

    # Observation space (goal-horizon augmentation, benchmark_env.py:406-420).
    mul = 1
    if cost == Cost.RL_REWARD and cfg.obs_goal_horizon > 0:
        mul = (1 + cfg.obs_goal_horizon) if task == Task.TRAJ_TRACKING else 2
    spaces = EnvSpaces(
        state_low=state_low,
        state_high=state_high,
        action_low=act_low,
        action_high=act_high,
        obs_low=np.concatenate([state_low] * mul),
        obs_high=np.concatenate([state_high] * mul),
    )

    constraints = build_constraints(cfg.constraints, spaces)
    dist_specs = cfg.disturbances or {}
    dist_progs = {
        "observation": build_disturbances(
            dist_specs.get("observation"), 4, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
        "action": build_disturbances(
            dist_specs.get("action"), 1, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
        "dynamics": build_disturbances(
            dist_specs.get("dynamics"), 1, cfg.episode_len_sec, cfg.ctrl_freq, cfg.pyb_freq
        ),
    }

    init_rand = {**_DEFAULT_INIT_RAND, **(cfg.init_state_randomization_info or {})}
    inertial_rand = {**_DEFAULT_INERTIAL_RAND, **(cfg.inertial_prop_randomization_info or {})}
    init_state = cfg.init_state or {}
    if isinstance(init_state, (list, np.ndarray)):
        init_state = dict(zip([f"init_{s}" for s in STATE_LABELS], np.asarray(init_state)))

    rew_state_w = _weights_vec(cfg.rew_state_weight, 4, dtype)
    rew_act_w = _weights_vec(cfg.rew_act_weight, 1, dtype)
    Q = jnp.diag(_weights_vec(cfg.q_weight, 4, dtype)) if cfg.q_weight is not None else jnp.eye(4, dtype=dtype)
    R = jnp.diag(_weights_vec(cfg.r_weight, 1, dtype)) if cfg.r_weight is not None else jnp.eye(1, dtype=dtype)
    x_goal_j = jnp.asarray(x_goal, dtype)
    u_goal_j = jnp.asarray(u_goal, dtype)
    goal_tol = float(task_info["stabilization_goal_tolerance"])

    # Consolidated randomization bounds in counter-slot order: 0..2 inertia
    # (pole_length, pole_mass, cart_mass), 3..6 initial state, 7 impulse
    # offset (same affine-draw scheme as quadrotor._reset_core).
    _rand_names = ["pole_length", "pole_mass", "cart_mass"] + [
        f"init_{s}" for s in STATE_LABELS
    ]
    _rand_infos = ([inertial_rand if cfg.randomized_inertial_prop else {}] * 3
                   + [init_rand if cfg.randomized_init else {}] * 4)
    _rand_lo = jnp.asarray(
        [float(i[n]["low"]) if n in i else 0.0
         for n, i in zip(_rand_names, _rand_infos)], dtype)
    _rand_hi = jnp.asarray(
        [float(i[n]["high"]) if n in i else 0.0
         for n, i in zip(_rand_names, _rand_infos)], dtype)
    _nominal_rand = jnp.asarray(
        [nom_pole_length, nom_pole_mass, nom_cart_mass]
        + [float(init_state.get(f"init_{s}", 0.0)) for s in STATE_LABELS], dtype)

    def _extend_obs(obs, next_step):
        """Goal-horizon obs augmentation (benchmark_env.py:406-420)."""
        if mul == 1:
            return obs
        if task == Task.TRAJ_TRACKING:
            idx = jnp.clip(
                next_step + jnp.arange(cfg.obs_goal_horizon), 0, x_goal_j.shape[0] - 1
            )
            return jnp.concatenate([obs, x_goal_j[idx].reshape(-1)])
        return jnp.concatenate([obs, x_goal_j.reshape(-1)])

    def _obs(state: CartPoleState, key):
        obs = state.x
        prog = dist_progs["observation"]
        if prog is not None:
            obs = prog.apply(
                state.dist_sched["observation"], key, state.ctrl_step, state.pyb_step,
                obs, x=state.x,
            )
        return _extend_obs(obs, state.ctrl_step + 1)

    def _reset_core(env_seed, episode_idx, noise_key, obs_key):
        """Counter-based reset draws (ops/ctr_prng.py): every randomization
        channel is a pure function of (env_seed, episode_idx, slot), shared
        bit-exactly with the whole-rollout Pallas engine's in-kernel
        auto-reset (parallel/fast_cartpole.py).  Slot layout: 0..2 inertia
        (pole_length, pole_mass, cart_mass), 3..6 initial state, 7 impulse
        step offset."""
        from safe_control_gym_tpu.ops import ctr_prng

        base = ctr_prng.episode_base(env_seed, episode_idx)
        u_all = ctr_prng.uniform_slots(base, 8).astype(dtype)
        drawn = _nominal_rand + _rand_lo + u_all[:7] * (_rand_hi - _rand_lo)
        pl, pm, cm = drawn[0], drawn[1], drawn[2]
        x0 = drawn[3:7]
        k_obs, k_act, k_dyn = (jax.random.fold_in(noise_key, i) for i in (11, 12, 13))
        sched = {
            m: (p.init(k) if p is not None else jnp.zeros((0,), jnp.int32))
            for (m, p), k in zip(dist_progs.items(), [k_obs, k_act, k_dyn])
        }
        # Impulse step offsets come from the shared counter stream (slot 7),
        # overriding the keyed randint — same formula the kernel applies on
        # in-kernel resets (quadrotor._reset_core does the same).
        dyn_sched = sched.get("dynamics")
        if isinstance(dyn_sched, dict) and dyn_sched.get("offsets") is not None \
                and np.prod(dyn_sched["offsets"].shape) == 1:
            dyn_sched = dict(dyn_sched)
            dyn_sched["offsets"] = jnp.floor(
                u_all[7] * max_steps
            ).astype(jnp.int32).reshape(dyn_sched["offsets"].shape)
            sched["dynamics"] = dyn_sched
        state = CartPoleState(
            x=x0,
            key=noise_key,
            ctrl_step=jnp.zeros((), jnp.int32),
            pyb_step=jnp.zeros((), jnp.int32),
            env_seed=env_seed,
            episode_idx=jnp.asarray(episode_idx, jnp.int32),
            pole_length=pl,
            pole_mass=pm,
            cart_mass=cm,
            dist_sched=sched,
            cnstr_violation=jnp.zeros((), bool),
            adv_force=jnp.zeros((1,), dtype),
            adv_act=jnp.zeros((1,), dtype),
        )
        obs = _obs(state, obs_key)
        info = {}
        if constraints is not None:
            info["constraint_values_state"] = constraints.get_state_values(state.x)
        return state, obs, info

    def reset(key) -> tuple:
        from safe_control_gym_tpu.ops import ctr_prng

        env_seed = ctr_prng.env_seed_from_key(key)
        noise_key = jax.random.fold_in(key, 7919)
        return _reset_core(
            env_seed, jnp.zeros((), jnp.int32), noise_key,
            jax.random.fold_in(noise_key, jnp.int32(-1)),
        )

    def reset_episode(state: CartPoleState, noise_key):
        """Fresh episode for an auto-resetting env: same env identity, next
        episode index — the masked-reset path (vector.py) and the in-kernel
        path (fast_cartpole.py) draw identical randomization."""
        return _reset_core(
            state.env_seed, state.episode_idx + 1, noise_key,
            jax.random.fold_in(noise_key, jnp.int32(-1)),
        )

    def step(state: CartPoleState, action):
        key, k_step = jax.random.split(state.key)
        k_act = jax.random.fold_in(k_step, 0)
        k_dyn = jax.random.fold_in(k_step, 1)
        k_obs = jax.random.fold_in(k_step, 2)

        action = jnp.asarray(action, dtype).reshape(1)
        # Preprocess (clip; normalized action scales to force).
        if cfg.normalized_rl_action_space:
            clipped = jnp.clip(action, -1.0, 1.0)
            force = ACTION_THRESHOLD * clipped
        else:
            force = jnp.clip(action, act_low[0], act_high[0])
        preprocessed = force
        if cfg.adversary_disturbance == "action":
            # Applied after preprocessing, before passive action disturbances
            # (quadrotor.py:837-838 ordering).
            force = force + state.adv_act
        prog = dist_progs["action"]
        if prog is not None:
            force = prog.apply(
                state.dist_sched["action"], k_act, state.ctrl_step, state.pyb_step,
                force, x=state.x,
            )

        # Passive dynamics disturbance: extra horizontal force on the cart.
        ext_force = jnp.zeros((1,), dtype)
        prog = dist_progs["dynamics"]
        if prog is not None:
            ext_force = prog.apply(
                state.dist_sched["dynamics"], k_dyn, state.ctrl_step, state.pyb_step,
                ext_force, x=state.x,
            )
        ext_force = ext_force + state.adv_force

        fc = lambda x, u: cartpole_fc(
            x, u + ext_force, state.pole_length, state.pole_mass, state.cart_mass
        )
        x = state.x
        for _ in range(n_sub):
            x = rk4_step(fc, x, force, pyb_dt)

        # Advance brownian walks (mirrors quadrotor.py's evolve block).
        sched = state.dist_sched
        if any(p is not None and p.has_brownian for p in dist_progs.values()):
            k_walk = jax.random.fold_in(k_step, 3)
            sched = {
                mode: (prog.evolve(sched[mode], jax.random.fold_in(k_walk, i))
                       if prog is not None else sched[mode])
                for i, (mode, prog) in enumerate(dist_progs.items())
            }

        new_state = state.replace(
            x=x, key=key, dist_sched=sched,
            adv_force=jnp.zeros((1,), dtype), adv_act=jnp.zeros((1,), dtype),
        )

        # Reward (pre-increment counter indexes the goal, quadrotor.py:905).
        wp = jnp.clip(state.ctrl_step, 0, x_goal_j.shape[0] - 1) if task == Task.TRAJ_TRACKING else None
        goal = x_goal_j if task == Task.STABILIZATION else x_goal_j[wp]
        act_err = preprocessed - u_goal_j
        if cost == Cost.RL_REWARD:
            state_err = x - goal
            dist = jnp.sum(rew_state_w * state_err * state_err) + jnp.sum(
                rew_act_w * act_err * act_err
            )
            rew = jnp.exp(-dist) if cfg.rew_exponential else -dist
        else:  # QUADRATIC
            dx = x - goal
            du = preprocessed - u_goal_j
            rew = -(0.5 * dx @ Q @ dx + 0.5 * du @ R @ du)

        # Done.
        goal_reached = jnp.zeros((), bool)
        done = jnp.zeros((), bool)
        if task == Task.STABILIZATION and cost == Cost.QUADRATIC:
            goal_reached = jnp.linalg.norm(x - goal) < goal_tol
            done = done | goal_reached
        if cfg.done_on_out_of_bound:
            # Out-of-bound on x and theta only (upstream cartpole semantics).
            oob = (jnp.abs(x[0]) > X_THRESHOLD) | (jnp.abs(x[2]) > THETA_THRESHOLD)
            done = done | oob
        else:
            oob = jnp.zeros((), bool)

        info = {"goal_reached": goal_reached, "out_of_bound": oob}
        # MSE metric (quadrotor.py:1014-1025 pattern; full state weight).
        err = x - goal
        info["mse"] = jnp.sum(err**2)

        # after_step: constraints, penalty, time limit (benchmark_env.py:422-463).
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
        return new_state, obs, rew.astype(dtype), done, info

    def set_adversary_control(state: CartPoleState, adv_action):
        """Functional analogue of env.set_adversary_control (benchmark_env.py:256-266)."""
        adv = jnp.clip(jnp.asarray(adv_action, dtype).reshape(1), -1.0, 1.0)
        adv = adv * cfg.adversary_disturbance_scale + cfg.adversary_disturbance_offset
        if cfg.adversary_disturbance == "action":
            return state.replace(adv_act=adv)
        if cfg.adversary_disturbance == "dynamics":
            return state.replace(adv_force=adv)
        raise RuntimeError("adversary_disturbance is not configured for this env.")

    symbolic = DynamicsModel(
        fc_func=lambda x, u: cartpole_fc(x, u, nom_pole_length, nom_pole_mass, nom_cart_mass),
        nx=4,
        nu=1,
        dt=ctrl_dt,
    )
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
        extras={"set_adversary_control": set_adversary_control,
                "reset_episode": reset_episode},
    )


def make_cartpole_from_dict(**kwargs) -> FnEnv:
    """Registry entry point: build from flat YAML kwargs."""
    known = {f.name for f in dataclasses.fields(CartPoleConfig)}
    return make_cartpole(CartPoleConfig(**{k: v for k, v in kwargs.items() if k in known}))
