"""Whole-rollout Pallas engine for the PLANAR quadrotors (1D / 2D).

Closes the BASELINE config-3 gap (Quadrotor 1D/2D stabilization with
domain-randomized mass/inertia): with this module every BASELINE config
family runs as a single kernel dispatch — CartPole (fast_cartpole.py),
planar quads (here), and the 3D quad / competition maze (fast_env.py).

Same architecture as the siblings: state lives in (rows, sub, lanes) f32
tiles resident in VMEM, one ``pallas_call`` runs ``steps_per_call`` full
control steps (actuation pipeline, RK4/Euler substeps, reward, done logic,
constraint-violation counting, episode statistics, masked auto-reset), and
reset draws replay the shared counter stream (ops/ctr_prng.py) bit-exactly
against the general engine (envs/quadrotor.py `_reset_core` slot layout:
0..3 inertia M/Ixx/Iyy/Izz, 4..4+nx-1 init state, 4+nx impulse offset).

Reference semantics reproduced: quadrotor.py:594-623 (1D/2D continuous
dynamics), quadrotor_utils.py:21-67 (cmd2pwm/pwm2rpm actuation with the
2D motor pairing), quadrotor.py:886-931 (rl/quadratic rewards),
quadrotor.py:956-1002 (done logic incl. the non-finite freeze).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_control_gym_tpu.envs.constraints import box_bounds_view
from safe_control_gym_tpu.parallel.fast_env import (
    _STATS_KEYS,
    dist_envelope_flags,
    eval_curve,
    make_draw,
    obs_noise_rows,
)

def _nx_nu(quad_type: int):
    return (2, 1) if int(quad_type) == 1 else (6, 2)


def _rows_layout(nx: int):
    """Row indices: state | mass | iyy | step | offset | stats(7) | seed | ep."""
    return dict(
        MASS=nx, IYY=nx + 1, STEP=nx + 2, OFFSET=nx + 3, STATS=nx + 4,
        SEED=nx + 11, EP=nx + 12, NROWS=nx + 13,
    )


def supports(cfg, allow_normalized: bool = False,
             allow_goal_horizon: bool = False) -> bool:
    """True if the 1D/2D quadrotor config is in this engine's validated
    envelope (mirrors fast_env.supports / fast_cartpole.supports).

    ``allow_goal_horizon``: the policy-in-kernel engine evaluates the
    goal-horizon observation extension rows in-kernel (same pattern as
    fast_policy.goal_ext_rows); the plain open-loop rollout engine does
    not record observations, so it keeps requiring ``obs_goal_horizon == 0``."""
    from safe_control_gym_tpu.envs import quadrotor as Q

    if int(cfg.quad_type) not in (1, 2):
        return False
    nx, nu = _nx_nu(cfg.quad_type)
    ti = {**Q._DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    has_d, fl = dist_envelope_flags(cfg)
    impulse_ok = not has_d["dynamics"] or fl["impulse"]
    act_dist_ok = not has_d["action"] or fl["act_noise"]
    obs_dist_ok = not has_d["observation"] or fl["obs_noise"]
    # The rl_reward path applies ONE scalar action weight across dims; a
    # per-dim weight vector must fall back unless uniform (fast_env.py has
    # the same gate; the quadratic cost's r_weight IS per-dim in-kernel).
    act_w = np.asarray(
        1e-4 if cfg.rew_act_weight is None else cfg.rew_act_weight, dtype=float
    ).ravel()
    act_w_ok = act_w.size == 1 or bool(np.all(act_w == act_w[0]))
    return (
        act_w_ok
        and cfg.physics in ("pyb", "dyn")
        and cfg.cost in ("rl_reward", "quadratic")
        and (allow_normalized or not cfg.normalized_rl_action_space)
        and (cfg.task == "stabilization"
             or (cfg.task == "traj_tracking"
                 and ti.get("trajectory_type") in ("figure8", "circle", "square")))
        and (int(cfg.obs_goal_horizon) == 0
             or (allow_goal_horizon and cfg.cost == "rl_reward"))
        and impulse_ok and act_dist_ok and obs_dist_ok
        and cfg.adversary_disturbance is None
        and not (cfg.gates or cfg.obstacles)
        and not cfg.done_on_violation
        and not cfg.done_on_collision
        and not cfg.done_on_completion
        and not cfg.use_constraint_penalty
        # In-kernel violation counting is per-dim bound tests: only pure box
        # programs are exact (envs/constraints.py box_bounds_view).
        and (cfg.constraints is None
             or box_bounds_view(cfg.constraints, nx, nu) is not None)
    )


def _actuate(t, p):
    """Thrust command -> realized per-motor force: the cmd2pwm -> pwm2rpm ->
    rpm^2*KF pipeline with the planar n_motor grouping
    (envs/quadrotor.py cmd2pwm: 1D commands 4 motors, 2D commands pairs)."""
    pwm = (jnp.sqrt(jnp.maximum(t, 0.0) / p["n_motor"] / p["kf"])
           - p["pwm_const"]) / p["pwm_scale"]
    pwm = jnp.clip(pwm, p["min_pwm"], p["max_pwm"])
    rpm = p["pwm_scale"] * pwm + p["pwm_const"]
    return rpm * rpm * p["kf"]


def goal_rows(p, step_f):
    """Goal reference rows at control-step tile ``step_f``: the static goal
    for stabilization, the closed-form planar curve for tracking — the
    kernel-side equivalent of the general engine's X_GOAL table row
    (benchmark_env.py:124-170 generators).  Shared by the reward path
    (step_env_core) and the goal-horizon obs extension (goal_ext_rows)."""
    nx = p["nx"]
    zero_t = jnp.zeros_like(step_f)
    if p["task"] == "stab":
        return [jnp.full_like(step_f, v) for v in p["x_goal"]]
    t = step_f * p["ctrl_dt"]
    a_p, b_p, a_v, b_v = eval_curve(p, t)

    def pick(sel):
        if sel == 0:
            return a_p + p["plane_off"][0], a_v
        if sel == 1:
            return b_p + p["plane_off"][1], b_v
        return zero_t, zero_t

    if nx == 2:
        gz, gvz = pick(p["z_sel"])
        return [gz, gvz]
    gx, gvx = pick(p["x_sel"])
    gz, gvz = pick(p["z_sel"])
    return [gx, gvx, gz, gvz, zero_t, zero_t]


def goal_ext_rows(p, step_tile, first_idx_offset):
    """Goal-horizon extension rows for an obs produced at control step
    ``step_tile`` (benchmark_env.py:406-420, quadrotor._extend_obs):
    stabilization appends the static goal once; tracking appends the next
    ``obs_goal_horizon`` reference rows, indices clipped to the end of the
    episode table — same pattern as fast_policy.goal_ext_rows."""
    if p.get("obs_mul", 1) <= 1:
        return []
    if p["task"] == "stab":
        return [jnp.full_like(step_tile, v) for v in p["x_goal"]]
    rows = []
    tmax = p["max_steps"] - 1.0
    for i in range(p["obs_goal_horizon"]):
        idx = jnp.minimum(step_tile + (first_idx_offset + i), tmax)
        rows += goal_rows(p, idx)
    return rows


def step_env_core(p, carry, thrust_rows, it, draw, act_rows=None):
    """One full planar-quad control step on tiled rows.

    ``thrust_rows`` are the preprocessed (clipped / normalized-scaled)
    per-dim thrusts — PRE action noise (the reward's action error uses
    these, quadrotor.py:920); ``act_rows`` the raw commanded action for
    input-constraint rows (quadrotor.py step: ``get_values(x, action)``).
    Returns (new_carry, rew, done, trunc, violf, s_post)."""
    nx = p["nx"]
    L = p["_L"]
    s = tuple(carry[k] for k in range(nx))
    mass = carry[L["MASS"]]
    iyy = carry[L["IYY"]]
    step_f = carry[L["STEP"]]
    offset = carry[L["OFFSET"]]
    stats = carry[L["STATS"]:L["STATS"] + 7]
    zero_t = jnp.zeros_like(step_f)

    act_err = [t - p["u_goal"] for t in thrust_rows]

    # -- action white noise --------------------------------------------------
    if p["act_noise_std"] > 0.0:
        un = draw(2 * p["nu"], 1.0)
        thrust_rows = [
            t + p["act_noise_std"]
            * jnp.sqrt(-2.0 * jnp.log(1.0 - un[i]))
            * jnp.cos(2.0 * math.pi * un[p["nu"] + i])
            for i, t in enumerate(thrust_rows)
        ]
    fm = [_actuate(t, p) for t in thrust_rows]  # per-motor force per dim

    # -- dynamics disturbance: impulse schedule ------------------------------
    if p["impulse"] is not None:
        mag, dur, decay = p["impulse"]
        peak = offset + float(int(dur / 2))
        po = jnp.abs(step_f - peak)
        dec = jnp.where(
            po < dur / 2.0,
            jnp.exp(po * math.log(decay)) if decay != 1.0 else jnp.ones_like(po),
            jnp.zeros_like(po),
        )
        ext = jnp.where(step_f >= offset, mag * dec, 0.0)
    else:
        ext = zero_t

    # -- continuous dynamics (quadrotor.py quad_fc_1d / quad_fc_2d) ----------
    minv = 1.0 / mass
    if nx == 2:
        T = (fm[0] + fm[0]) + fm[0] + fm[0]  # 4 identical motors

        def fc(sv):
            z_dd = T * minv - p["g"] + ext * minv
            return (sv[1], z_dd)
    else:
        T1 = fm[0] + fm[0]  # motors 1&4 share pwm index 0 (cmd2pwm pairing)
        T2 = fm[1] + fm[1]
        Tsum = T1 + T2
        tdd_num = p["arm_l"] * (T2 - T1)

        def fc(sv):
            theta = sv[4]
            x_dd = jnp.sin(theta) * Tsum * minv + ext * minv
            z_dd = jnp.cos(theta) * Tsum * minv - p["g"] + ext * minv
            theta_dd = tdd_num / iyy / np.sqrt(2.0)
            return (sv[1], x_dd, sv[3], z_dd, sv[5], theta_dd)

    dt = p["dt"]
    for _ in range(p["n_sub"]):
        if p["euler"]:
            k1 = fc(s)
            s = tuple(si + dt * ki for si, ki in zip(s, k1))
        else:
            k1 = fc(s)
            k2 = fc(tuple(si + dt / 2 * ki for si, ki in zip(s, k1)))
            k3 = fc(tuple(si + dt / 2 * ki for si, ki in zip(s, k2)))
            k4 = fc(tuple(si + dt * ki for si, ki in zip(s, k3)))
            s = tuple(
                si + dt / 6 * (a + 2 * b + 2 * c + d)
                for si, a, b, c, d in zip(s, k1, k2, k3, k4)
            )

    # -- goal reference (static goal or closed-form planar curve) -----------
    goal = goal_rows(p, step_f)

    # -- violation (pure box constraint program on state/input) -------------
    viol = None
    for k in range(nx):
        out_k = (s[k] < p["c_low"][k]) | (s[k] > p["c_high"][k])
        viol = out_k if viol is None else (viol | out_k)
    if p["u_check"]:
        for i in range(p["nu"]):
            viol = viol | (act_rows[i] < p["u_low"][i]) \
                | (act_rows[i] > p["u_high"][i])
    violf = viol.astype(jnp.float32) if p["count_viol"] else zero_t

    # -- reward ---------------------------------------------------------------
    if p["cost"] == "quad":
        dist = zero_t
        for i, ae in enumerate(act_err):
            dist = dist + 0.5 * p["r_weight"][i] * ae * ae
        for k in range(nx):
            e = s[k] - goal[k]
            dist = dist + 0.5 * p["q_weight"][k] * e * e
        rew = -dist
    else:
        dist = zero_t
        for ae in act_err:
            dist = dist + p["rew_act_w"] * ae * ae
        for k in range(nx):
            e = s[k] - goal[k]
            dist = dist + p["rew_state_w"][k] * e * e
        rew = jnp.exp(-dist) if p["rew_exp"] else -dist

    # -- done (incl. the general engine's non-finite freeze) -----------------
    done = zero_t > 1.0
    if p["cost"] == "quad" and p["task"] == "stab":
        d2 = zero_t
        for k in range(nx):
            e = s[k] - goal[k]
            d2 = d2 + e * e
        done = done | (jnp.sqrt(d2) < p["stab_tol"])
    if p["done_oob"]:
        for k in range(nx):
            if p["oob_mask"][k]:
                done = done | (s[k] < p["s_low"][k]) | (s[k] > p["s_high"][k])
    finite = None
    for k in range(nx):
        ok = (s[k] == s[k]) & (jnp.abs(s[k]) < jnp.float32(3.0e38))
        finite = ok if finite is None else (finite & ok)
    s = tuple(jnp.where(finite, s[k], carry[k]) for k in range(nx))
    rew = jnp.where(finite, rew, zero_t)
    done = done | ~finite

    new_step = step_f + 1.0
    timeout = new_step >= p["max_steps"]
    trunc = timeout & ~done
    done = done | timeout

    # -- episode stats --------------------------------------------------------
    donef = done.astype(jnp.float32)
    ep_ret = stats[0] + rew
    ep_len = stats[1] + 1.0
    ep_vio = stats[2] + violf
    new_stats = (
        ep_ret * (1.0 - donef),
        ep_len * (1.0 - donef),
        ep_vio * (1.0 - donef),
        stats[3] + donef,
        stats[4] + donef * ep_ret,
        stats[5] + donef * ep_len,
        stats[6] + donef * ep_vio,
    )

    # -- masked auto-reset (shared counter stream, quadrotor._reset_core) ----
    from safe_control_gym_tpu.ops import ctr_prng

    es = ctr_prng.seed_from_row(carry[L["SEED"]])
    ep_next = carry[L["EP"]].astype(jnp.int32) + 1
    base = ctr_prng.episode_base(es, ep_next)
    n_slots = 4 + nx + 1
    u = [ctr_prng.slot_uniform(base, k) for k in range(n_slots)]
    nm, lo_v, hi_v = p["rand_nominal"], p["rand_lo"], p["rand_hi"]
    new_x = tuple(
        jnp.where(done,
                  nm[4 + k] + lo_v[4 + k] + u[4 + k] * (hi_v[4 + k] - lo_v[4 + k]),
                  s[k])
        for k in range(nx)
    )
    new_mass = jnp.where(done, nm[0] + lo_v[0] + u[0] * (hi_v[0] - lo_v[0]), mass)
    new_iyy = jnp.where(done, nm[2] + lo_v[2] + u[2] * (hi_v[2] - lo_v[2]), iyy)
    new_off = jnp.where(done, jnp.floor(u[4 + nx] * p["max_steps"]), offset)
    new_step = jnp.where(done, 0.0, new_step)
    new_ep = jnp.where(done, carry[L["EP"]] + 1.0, carry[L["EP"]])
    out = (new_x + (new_mass, new_iyy, new_step, new_off)
           + new_stats + (carry[L["SEED"]], new_ep))
    return out, rew, done, trunc, violf, s


def _rollout_kernel(seed_ref, act_ref, st_ref, out_ref, *, p):
    """Constant-action whole-rollout kernel (throughput/benchmark path)."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = st_ref[:]
    act = act_ref[:]
    raw = [act[i] for i in range(p["nu"])]
    if p["normalized"]:
        thr = [(1.0 + p["norm_act_scale"] * jnp.clip(a, -1.0, 1.0))
               * p["hover_thrust"] for a in raw]
    else:
        thr = [jnp.clip(a, p["a_low"], p["a_high"]) for a in raw]
    carry = tuple(rows[i] for i in range(p["_L"]["NROWS"]))

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        new_carry, *_ = step_env_core(p, carry, list(thr), it, draw,
                                      act_rows=raw)
        return new_carry

    carry = jax.lax.fori_loop(0, p["steps"], body, carry)
    out_ref[:] = jnp.stack(carry, axis=0)


def build_engine_params(env, steps_per_call: int, interpret: bool,
                        allow_normalized: bool = False,
                        allow_goal_horizon: bool = False) -> dict:
    """Static kernel-parameter dict from a 1D/2D quadrotor env config."""
    from safe_control_gym_tpu.envs import quadrotor as Q

    cfg = env.config
    assert supports(cfg, allow_normalized=allow_normalized,
                    allow_goal_horizon=allow_goal_horizon), \
        "config outside the fast-planar-quad envelope"
    nx, nu = _nx_nu(cfg.quad_type)
    L = _rows_layout(nx)
    ti = {**Q._DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    n_sub = cfg.pyb_freq // cfg.ctrl_freq

    dist = (cfg.disturbances or {}).get("dynamics")
    impulse = None
    if dist:
        d = dist[0]
        impulse = tuple(
            float(np.asarray(d.get(k, dflt), dtype=float).ravel()[0])
            for k, dflt in (("magnitude", 1.0), ("duration", 1), ("decay_rate", 1.0))
        )
    act_d = (cfg.disturbances or {}).get("action")
    act_noise_std = (
        float(np.asarray(act_d[0].get("std", 1.0), float).ravel()[0]) if act_d else 0.0
    )
    obs_d = (cfg.disturbances or {}).get("observation")
    obs_noise_std = (
        float(np.asarray(obs_d[0].get("std", 1.0), float).ravel()[0]) if obs_d else 0.0
    )

    # Nominal inertial properties with override (quadrotor.py:241-256).
    nom_mass, nom_j = Q.MASS, list(Q.J_DIAG)
    ip = cfg.inertial_prop
    if ip is not None:
        if isinstance(ip, dict):
            nom_mass = float(ip.get("M", ip.get("mass", nom_mass)))
            for i, k in enumerate(("Ixx", "Iyy", "Izz")):
                nom_j[i] = float(ip.get(k, ip.get(k.lower(), nom_j[i])))
        else:
            arr = np.asarray(ip, dtype=float)
            if nx == 2:
                nom_mass = float(arr[0])
            else:
                nom_mass, nom_j[1] = float(arr[0]), float(arr[1])

    # Randomization bounds in counter-slot order (quadrotor._reset_core):
    # 0..3 inertia (M, Ixx, Iyy, Izz), 4..4+nx-1 init state.
    init_state = cfg.init_state or {}
    if isinstance(init_state, (list, tuple, np.ndarray)):
        init_state = dict(zip(Q.INIT_LABELS[Q.QuadType(int(cfg.quad_type))],
                              np.asarray(init_state, float)))
    labels = Q.INIT_LABELS[Q.QuadType(int(cfg.quad_type))]
    nominal = [nom_mass, *nom_j] + [float(init_state.get(n, 0.0)) for n in labels]
    # Randomization infos REPLACE the defaults when provided, and the
    # defaults are filtered to this quad type's fields — the quadrotor
    # env's semantics (quadrotor.py init_rand/inertial_rand), unlike
    # cartpole's merge.
    inertial = {}
    if cfg.randomized_inertial_prop:
        if cfg.inertial_prop_randomization_info:
            inertial = dict(cfg.inertial_prop_randomization_info)
        else:
            keep = ("M",) if nx == 2 else ("M", "Iyy")
            inertial = {k: v for k, v in Q._DEFAULT_INERTIAL_RAND.items()
                        if k in keep}
    init_rand = {}
    if cfg.randomized_init:
        if cfg.init_state_randomization_info:
            init_rand = dict(cfg.init_state_randomization_info)
        else:
            init_rand = {k: v for k, v in Q._DEFAULT_INIT_RAND.items()
                         if k in labels}
    names = ["M", "Ixx", "Iyy", "Izz"] + list(labels)
    infos = [inertial] * 4 + [init_rand] * nx
    lo = [float(i[n]["low"]) if n in i else 0.0 for n, i in zip(names, infos)]
    hi = [float(i[n]["high"]) if n in i else 0.0 for n, i in zip(names, infos)]

    if cfg.task == "stabilization":
        task = "stab"
        x_goal = tuple(float(v) for v in np.asarray(env.x_goal, float).reshape(-1))
        traj_type, traj_w, traj_scale, period = "none", 0.0, 0.0, 1.0
        x_sel = z_sel = -1
        plane_off = (0.0, 0.0)
    else:
        task = "traj"
        x_goal = (0.0,) * nx
        plane = ti.get("trajectory_plane", "zx")
        off = ti.get("trajectory_position_offset", (0.0, 0.0))
        plane_off = (float(off[0]), float(off[1]))
        # Which curve component lands on each world axis the planar state
        # reads (1D: z; 2D: x and z — quadrotor.py x_goal assembly).
        x_sel = 0 if plane[0] == "x" else (1 if plane[1] == "x" else -1)
        z_sel = 0 if plane[0] == "z" else (1 if plane[1] == "z" else -1)
        traj_type = ti.get("trajectory_type")
        period = cfg.episode_len_sec / float(ti.get("num_cycles", 1))
        traj_w = 2.0 * math.pi / period
        traj_scale = float(ti.get("trajectory_scale", 1.0))

    if cfg.constraints is not None:
        box = box_bounds_view(cfg.constraints, nx, nu, env.spaces)
        assert box is not None, \
            "fast engine requires a pure box constraint program (supports())"
        c_s_lo, c_s_hi, c_u_lo, c_u_hi = box
        u_check = bool((c_u_lo > -1e29).any() or (c_u_hi < 1e29).any())
    else:
        c_s_lo = np.asarray(env.spaces.state_low, float)
        c_s_hi = np.asarray(env.spaces.state_high, float)
        c_u_lo, c_u_hi = np.full(nu, -1e30), np.full(nu, 1e30)
        u_check = False

    oob_mask = (1, 0) if nx == 2 else (1, 0, 1, 0, 1, 0)
    hover_thrust = Q.GRAVITY_ACC * nom_mass / nu

    return dict(
        nx=nx, nu=nu, _L=L,
        use_prng=not interpret,
        steps=steps_per_call,
        n_sub=n_sub,
        euler=(cfg.physics == "dyn"),
        dt=1.0 / cfg.pyb_freq,
        ctrl_dt=1.0 / cfg.ctrl_freq,
        g=Q.GRAVITY_ACC, arm_l=Q.ARM_L,
        kf=Q.KF, pwm_scale=Q.PWM2RPM_SCALE, pwm_const=Q.PWM2RPM_CONST,
        min_pwm=Q.MIN_PWM, max_pwm=Q.MAX_PWM, n_motor=4 // nu,
        a_low=float(env.spaces.action_low[0]),
        a_high=float(env.spaces.action_high[0]),
        normalized=bool(cfg.normalized_rl_action_space),
        norm_act_scale=float(cfg.norm_act_scale),
        hover_thrust=float(hover_thrust),
        u_goal=float(env.u_goal[0]),
        rew_act_w=float(np.ravel(cfg.rew_act_weight)[0]),
        rew_state_w=tuple(np.broadcast_to(
            np.asarray(cfg.rew_state_weight, float), (nx,)).tolist()),
        rew_exp=bool(cfg.rew_exponential),
        q_weight=tuple(np.broadcast_to(
            np.asarray(1.0 if cfg.q_weight is None else cfg.q_weight, float).ravel(),
            (nx,)).tolist()),
        r_weight=tuple(np.broadcast_to(
            np.asarray(1.0 if cfg.r_weight is None else cfg.r_weight, float).ravel(),
            (nu,)).tolist()),
        s_low=tuple(float(v) for v in env.spaces.state_low),
        s_high=tuple(float(v) for v in env.spaces.state_high),
        c_low=tuple(float(v) for v in c_s_lo),
        c_high=tuple(float(v) for v in c_s_hi),
        u_check=bool(u_check),
        u_low=tuple(float(v) for v in c_u_lo),
        u_high=tuple(float(v) for v in c_u_hi),
        oob_mask=oob_mask,
        done_oob=bool(cfg.done_on_out_of_bound),
        count_viol=cfg.constraints is not None,
        max_steps=float(int(cfg.episode_len_sec * cfg.ctrl_freq)),
        stab_tol=float(ti.get("stabilization_goal_tolerance", 0.0)),
        impulse=impulse,
        act_noise_std=act_noise_std,
        obs_noise_std=obs_noise_std,
        task=task, x_goal=x_goal,
        traj_type=traj_type, traj_w=traj_w, traj_scale=traj_scale,
        traj_period=float(period),
        x_sel=x_sel, z_sel=z_sel, plane_off=plane_off,
        cost={"quadratic": "quad"}.get(cfg.cost, "rl"),
        rand_nominal=tuple(nominal), rand_lo=tuple(lo), rand_hi=tuple(hi),
        # Goal-horizon obs extension (quadrotor._extend_obs semantics:
        # tracking appends the next h reference rows, stabilization appends
        # the static goal once; active only on the rl_reward cost).
        obs_goal_horizon=int(cfg.obs_goal_horizon),
        obs_mul=(
            ((1 + int(cfg.obs_goal_horizon)) if cfg.task == "traj_tracking" else 2)
            if (cfg.cost == "rl_reward" and int(cfg.obs_goal_horizon) > 0) else 1
        ),
    )


def reset_rows(p, B, sub, lanes, seed: int = 0):
    """Fresh packed state rows mirroring ``vec.reset(jax.random.key(seed))``
    bit-exactly (same threefry env seeds, same counter draws at episode 0)."""
    from safe_control_gym_tpu.ops import ctr_prng

    def tile(a):
        return np.asarray(a, np.float32).T.reshape(-1, sub, lanes)

    nx = p["nx"]
    L = p["_L"]
    nm = np.asarray(p["rand_nominal"], np.float32)
    lo = np.asarray(p["rand_lo"], np.float32)
    hi = np.asarray(p["rand_hi"], np.float32)
    keys = jax.random.split(jax.random.key(seed), B)
    es = jax.vmap(ctr_prng.env_seed_from_key)(keys)  # (B,) int32
    n_slots = 4 + nx + 1
    base = ctr_prng.episode_base(es, jnp.zeros_like(es))
    u_all = np.asarray(
        jax.vmap(lambda b: ctr_prng.uniform_slots(b, n_slots))(base), np.float32
    )  # (B, n_slots)
    drawn = nm + lo + u_all[:, :4 + nx] * (hi - lo)
    rows = np.zeros((L["NROWS"], sub, lanes), np.float32)
    rows[:nx] = tile(drawn[:, 4:])
    rows[L["MASS"]] = tile(drawn[:, :1])[0]
    rows[L["IYY"]] = tile(drawn[:, 2:3])[0]
    rows[L["OFFSET"]] = tile(
        np.floor(u_all[:, 4 + nx:5 + nx] * p["max_steps"]).astype(np.float32))[0]
    rows[L["SEED"]] = tile(ctr_prng.seed_to_row(es)[:, None])[0]
    return jnp.asarray(rows)


class FastPlanarQuadRollout:
    """Host wrapper: packed state + one-dispatch rollout calls
    (API-compatible with fast_env.FastQuadRollout / FastCartPoleRollout)."""

    def __init__(self, env, num_envs: int, steps_per_call: int = 256,
                 sub: int = 8, interpret: bool = False,
                 allow_normalized: bool = False):
        assert num_envs % (sub * 128) == 0, "num_envs must be a multiple of sub*128"
        self.env = env
        self.B = num_envs
        self.sub = sub
        self.lanes = num_envs // sub
        self.steps = steps_per_call
        self._auto_seed = 1
        self.params = build_engine_params(env, steps_per_call, interpret,
                                          allow_normalized=allow_normalized)
        self.params["_sub"] = sub
        self.params["_lanes"] = self.lanes
        self.nx = self.params["nx"]
        self.nu = self.params["nu"]
        self.n_rows = self.params["_L"]["NROWS"]
        kern = functools.partial(_rollout_kernel, p=self.params)
        spec = lambda rows: pl.BlockSpec(
            (rows, sub, self.lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        self._call = jax.jit(
            pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    spec(self.nu),
                    spec(self.n_rows),
                ],
                out_specs=spec(self.n_rows),
                out_shape=jax.ShapeDtypeStruct(
                    (self.n_rows, sub, self.lanes), jnp.float32),
                interpret=interpret,
            )
        )

    def _tile(self, a):
        """(B, k) -> (k, sub, lanes)."""
        return np.asarray(a, np.float32).T.reshape(-1, self.sub, self.lanes)

    def reset(self, seed: int = 0):
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

    def pack(self, env_states):
        """Pack a batched general-engine QuadState into fast rows."""
        from safe_control_gym_tpu.ops import ctr_prng

        rows = np.zeros((self.n_rows, self.sub, self.lanes), np.float32)
        L = self.params["_L"]
        rows[:self.nx] = self._tile(np.asarray(env_states.x))
        rows[L["MASS"]] = self._tile(np.asarray(env_states.mass)[:, None])[0]
        rows[L["IYY"]] = self._tile(
            np.asarray(env_states.j_diag)[:, 1:2])[0]
        rows[L["STEP"]] = self._tile(
            np.asarray(env_states.ctrl_step, np.float32)[:, None])[0]
        sched = env_states.dist_sched.get("dynamics")
        if isinstance(sched, dict) and sched.get("offsets") is not None \
                and np.asarray(sched["offsets"]).shape[-1]:
            rows[L["OFFSET"]] = self._tile(
                np.asarray(sched["offsets"], np.float32))[0]
        rows[L["SEED"]] = self._tile(
            ctr_prng.seed_to_row(env_states.env_seed)[:, None])[0]
        rows[L["EP"]] = self._tile(
            np.asarray(env_states.episode_idx, np.float32)[:, None])[0]
        return jnp.asarray(rows)

    def states(self, rows):
        """(B, nx) state matrix from packed rows."""
        return np.asarray(rows[:self.nx]).reshape(self.nx, self.B).T

    def stats(self, rows):
        L = self.params["_L"]
        r = np.asarray(rows[L["STATS"]:L["STATS"] + 7]).reshape(7, self.B)
        d = dict(zip(_STATS_KEYS, r))
        n = max(d["done_count"].sum(), 1.0)
        return {
            "episodes": float(d["done_count"].sum()),
            "mean_return": float(d["sum_return"].sum() / n),
            "mean_length": float(d["sum_length"].sum() / n),
            "mean_violations": float(d["sum_violations"].sum() / n),
        }

    def prepare_action(self, action):
        """Place a (nu,) or (B, nu) thrust command on device once."""
        a = np.asarray(action, np.float32)
        if a.ndim == 1:
            a = np.broadcast_to(a.reshape(1, self.nu), (self.B, self.nu))
        return jnp.asarray(self._tile(a))

    def run(self, rows, action, seed=None):
        """One dispatch = ``steps_per_call`` env steps for all B envs."""
        if not isinstance(action, jax.Array):
            action = self.prepare_action(action)
        if seed is None:
            seed = self._auto_seed
            self._auto_seed += 1
        if not isinstance(seed, jax.Array):
            seed = jnp.asarray([seed], jnp.int32)
        return self._call(seed, action, rows)


_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _policy_rollout_kernel(
    seed_ref, logstd_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    st_ref, out_ref, traj_ref, scratch_ref, sem_ref, *, p,
):
    """Policy-in-kernel planar-quad rollout (mirrors fast_policy.py /
    fast_cartpole._policy_rollout_kernel): per step, fully VMEM-resident —
    obs -> dual actor+critic MLP forward -> Gaussian sampling -> env step —
    with the (obs, act, rew, done, trunc, v, logp, terminal-obs) record
    DMA'd to an HBM trajectory buffer through a double-buffered scratch."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    nx, nu = p["nx"], p["nu"]
    obs_dim = nx * p.get("obs_mul", 1)
    L = p["_L"]
    n_rows = L["NROWS"]
    traj_rows = 2 * obs_dim + nu + 5
    rows = st_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]
    sub, lanes = rows.shape[1], rows.shape[2]
    BB = sub * lanes
    carry = tuple(rows[i] for i in range(n_rows))
    act_fn = jnp.tanh if p["mlp_act"] == "tanh" else \
        (lambda z: jnp.maximum(z, 0.0))

    def forward(obs_rows):
        X = jnp.stack(obs_rows, 0).reshape(obs_dim, BB)
        h = act_fn(jnp.dot(w1, X, preferred_element_type=jnp.float32) + b1)
        h = act_fn(jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
        O = jnp.dot(w3, h, preferred_element_type=jnp.float32) + b3  # (8, BB)
        return [O[i:i + 1] for i in range(nu)], O[nu:nu + 1]

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        s_pre = carry[:nx]

        # Observation white noise feeds the policy and the record; the env
        # state stays clean (envs/quadrotor.py _obs semantics).
        s_pre = obs_noise_rows(p, draw, s_pre, 11.0)

        # Obs = (noisy) state + goal-horizon extension at next_step =
        # ctrl_step + 1 (quadrotor._obs -> _extend_obs); goals stay clean.
        obs_rows = list(s_pre) + goal_ext_rows(p, carry[L["STEP"]], 1.0)
        means, value = forward(obs_rows)

        # Gaussian sampling (Box-Muller) + log-prob + action preprocessing.
        u = draw(2 * nu, 7.0)
        act_list, thrust_list = [], []
        logp_m = jnp.zeros((1, BB), jnp.float32)
        for i in range(nu):
            u1 = 1.0 - u[i].reshape(1, BB)
            u2 = u[nu + i].reshape(1, BB)
            eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)
            sd = jnp.exp(logstd_ref[i])
            a_i = means[i] + sd * eps
            act_list.append(a_i)
            logp_m = logp_m - 0.5 * eps**2 - logstd_ref[i] - _HALF_LOG_2PI
            if p["normalized"]:
                t_i = (1.0 + p["norm_act_scale"] * jnp.clip(a_i, -1.0, 1.0)) \
                    * p["hover_thrust"]
            else:
                t_i = jnp.clip(a_i, p["a_low"], p["a_high"])
            thrust_list.append(t_i)
        pol = jnp.concatenate(
            thrust_list + act_list + [value, logp_m], axis=0
        )  # (2*nu + 2, BB)
        pol3 = pol.reshape(2 * nu + 2, sub, lanes)
        thrust_rows = [pol3[i] for i in range(nu)]
        act_rows = [pol3[nu + i] for i in range(nu)]
        v_tile, logp_tile = pol3[2 * nu], pol3[2 * nu + 1]

        new_carry, rew, done, trunc, violf, s_post = step_env_core(
            p, carry, thrust_rows, it, draw, act_rows=act_rows
        )
        donef = done.astype(jnp.float32)
        truncf = trunc.astype(jnp.float32)

        slot = jax.lax.rem(it, 2)

        @pl.when(it >= 2)
        def _wait_prev():
            pltpu.make_async_copy(
                scratch_ref.at[slot], traj_ref.at[it - 2], sem_ref.at[slot]
            ).wait()

        # Terminal obs is NOISY in the general engine (_obs of the new
        # state), so the truncation bootstrap sees the trained channel.
        s_term = obs_noise_rows(p, draw, s_post, 13.0)
        term_rows = [si * truncf for si in s_term] + [
            g * truncf for g in goal_ext_rows(p, carry[L["STEP"]], 2.0)
        ]
        record = jnp.stack(
            obs_rows
            + act_rows + [rew, donef, truncf, v_tile, logp_tile]
            + term_rows,  # terminal obs, masked
            axis=0,
        )
        scratch_ref[slot] = record
        pltpu.make_async_copy(
            scratch_ref.at[slot], traj_ref.at[it], sem_ref.at[slot]
        ).start()
        return new_carry

    carry = jax.lax.fori_loop(0, p["steps"], body, carry)
    for k in (p["steps"] - 2, p["steps"] - 1):
        if k >= 0:
            pltpu.make_async_copy(
                scratch_ref.at[k % 2], traj_ref.at[k], sem_ref.at[k % 2]
            ).wait()
    out_ref[:] = jnp.stack(carry, axis=0)
    del traj_rows  # layout documented for unpack_traj


class FastPlanarQuadPolicyRollout:
    """Policy-in-kernel planar-quad collection: one dispatch = T
    policy-driven env steps for B envs, returning the full PPO trajectory
    record.  API-compatible with fast_policy.FastPolicyRollout
    (pack_weights / unpack_traj / observe / reset / states / run), so
    controllers/ppo.py's fast collection drives any of the three engines
    unchanged."""

    def __init__(self, env, num_envs: int, steps_per_call: int,
                 mlp_hidden: int = 64, mlp_act: str = "tanh",
                 sub: int = 8, interpret: bool = False):
        assert num_envs % (sub * 128) == 0, "num_envs must be a multiple of sub*128"
        assert mlp_hidden <= 128, "dual-MLP pack assumes hidden <= 128"
        self.env = env
        self.B = num_envs
        self.sub = sub
        self.lanes = num_envs // sub
        self.T = steps_per_call
        self.H = mlp_hidden
        self._auto_seed = 1
        self.params = build_engine_params(env, steps_per_call, interpret,
                                          allow_normalized=True,
                                          allow_goal_horizon=True)
        self.params["mlp_act"] = mlp_act
        self.params["_sub"] = sub
        self.params["_lanes"] = self.lanes
        self.nx = self.params["nx"]
        self.nu = self.params["nu"]
        self.obs_dim = self.nx * self.params.get("obs_mul", 1)
        self.traj_rows = 2 * self.obs_dim + self.nu + 5
        self.n_rows = self.params["_L"]["NROWS"]
        kern = functools.partial(_policy_rollout_kernel, p=dict(self.params))
        Ln = self.lanes
        spec = lambda rows: pl.BlockSpec(
            (rows, sub, Ln), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        self._call = jax.jit(
            pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[
                    smem(),          # seed
                    smem(),          # logstd (nu,)
                    vmem(), vmem(),  # w1 (2H, obs_dim), b1 (2H, 1)
                    vmem(), vmem(),  # w2 (2H, 2H), b2 (2H, 1)
                    vmem(), vmem(),  # w3 (8, 2H), b3 (8, 1)
                    spec(self.n_rows),
                ],
                out_specs=[spec(self.n_rows), pl.BlockSpec(memory_space=pl.ANY)],
                out_shape=[
                    jax.ShapeDtypeStruct((self.n_rows, sub, Ln), jnp.float32),
                    jax.ShapeDtypeStruct(
                        (steps_per_call, self.traj_rows, sub, Ln), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, self.traj_rows, sub, Ln), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
        )

    def reset(self, seed: int = 0):
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

    def pack_weights(self, actor_params, critic_params, logstd):
        """Flax MLP params -> fused dual-network matrices (actor rows
        0..H-1, critic rows H..2H-1; output rows 0..nu-1 actor means, row
        nu value, rest zero pad)."""
        H, nu = self.H, self.nu
        ap, cp = actor_params["params"], critic_params["params"]
        w1 = jnp.concatenate(
            [ap["Dense_0"]["kernel"].T, cp["Dense_0"]["kernel"].T], 0
        )  # (2H, nx)
        b1 = jnp.concatenate(
            [ap["Dense_0"]["bias"], cp["Dense_0"]["bias"]], 0
        )[:, None]
        z = jnp.zeros((H, H), jnp.float32)
        w2 = jnp.block([[ap["Dense_1"]["kernel"].T, z],
                        [z, cp["Dense_1"]["kernel"].T]])  # (2H, 2H)
        b2 = jnp.concatenate(
            [ap["Dense_1"]["bias"], cp["Dense_1"]["bias"]], 0
        )[:, None]
        zh = jnp.zeros((nu, H), jnp.float32)
        zh1 = jnp.zeros((1, H), jnp.float32)
        w3 = jnp.concatenate([
            jnp.concatenate([ap["Dense_2"]["kernel"].T, zh], 1),   # (nu, 2H)
            jnp.concatenate([zh1, cp["Dense_2"]["kernel"].T], 1),  # (1, 2H)
            jnp.zeros((8 - nu - 1, 2 * H), jnp.float32),
        ], 0)  # (8, 2H)
        b3 = jnp.concatenate([
            ap["Dense_2"]["bias"], cp["Dense_2"]["bias"],
            jnp.zeros(8 - nu - 1),
        ])[:, None]
        return (w1.astype(jnp.float32), b1.astype(jnp.float32),
                w2.astype(jnp.float32), b2.astype(jnp.float32),
                w3.astype(jnp.float32), b3.astype(jnp.float32),
                jnp.asarray(logstd, jnp.float32))

    def unpack_traj(self, traj):
        """(T, traj_rows, 8, L) record -> PPO field dict, (T, B, ...)."""
        T = traj.shape[0]
        od, nu = self.obs_dim, self.nu
        flat = traj.reshape(T, self.traj_rows, self.B)

        def mat(sl):
            return jnp.moveaxis(flat[:, sl], 1, 2)

        return {
            "obs": mat(slice(0, od)),
            "act": mat(slice(od, od + nu)),
            "rew": flat[:, od + nu],
            "done": flat[:, od + nu + 1],
            "mask": 1.0 - flat[:, od + nu + 1],
            "trunc": flat[:, od + nu + 2],
            "v": flat[:, od + nu + 3],
            "logp": flat[:, od + nu + 4],
            "term_obs": mat(slice(od + nu + 5, 2 * od + nu + 5)),
        }

    def states(self, rows):
        """(B, nx) state matrix from packed rows (jnp, jit-safe)."""
        return jnp.moveaxis(rows[:self.nx].reshape(self.nx, self.B), 0, 1)

    def observe(self, rows, key=None):
        """(B, obs_dim) observation: state + goal-horizon extension at
        next_step = ctrl_step + 1, gathered from the env's X_GOAL table
        exactly like the general engine (quadrotor._extend_obs).  Used for
        the GAE bootstrap value of the post-rollout state.

        With obs white noise configured and ``key`` given, the state part is
        noised like the general engine's _obs (the bootstrap critic input is
        the noisy channel; goal rows stay clean)."""
        x = self.states(rows)
        std = self.params.get("obs_noise_std", 0.0)
        if std > 0.0 and key is not None:
            x = x + std * jax.random.normal(key, x.shape, x.dtype)
        if self.params.get("obs_mul", 1) <= 1:
            return x
        xg = jnp.asarray(np.asarray(self.env.x_goal, np.float32))
        if self.params["task"] == "stab":
            ext = jnp.broadcast_to(xg.reshape(-1), (self.B, self.nx))
            return jnp.concatenate([x, ext], axis=-1)
        steps = rows[self.params["_L"]["STEP"]].reshape(self.B).astype(jnp.int32)
        h = self.params["obs_goal_horizon"]
        idx = jnp.clip(steps[:, None] + 1 + jnp.arange(h)[None, :],
                       0, xg.shape[0] - 1)  # (B, h)
        ext = xg[idx].reshape(self.B, h * self.nx)
        return jnp.concatenate([x, ext], axis=-1)

    def run(self, rows, weights, seed=None):
        """One dispatch = T policy-driven env steps; returns
        (new_state_rows, traj_record)."""
        if seed is None:
            seed = self._auto_seed
            self._auto_seed += 1
        if not isinstance(seed, jax.Array):
            seed = jnp.asarray([seed], jnp.int32)
        w1, b1, w2, b2, w3, b3, logstd = weights
        return self._call(seed, logstd, w1, b1, w2, b2, w3, b3, rows)
