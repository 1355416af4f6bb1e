"""Whole-rollout Pallas engine: N env steps per single kernel dispatch.

The general engine (envs/quadrotor.py + parallel/vector.py) compiles each
control step to ~25 XLA kernels; at B=4096 the step is dispatch-bound
(~21 us device busy vs ~27 us of launch gaps — docs/PERF.md).  This module
is the speed-of-light variant for the benchmark-class configuration: the
ENTIRE rollout — actuation pipeline, RK4 substeps, trajectory reference,
reward, done logic, constraint-violation counting, masked auto-reset with
in-kernel PRNG, and episode statistics — runs as one `lax.fori_loop` inside
one Pallas program, with all state resident in VMEM for the whole call.

Scope (checked by ``supports``): 3D quadrotor, `pyb`/`dyn` physics without
aero modes, rl_reward or quadratic (LQ) cost, stabilization or
figure8/circle/square trajectory tracking (the reference generators are
closed-form — benchmark.py:124-170, incl. the piecewise-linear square — so
the kernel evaluates them analytically instead of gathering from a table),
box out-of-bound done, goal-capture done (stabilization + quadratic),
optional impulse dynamics disturbance, observation white noise and the
goal-horizon obs extension (both applied to the policy input in
fast_policy.py; a constant-action rollout's states are unaffected by
construction), default-constraint violation counting.  CartPole has its own
whole-rollout engine (fast_cartpole.py).  Everything else uses the general
engine.

Reset randomization draws from the counter-based stream BOTH engines share
(ops/ctr_prng.py): every draw is a pure function of (env_seed, episode_idx,
slot), so in-kernel auto-resets replay the general engine's exact reset
values and fast-vs-general trajectories are comparable across episode
boundaries, not just on reset-free segments (tests/test_fast_env.py pins
this).  Step-noise channels (action/dynamics/observation white noise) remain
engine-specific streams with matching distributions.
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
from safe_control_gym_tpu.ops.pallas_quad import _actuate, _axpy, _fc_rows

# State-row layout (each row is one (sub, lanes) tile).
_X0, _NX = 0, 12
_R_MASS = 12
_R_J = 13  # 13,14,15
_R_STEP = 16
_R_OFFSET = 17
_R_STATS = 18  # ep_ret, ep_len, ep_viol, done_cnt, sum_ret, sum_len, sum_viol
_R_SEED = 25  # 32-bit env seed (ops/ctr_prng.py), carried as an f32 bit pattern
_R_EP = 26  # episode index (f32 counter)
_NROWS = 27

_STATS_KEYS = ("ep_return", "ep_length", "ep_violations", "done_count",
               "sum_return", "sum_length", "sum_violations")


def supports(cfg, allow_normalized: bool = False, allow_maze: bool = False,
             allow_goal_horizon: bool = False) -> bool:
    """True if the config is in this engine's validated envelope.

    ``allow_normalized``: the policy-in-kernel engine (fast_policy.py)
    handles the normalized RL action space in-kernel; the constant-action
    engine does not.

    ``allow_maze``: the maze-capable kernels additionally handle the
    competition configuration family (BASELINE config 5): gates/obstacles
    geometry, competition sparse cost, collision/completion done flags,
    per-motor white-noise action disturbance, and per-step uniform dynamics
    force — all in-kernel.

    ``allow_goal_horizon``: the policy-in-kernel engine evaluates the
    goal-horizon observation extension (benchmark_env.py:406-420) in-kernel
    from the closed-form trajectory; the constant-action engine never
    consumes obs, so the flag only matters for fast_policy.
    """
    from safe_control_gym_tpu.envs.quadrotor import QuadType

    from safe_control_gym_tpu.envs.quadrotor import _DEFAULT_TASK_INFO

    ti = {**_DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    has_d, fl = dist_envelope_flags(cfg)
    impulse_ok = not has_d["dynamics"] or fl["impulse"]
    uniform_ok = allow_maze and fl["uniform"]
    # Action white noise is implemented by the maze/policy kernels only.
    act_dist_ok = not has_d["action"] or (allow_maze and fl["act_noise"])
    # Observation white noise: in-kernel draws feeding the policy input and
    # the recorded/terminal obs (fast_policy.py); the constant-action
    # engine's state trajectory is unaffected by construction (obs is never
    # consumed).
    obs_dist_ok = not has_d["observation"] or fl["obs_noise"]
    # The kernel applies ONE action weight to all four motors; a per-motor
    # weight vector must fall back unless it is uniform.
    act_w = np.asarray(
        1e-4 if cfg.rew_act_weight is None else cfg.rew_act_weight, dtype=float
    ).ravel()
    act_w_ok = act_w.size == 1 or bool(np.all(act_w == act_w[0]))
    return (
        act_w_ok
        and int(cfg.quad_type) == QuadType.THREE_D
        and cfg.physics in ("pyb", "dyn")
        and (cfg.cost in ("rl_reward", "quadratic")
             or (allow_maze and cfg.cost == "competition"))
        and (allow_normalized or not cfg.normalized_rl_action_space)
        and (cfg.task == "stabilization"
             or (cfg.task == "traj_tracking"
                 and ti.get("trajectory_type") in ("figure8", "circle", "square")))
        and (int(cfg.obs_goal_horizon) == 0
             or (allow_goal_horizon and cfg.cost == "rl_reward"))
        and obs_dist_ok
        and act_dist_ok
        and (impulse_ok or uniform_ok)
        and cfg.adversary_disturbance is None
        and (allow_maze or not (cfg.gates or cfg.obstacles))
        and not cfg.done_on_violation
        and (allow_maze or not cfg.done_on_collision)
        and (allow_maze or not cfg.done_on_completion)
        and not cfg.use_constraint_penalty
        # In-kernel violation counting is per-dim bound tests: only pure box
        # programs on state/input are exact (envs/constraints.py
        # box_bounds_view); anything else falls back to the general engine.
        and (cfg.constraints is None
             or box_bounds_view(cfg.constraints, _NX, 4) is not None)
    )


def _spec_scalar(v):
    return np.asarray(v, dtype=float).size == 1


def _single_scalar_white_noise(ch):
    """True when the channel is exactly one unmasked scalar-std white noise."""
    return (
        ch is not None
        and len(ch) == 1
        and ch[0].get("disturbance_func") == "white_noise"
        and _spec_scalar(ch[0].get("std", 1.0))
        and "mask" not in ch[0]
    )


def dist_envelope_flags(cfg):
    """Disturbance-envelope predicates shared by the whole-rollout engines
    (quad-3D / cartpole / planar ``supports()``): each engine combines these
    with its own gates (e.g. only the quad maze family admits uniform
    dynamics noise and action white noise).

    Returns ``(has, flags)``: ``has[channel]`` — channel configured at all;
    ``flags['impulse'|'uniform'|'act_noise'|'obs_noise']`` — True when that
    channel is the single supported form the kernels implement."""
    dist = cfg.disturbances or {}
    dyn = dist.get("dynamics")
    has = {ch: bool(dist.get(ch)) for ch in ("dynamics", "action", "observation")}
    impulse = dyn is not None and (
        len(dyn) == 1 and dyn[0].get("disturbance_func") == "impulse"
        and "mask" not in dyn[0] and "step_offset" not in dyn[0]
        # Per-axis magnitudes / non-scalar specs route to the general engine
        # (the kernel applies one scalar magnitude to all axes).
        and all(_spec_scalar(dyn[0].get(k, 1.0))
                for k in ("magnitude", "duration", "decay_rate"))
        and float(np.asarray(dyn[0].get("decay_rate", 1.0), float)) > 0.0
    )
    uniform = dyn is not None and (
        len(dyn) == 1 and dyn[0].get("disturbance_func") == "uniform"
        and "mask" not in dyn[0]
    )
    return has, {
        "impulse": impulse,
        "uniform": uniform,
        "act_noise": _single_scalar_white_noise(dist.get("action")),
        "obs_noise": _single_scalar_white_noise(dist.get("observation")),
    }


def obs_noise_rows(p, draw, rows, salt):
    """Observation white noise on state rows (the general engine's obs
    channel, quadrotor._obs): one Box-Muller pair per channel from the
    shared in-kernel stream.  Goal-extension rows stay clean, as in the
    general engine.  No-op when the config carries no obs noise."""
    std = p.get("obs_noise_std", 0.0)
    if std <= 0.0:
        return rows
    n = len(rows)
    un = draw(2 * n, salt)
    return tuple(
        r + std * jnp.sqrt(-2.0 * jnp.log(1.0 - un[k]))
        * jnp.cos(2.0 * math.pi * un[n + k])
        for k, r in enumerate(rows)
    )


def _bits_to_unit(bits):
    """uint32 random bits -> f32 uniform in [0, 1).

    Mosaic has no uint32->f32 cast; after the >>8 the top bits are zero, so
    reinterpreting as int32 is value-preserving and int32->f32 is supported.
    """
    i32 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return i32.astype(jnp.float32) * jnp.float32(2.0**-24)


def make_draw(p, seed_ref, it):
    """Uniform-draw helper for in-kernel randomness.

    Returns draw(n, salt) -> (n, sub, lanes) uniforms in [0, 1).  On TPU the
    core PRNG supplies bits; the interpret-mode fallback is a trig hash
    (TPU PRNG primitives have no CPU lowering) salted per call site.
    """
    sub, lanes = p["_sub"], p["_lanes"]

    def draw(n, salt):
        if p["use_prng"]:
            bits = pltpu.prng_random_bits((n, sub, lanes))
            return _bits_to_unit(pltpu.bitcast(bits, jnp.uint32))
        shp = (n, sub, lanes)
        kf = jax.lax.broadcasted_iota(jnp.float32, shp, 0)
        sf = jax.lax.broadcasted_iota(jnp.float32, shp, 1)
        lf = jax.lax.broadcasted_iota(jnp.float32, shp, 2)
        seed_f = seed_ref[0].astype(jnp.float32)
        h = jnp.sin(kf * 7.91 + sf * 3.77 + lf * 0.613 + salt * 5.197
                    + it.astype(jnp.float32) * 17.23 + seed_f) * 43758.5453
        return h - jnp.floor(h)

    return draw


def eval_curve(p, t):
    """Closed-form planar reference curve at time tile ``t`` — the
    benchmark_env.py:124-170 generators evaluated in-kernel instead of
    gathered from a table.  Returns the two curve components and their
    velocities ``(a_p, b_p, a_v, b_v)``.  Shared by all three whole-rollout
    engines (quad-3D here, fast_cartpole, fast_quad_planar)."""
    w = p["traj_w"]
    sc = p["traj_scale"]
    if p["traj_type"] == "figure8":
        sw, cw = jnp.sin(w * t), jnp.cos(w * t)
        a_p, b_p = sc * sw, sc * sw * cw
        a_v, b_v = sc * w * cw, sc * w * (cw * cw - sw * sw)
    elif p["traj_type"] == "circle":
        sw, cw = jnp.sin(w * t), jnp.cos(w * t)
        a_p, b_p = sc * cw, sc * sw
        a_v, b_v = -sc * w * sw, sc * w * cw
    else:  # square: piecewise-linear perimeter (benchmark_env.py:625-674)
        period = p["traj_period"]
        seg_period = period / 4.0
        speed = sc / seg_period
        cyc = t - period * jnp.floor(t / period)
        seg = jnp.floor(cyc / seg_period)  # 0..3 float tile
        seg_pos = speed * (cyc - seg * seg_period)
        is0, is1 = seg < 0.5, jnp.abs(seg - 1.0) < 0.5
        is2 = jnp.abs(seg - 2.0) < 0.5
        zt = jnp.zeros_like(t)
        # Segments: up, left, down, right.
        a_p = jnp.where(is0, zt, jnp.where(is1, -seg_pos,
              jnp.where(is2, -sc + zt, -sc + seg_pos)))
        b_p = jnp.where(is0, seg_pos, jnp.where(is1, sc + zt,
              jnp.where(is2, sc - seg_pos, zt)))
        a_v = jnp.where(is0, zt, jnp.where(is1, -speed + zt,
              jnp.where(is2, zt, speed + zt)))
        b_v = jnp.where(is0, speed + zt, jnp.where(is1, zt,
              jnp.where(is2, -speed + zt, zt)))
    return a_p, b_p, a_v, b_v


def eval_goal(p, step_f):
    """Closed-form goal reference at control-step tile ``step_f``: the
    _NX goal rows (static goal for stabilization, analytic planar curve +
    projection for tracking — benchmark_env.py:124-170 generators evaluated
    in-kernel instead of gathered from a table).  Shared by the reward path
    (step_env_core) and the goal-horizon observation extension
    (fast_policy._obs_rows)."""
    if p["task"] == "stab":
        return [jnp.full_like(step_f, v) for v in p["x_goal"]]
    t = step_f * p["ctrl_dt"]
    a_p, b_p, a_v, b_v = eval_curve(p, t)
    zero = jnp.zeros_like(t)
    goal = [zero] * _NX
    p3 = [zero, zero, zero]
    v3 = [zero, zero, zero]
    ia, ib = p["plane_idx"]
    p3[ia] = a_p + p["plane_off"][0]
    p3[ib] = b_p + p["plane_off"][1]
    v3[ia] = a_v
    v3[ib] = b_v
    M = p["proj"]  # (3, 4) affine rows
    for k in range(3):
        goal[2 * k] = M[k][0] * p3[0] + M[k][1] * p3[1] + M[k][2] * p3[2] + M[k][3]
        goal[2 * k + 1] = M[k][0] * v3[0] + M[k][1] * v3[1] + M[k][2] * v3[2] + M[k][3]
    return goal


def step_env_core(p, carry, thrust_rows, it, draw, act_rows=None):
    """Shared per-step env logic for the whole-rollout kernels.

    One full control step on (sub, lanes)-tiled state rows: action noise,
    actuation, dynamics disturbances, RK4 substeps, goal reference, reward
    (rl_reward or competition sparse), maze geometry (gate pass/collision/
    completion, quadrotor.py:1029-1133 as closed-form tile math), done
    logic, episode statistics, and masked auto-reset (including per-episode
    gate/obstacle pose redraws).

    carry: tuple of ``total_rows(p)`` rows.  thrust_rows: 4 thrust tiles
    (post clip/normalization, PRE action-noise — the reward's action error
    uses the preprocessed thrust, quadrotor.py:920).  draw(n, salt):
    uniforms.  Returns (new_carry, rew, done, trunc, violf, collidedf,
    s_post) where s_post is the post-step PRE-reset state (the terminal
    observation at episode boundaries).
    """
    from safe_control_gym_tpu.envs import gates as GG

    s = carry[:_NX]
    mass, jd = carry[_R_MASS], carry[_R_J:_R_J + 3]
    step_f = carry[_R_STEP]
    offset = carry[_R_OFFSET]
    stats = carry[_R_STATS:_R_STATS + 7]
    NG, NO = p.get("n_gates", 0), p.get("n_obstacles", 0)
    m0 = _NROWS
    if p.get("maze"):
        g_rows = carry[m0:m0 + 4 * NG]
        o_rows = carry[m0 + 4 * NG:m0 + 4 * NG + 2 * NO]
        mz = m0 + 4 * NG + 2 * NO
        cur_gate = carry[mz]
        steps_goal = carry[mz + 1]
        completed = carry[mz + 2]
        prev_viol = carry[mz + 3]

    act_cost = sum((t - p["u_goal"]) ** 2 for t in thrust_rows) * p["rew_act_w"]
    # Quadratic cost's input term: 0.5 * du' R du with diagonal R, on the
    # PRE-noise preprocessed thrusts (quadrotor.py:921 act_err semantics).
    quad_act = sum(
        0.5 * p["r_weight"][i] * (t - p["u_goal"]) ** 2
        for i, t in enumerate(thrust_rows)
    ) if p["cost"] == "quad" else None

    # -- action white noise (level2.yaml action disturbance) ----------------
    if p["act_noise_std"] > 0.0:
        un = draw(8, 1.0)
        thrust_rows = [
            t + p["act_noise_std"]
            * jnp.sqrt(-2.0 * jnp.log(1.0 - un[i]))
            * jnp.cos(2.0 * math.pi * un[4 + i])
            for i, t in enumerate(thrust_rows)
        ]
    forces = tuple(_actuate(t) for t in thrust_rows)

    def fc(sv, f, ext, minv, jdv):
        return _fc_rows(sv, f, ext, minv, jdv, g=p["g"], arm_l=p["arm_l"],
                        km_over_kf=p["km_over_kf"])

    # -- dynamics disturbance: impulse schedule or per-step uniform force ---
    if p["impulse"] is not None:
        mag, dur, decay = p["impulse"]
        peak = offset + float(int(dur / 2))
        po = jnp.abs(step_f - peak)
        dec = jnp.where(
            po < dur / 2.0,
            jnp.exp(po * math.log(decay)) if decay != 1.0 else jnp.ones_like(po),
            jnp.zeros_like(po),
        )
        n = jnp.where(step_f >= offset, mag * dec, 0.0)
        ext = (n, n, n)
    elif p.get("dyn_uniform") is not None:
        lo3, hi3 = p["dyn_uniform"]
        ud = draw(3, 2.0)
        ext = tuple(lo3[k] + ud[k] * (hi3[k] - lo3[k]) for k in range(3))
    else:
        z = jnp.zeros_like(step_f)
        ext = (z, z, z)

    # -- substeps -----------------------------------------------------------
    minv = 1.0 / mass
    for _ in range(p["n_sub"]):
        if p["euler"]:
            s = _axpy(s, p["dt"], fc(s, forces, ext, minv, jd))
        else:
            k1 = fc(s, forces, ext, minv, jd)
            k2 = fc(_axpy(s, p["dt"] / 2, k1), forces, ext, minv, jd)
            k3 = fc(_axpy(s, p["dt"] / 2, k2), forces, ext, minv, jd)
            k4 = fc(_axpy(s, p["dt"], k3), forces, ext, minv, jd)
            s = tuple(
                si + p["dt"] / 6 * (a + 2 * b + 2 * c + d)
                for si, a, b, c, d in zip(s, k1, k2, k3, k4)
            )

    # -- goal reference (closed-form planar curve or static goal) -----------
    goal = eval_goal(p, step_f)

    # -- maze geometry (quadrotor.py:1029-1133; envs/gates.py math) ---------
    zero_t = jnp.zeros_like(step_f)
    collided = zero_t > 1.0  # all-False bool tile
    stepped = collided
    at_goal = collided
    if p.get("maze"):
        px, py, pz = s[0], s[2], s[4]
        collided = pz < GG.GROUND_COLLISION_Z
        r = GG.DRONE_RADIUS
        hit_cur = zero_t
        for g in range(NG):
            gx, gy, gyaw, gh = (g_rows[4 * g + j] for j in range(4))
            c, sn = jnp.cos(gyaw), jnp.sin(gyaw)
            relx, rely = px - gx, py - gy
            u = relx * c + rely * sn
            nrm = -relx * sn + rely * c
            wz = pz - gh
            in_slab = jnp.abs(nrm) < (GG.GATE_SLAB_HALF + r)
            in_outer = (jnp.abs(u) < GG.GATE_OUTER_HALF + r) & (
                jnp.abs(wz) < GG.GATE_OUTER_HALF + r)
            in_inner = (jnp.abs(u) < GG.GATE_INNER_HALF - r) & (
                jnp.abs(wz) < GG.GATE_INNER_HALF - r)
            leg = (jnp.sqrt(relx * relx + rely * rely) < GG.OBSTACLE_RADIUS + r) & (
                pz < gh - GG.GATE_OUTER_HALF)
            collided = collided | (in_slab & in_outer & ~in_inner) | leg
            # 7-ray aperture fan (quadrotor.py:1068-1092).
            hit_g = zero_t > 1.0
            for i in range(-GG.N_RAY_OFFSETS, GG.N_RAY_OFFSETS + 1):
                sx = gx + i * GG.RAY_SPACING * c
                sy = gy + i * GG.RAY_SPACING * sn
                dz = jnp.clip(pz, gh - GG.RAY_HALF_LENGTH, gh + GG.RAY_HALF_LENGTH) - pz
                d2 = (px - sx) ** 2 + (py - sy) ** 2 + dz * dz
                hit_g = hit_g | (d2 < r * r)
            is_cur = jnp.abs(cur_gate - float(g)) < 0.5
            hit_cur = jnp.where(is_cur, hit_g.astype(jnp.float32), hit_cur)
        for o in range(NO):
            ox, oy = o_rows[2 * o], o_rows[2 * o + 1]
            relx, rely = px - ox, py - oy
            o_hit = (jnp.sqrt(relx * relx + rely * rely)
                     < GG.OBSTACLE_RADIUS + r) & (pz < GG.OBSTACLE_HEIGHT + r)
            collided = collided | o_hit
        # Gate progress after the settling window (quadrotor.py:1060:
        # pyb_step > 0.5 * PYB_FREQ; pyb_step = ctrl_step * n_sub here).
        active = ((step_f * p["n_sub"]) > (0.5 * p["pyb_freq_f"])) & (cur_gate < float(NG))
        stepped = active & (hit_cur > 0.5)
        cur_gate = cur_gate + stepped.astype(jnp.float32)
        # At-goal / completion (quadrotor.py:1114-1133).
        gx0, gy0, gz0 = p["goal_xyz"]
        near = jnp.sqrt((px - gx0) ** 2 + (py - gy0) ** 2 + (pz - gz0) ** 2) \
            < p["goal_tol"]
        at_goal = (cur_gate >= float(NG)) & near
        steps_goal = jnp.where(at_goal, steps_goal + 1.0, 0.0)
        completed = jnp.maximum(
            completed, (steps_goal > p["completion_steps"]).astype(jnp.float32)
        )

    # -- violation (pure box constraint program on state/input) -------------
    # Constraint rows use the constraint-derived bounds (c_low/c_high); the
    # out-of-bound done check keeps the env-space bounds (s_low/s_high) —
    # the two coincide for the default state constraint but not in general.
    viol = None
    oob_done = zero_t > 1.0
    for k in range(_NX):
        c_out = (s[k] < p.get("c_low", p["s_low"])[k]) \
            | (s[k] > p.get("c_high", p["s_high"])[k])
        viol = c_out if viol is None else (viol | c_out)
        if p["done_oob"] and p["oob_mask"][k]:
            oob_done = oob_done | (s[k] < p["s_low"][k]) | (s[k] > p["s_high"][k])
    if p.get("u_check"):
        # Input rows are evaluated on the RAW commanded action
        # (envs/quadrotor.py step: get_values(x, action)).
        for i in range(4):
            viol = viol | (act_rows[i] < p["u_low"][i]) \
                | (act_rows[i] > p["u_high"][i])
    violf = viol.astype(jnp.float32) if p["count_viol"] else zero_t

    # -- reward -------------------------------------------------------------
    if p["cost"] == "competition":
        # Sparse competition reward (quadrotor.py:932-954); the violation
        # term uses the PREVIOUS step flag, matching the reference order.
        rew = (100.0 * stepped.astype(jnp.float32)
               + 100.0 * at_goal.astype(jnp.float32)
               - 1000.0 * collided.astype(jnp.float32)
               - 100.0 * prev_viol)
    elif p["cost"] == "quad":
        # LQ cost (quadrotor.py:927-930): -(0.5 dx'Q dx + 0.5 du'R du),
        # diagonal Q/R.
        dist = quad_act
        for k in range(_NX):
            e = s[k] - goal[k]
            dist = dist + 0.5 * p["q_weight"][k] * e * e
        rew = -dist
    else:
        dist = act_cost
        for k in range(_NX):
            e = s[k] - goal[k]
            dist = dist + p["rew_state_w"][k] * e * e
        rew = jnp.exp(-dist) if p["rew_exp"] else -dist

    # -- done ---------------------------------------------------------------
    new_step = step_f + 1.0
    timeout = new_step >= p["max_steps"]
    done = oob_done
    if p["cost"] == "quad" and p["task"] == "stab":
        # Stabilization + quadratic terminates on goal capture
        # (quadrotor.py:907-910): full-state 2-norm inside the tolerance.
        d2 = zero_t
        for k in range(_NX):
            e = s[k] - goal[k]
            d2 = d2 + e * e
        done = done | (d2 < p["stab_tol"] ** 2)
    if p.get("maze"):
        if p["done_collision"]:
            done = done | collided
        if p["done_completion"]:
            done = done | (completed > 0.5)
    trunc = timeout & ~done
    done = done | timeout

    # -- episode stats ------------------------------------------------------
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

    # -- masked auto-reset --------------------------------------------------
    n_draw = 17 + (3 * NG + 2 * NO if p.get("maze") else 0)
    if p.get("unified_prng", True):
        # Counter-based draws shared bit-exactly with the general engine
        # (ops/ctr_prng.py): pure function of (env_seed, episode_idx+1,
        # slot).  Slot layout matches quadrotor._reset_core (0..3 inertia,
        # 4..15 init state, 16 impulse offset, then gates/obstacles); this
        # kernel's u[] indexing predates it, so remap.
        from safe_control_gym_tpu.ops import ctr_prng

        es = ctr_prng.seed_from_row(carry[_R_SEED])
        ep_next = carry[_R_EP].astype(jnp.int32) + 1
        base = ctr_prng.episode_base(es, ep_next)
        slot_map = list(range(4, 16)) + [0, 1, 2, 3, 16] + list(range(17, n_draw))
        u = [ctr_prng.slot_uniform(base, slot_map[k]) for k in range(n_draw)]
    else:
        u = draw(n_draw, 3.0)
    nm, lo_v, hi_v = p["rand_nominal"], p["rand_lo"], p["rand_hi"]
    new_x = []
    for k in range(_NX):
        drawn = nm[4 + k] + lo_v[4 + k] + u[k] * (hi_v[4 + k] - lo_v[4 + k])
        new_x.append(jnp.where(done, drawn, s[k]))
    new_mass = jnp.where(done, nm[0] + lo_v[0] + u[12] * (hi_v[0] - lo_v[0]), mass)
    new_j = tuple(
        jnp.where(done, nm[1 + i] + lo_v[1 + i] + u[13 + i] * (hi_v[1 + i] - lo_v[1 + i]), jd[i])
        for i in range(3)
    )
    new_off = jnp.where(done, jnp.floor(u[16] * p["max_steps"]), offset)
    new_step = jnp.where(done, 0.0, new_step)
    new_ep = jnp.where(done, carry[_R_EP] + 1.0, carry[_R_EP])
    out = (tuple(new_x) + (new_mass,) + new_j + (new_step, new_off)
           + new_stats + (carry[_R_SEED], new_ep))

    if p.get("maze"):
        # Per-episode gate/obstacle pose redraw (quadrotor.py:370-434).
        # NOTE: in-kernel resets always redraw poses — reseed_on_reset=True
        # (static course) semantics stay on the general engine.
        glo, ghi = p["gate_rand"]
        olo, ohi = p["obst_rand"]
        new_maze = []
        di = 17
        for g in range(NG):
            nx0, ny0, nyaw, nh = p["gates_nom"][g]
            gx = jnp.where(done, nx0 + glo + u[di] * (ghi - glo), g_rows[4 * g])
            gy = jnp.where(done, ny0 + glo + u[di + 1] * (ghi - glo), g_rows[4 * g + 1])
            gyaw = jnp.where(done, nyaw + glo + u[di + 2] * (ghi - glo), g_rows[4 * g + 2])
            gh = jnp.where(done, jnp.full_like(step_f, nh), g_rows[4 * g + 3])
            new_maze += [gx, gy, gyaw, gh]
            di += 3
        for o in range(NO):
            nx0, ny0 = p["obstacles_nom"][o]
            ox = jnp.where(done, nx0 + olo + u[di] * (ohi - olo), o_rows[2 * o])
            oy = jnp.where(done, ny0 + olo + u[di + 1] * (ohi - olo), o_rows[2 * o + 1])
            new_maze += [ox, oy]
            di += 2
        new_maze += [
            jnp.where(done, 0.0, cur_gate),
            jnp.where(done, 0.0, steps_goal),
            jnp.where(done, 0.0, completed),
            violf,  # next step's "previous violation" flag
        ]
        out = out + tuple(new_maze)

    return out, rew, done, trunc, violf, collided.astype(jnp.float32), s


def _rollout_kernel(seed_ref, act_ref, st_ref, out_ref, *, p):
    """Constant-action whole-rollout kernel (throughput/benchmark path)."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = st_ref[:]
    act = act_ref[:]
    thr = tuple(
        jnp.clip(act[i], p["a_low"], p["a_high"]) for i in range(4)
    )
    raw = [act[i] for i in range(4)]
    n_rows = total_rows(p)
    carry = tuple(rows[i] for i in range(n_rows))

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        new_carry, *_ = step_env_core(p, carry, list(thr), it, draw,
                                      act_rows=raw)
        return new_carry

    carry = jax.lax.fori_loop(0, p["steps"], body, carry)
    out_ref[:] = jnp.stack(carry, axis=0)


def build_engine_params(env, steps_per_call: int, interpret: bool,
                        allow_normalized: bool = False,
                        allow_maze: bool = False,
                        allow_goal_horizon: bool = False) -> dict:
    """Static kernel-parameter dict from an env config (shared by the
    constant-action engine below and the policy-in-kernel engine in
    fast_policy.py)."""
    from safe_control_gym_tpu.envs import gates as gate_geom
    from safe_control_gym_tpu.envs import quadrotor as Q

    cfg = env.config
    assert supports(cfg, allow_normalized=allow_normalized,
                    allow_maze=allow_maze,
                    allow_goal_horizon=allow_goal_horizon), \
        "config outside the fast-engine envelope"

    ti = {**Q._DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    n_sub = cfg.pyb_freq // cfg.ctrl_freq
    dist = (cfg.disturbances or {}).get("dynamics")
    impulse = None
    dyn_uniform = None
    if dist:
        d = dist[0]
        if d.get("disturbance_func") == "uniform":
            lo3 = np.broadcast_to(np.asarray(d.get("low", -1.0), float).ravel(), (3,))
            hi3 = np.broadcast_to(np.asarray(d.get("high", 1.0), float).ravel(), (3,))
            dyn_uniform = (tuple(map(float, lo3)), tuple(map(float, hi3)))
        else:
            # supports() guarantees scalar specs; ravel handles 1-elem lists.
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
    # Randomization bounds in fast-row order: mass, jx, jy, jz, x0..x11
    # (same affine form as the general engine's consolidated draw).
    inertial = Q._DEFAULT_INERTIAL_RAND if cfg.randomized_inertial_prop else {}
    if cfg.randomized_inertial_prop and cfg.inertial_prop_randomization_info:
        inertial = cfg.inertial_prop_randomization_info
    init_rand = Q._DEFAULT_INIT_RAND if cfg.randomized_init else {}
    if cfg.randomized_init and cfg.init_state_randomization_info:
        init_rand = cfg.init_state_randomization_info
    labels = Q.INIT_LABELS[Q.QuadType.THREE_D]
    if isinstance(cfg.init_state, dict):
        init_state = cfg.init_state
    elif cfg.init_state is not None:
        # Sequence form, mapped by position (quadrotor.py reset handling).
        init_state = dict(zip(labels, np.asarray(cfg.init_state, float).ravel()))
    else:
        init_state = {}
    names = ["M", "Ixx", "Iyy", "Izz"] + list(Q.INIT_LABELS[Q.QuadType.THREE_D])
    infos = [inertial] * 4 + [init_rand] * 12
    nominal = [Q.MASS, *Q.J_DIAG] + [
        float(init_state.get(n, 0.0)) for n in labels
    ]
    if isinstance(cfg.inertial_prop, dict):
        nominal[0] = float(cfg.inertial_prop.get("M", nominal[0]))
        for i, k in enumerate(("Ixx", "Iyy", "Izz")):
            nominal[1 + i] = float(cfg.inertial_prop.get(k, nominal[1 + i]))
    elif cfg.inertial_prop is not None:
        ip = np.asarray(cfg.inertial_prop, dtype=float).reshape(-1)
        nominal[0] = float(ip[0])
        if ip.size >= 4:
            nominal[1:4] = [float(v) for v in ip[1:4]]
    lo = [float(i[n]["low"]) if n in i else 0.0 for n, i in zip(names, infos)]
    hi = [float(i[n]["high"]) if n in i else 0.0 for n, i in zip(names, infos)]

    axes = {"x": 0, "y": 1, "z": 2}
    if cfg.task == "stabilization":
        task = "stab"
        xg = np.asarray(env.x_goal, dtype=np.float32).reshape(-1)
        x_goal = tuple(float(v) for v in xg)
        plane_idx, plane_off = (0, 1), (0.0, 0.0)
        traj_type, traj_w, traj_scale = "none", 0.0, 0.0
        period = 1.0
        proj = tuple(
            tuple(1.0 if r == c else 0.0 for c in range(4)) for r in range(3)
        )
    else:
        task = "traj"
        x_goal = tuple([0.0] * 12)
        plane = ti.get("trajectory_plane", "xy")
        plane_idx = (axes[plane[0]], axes[plane[1]])
        off = ti.get("trajectory_position_offset", (0.0, 0.0))
        plane_off = (float(off[0]), float(off[1]))
        traj_type = ti.get("trajectory_type")
        period = cfg.episode_len_sec / float(ti.get("num_cycles", 1))
        traj_w = 2.0 * math.pi / period
        traj_scale = float(ti.get("trajectory_scale", 1.0))
        from safe_control_gym_tpu.ops.rotations import projection_matrix

        M4 = np.asarray(projection_matrix(
            ti.get("proj_point", [0, 0, 0]), ti.get("proj_normal", [0, 0, 1])
        ), dtype=float)
        proj = tuple(tuple(float(v) for v in M4[k, :4]) for k in range(3))

    if cfg.constraints is not None:
        box = box_bounds_view(cfg.constraints, _NX, 4, env.spaces)
        assert box is not None, \
            "fast engine requires a pure box constraint program (supports())"
        c_s_lo, c_s_hi, c_u_lo, c_u_hi = box
        u_check = bool((c_u_lo > -1e29).any() or (c_u_hi < 1e29).any())
    else:
        c_s_lo = np.asarray(env.spaces.state_low, float)
        c_s_hi = np.asarray(env.spaces.state_high, float)
        c_u_lo, c_u_hi = np.full(4, -1e30), np.full(4, 1e30)
        u_check = False

    params = dict(
        use_prng=not interpret,
        steps=steps_per_call,
        n_sub=n_sub,
        euler=(cfg.physics == "dyn"),
        dt=1.0 / cfg.pyb_freq,
        ctrl_dt=1.0 / cfg.ctrl_freq,
        g=Q.GRAVITY_ACC, arm_l=Q.ARM_L, km_over_kf=Q.KM / Q.KF,
        a_low=float(env.spaces.action_low[0]),
        a_high=float(env.spaces.action_high[0]),
        u_goal=float(env.u_goal[0]),
        rew_act_w=1e-4 if cfg.rew_act_weight is None else float(np.ravel(cfg.rew_act_weight)[0]),
        rew_state_w=tuple(np.broadcast_to(np.asarray(cfg.rew_state_weight, float), (12,)).tolist()),
        rew_exp=bool(cfg.rew_exponential),
        s_low=tuple(float(v) for v in env.spaces.state_low),
        s_high=tuple(float(v) for v in env.spaces.state_high),
        oob_mask=tuple(bool(v) for v in (1, 0, 1, 0, 1, 0, 1, 1, 1, 0, 0, 0)),
        done_oob=bool(cfg.done_on_out_of_bound),
        count_viol=cfg.constraints is not None,
        # Constraint program -> per-dim box bounds for in-kernel violation
        # counting (supports() guarantees a pure box program; the oob check
        # above keeps using the env-space bounds regardless).
        c_low=tuple(float(v) for v in c_s_lo),
        c_high=tuple(float(v) for v in c_s_hi),
        u_check=bool(u_check),
        u_low=tuple(float(v) for v in c_u_lo),
        u_high=tuple(float(v) for v in c_u_hi),
        max_steps=float(int(cfg.episode_len_sec * cfg.ctrl_freq)),
        impulse=impulse,
        task=task, x_goal=x_goal,
        traj_type=traj_type, traj_w=traj_w, traj_scale=traj_scale,
        traj_period=float(period),
        plane_idx=plane_idx, plane_off=plane_off, proj=proj,
        # Quadratic (LQ) cost weights: diagonal Q/R (quadrotor.py:517-518;
        # None -> identity).
        q_weight=tuple(np.broadcast_to(
            np.asarray(1.0 if cfg.q_weight is None else cfg.q_weight, float).ravel(),
            (12,)).tolist()),
        r_weight=tuple(np.broadcast_to(
            np.asarray(1.0 if cfg.r_weight is None else cfg.r_weight, float).ravel(),
            (4,)).tolist()),
        stab_tol=float(ti.get("stabilization_goal_tolerance", 0.0)),
        obs_noise_std=obs_noise_std,
        rand_nominal=tuple(nominal), rand_lo=tuple(lo), rand_hi=tuple(hi),
        # Normalized RL action space (quadrotor.py:758-763): the policy
        # engine maps act in [-1, 1] to thrust in-kernel.
        normalized=bool(cfg.normalized_rl_action_space),
        norm_act_scale=float(cfg.norm_act_scale),
        hover_thrust=float(Q.GRAVITY_ACC * nominal[0] / 4.0),
        # Per-step disturbances (maze envelope): white-noise thrust + uniform
        # dynamics force (level2.yaml:…disturbances).
        act_noise_std=act_noise_std,
        dyn_uniform=dyn_uniform,
        cost={"competition": "competition", "quadratic": "quad"}.get(cfg.cost, "rl"),
        pyb_freq_f=float(cfg.pyb_freq),
        # Counter-based reset stream shared with the general engine
        # (ops/ctr_prng.py): in-kernel auto-resets replay the exact draws
        # quadrotor._reset_core makes, so fast-vs-general trajectories are
        # bitwise comparable across episode boundaries.
        unified_prng=True,
        # Goal-horizon observation extension (benchmark_env.py:406-420):
        # mul extra goal blocks appended to the policy input in-kernel
        # (fast_policy.py); 1 = no extension.
        obs_goal_horizon=int(cfg.obs_goal_horizon),
        obs_mul=(
            ((1 + int(cfg.obs_goal_horizon)) if cfg.task == "traj_tracking" else 2)
            if (cfg.cost == "rl_reward" and int(cfg.obs_goal_horizon) > 0) else 1
        ),
    )

    # -- competition maze (BASELINE config 5; quadrotor.py:1029-1133) -------
    gates_nom = np.asarray(cfg.gates if cfg.gates else np.zeros((0, 7)), float).reshape(-1, 7)
    obstacles_nom = np.asarray(
        cfg.obstacles if cfg.obstacles else np.zeros((0, 6)), float
    ).reshape(-1, 6)
    NG, NO = gates_nom.shape[0], obstacles_nom.shape[0]
    params["maze"] = bool(NG or NO or cfg.cost == "competition")
    params["n_gates"] = NG
    params["n_obstacles"] = NO
    if params["maze"]:
        gate_types = gates_nom[:, 6].astype(int) if NG else np.zeros(0, int)
        heights = [gate_geom.GATE_HEIGHTS[t] for t in gate_types]
        params["gates_nom"] = tuple(
            (float(g[0]), float(g[1]), float(g[5]), float(h))
            for g, h in zip(gates_nom, heights)
        )
        params["obstacles_nom"] = tuple(
            (float(o[0]), float(o[1])) for o in obstacles_nom
        )
        go_rand = cfg.gates_and_obstacles_randomization_info or {}
        if cfg.randomized_gates_and_obstacles:
            gi = go_rand.get("gates", {"low": -0.15, "high": 0.15})
            oi = go_rand.get("obstacles", {"low": -0.15, "high": 0.15})
            params["gate_rand"] = (float(gi["low"]), float(gi["high"]))
            params["obst_rand"] = (float(oi["low"]), float(oi["high"]))
        else:
            params["gate_rand"] = (0.0, 0.0)
            params["obst_rand"] = (0.0, 0.0)
        xg = np.asarray(env.x_goal, float).reshape(-1, 12) \
            if np.asarray(env.x_goal).ndim > 1 else np.asarray(env.x_goal, float)[None]
        params["goal_xyz"] = (float(xg[0, 0]), float(xg[0, 2]), float(xg[0, 4]))
        params["goal_tol"] = float(ti.get("stabilization_goal_tolerance", 0.15))
        params["completion_steps"] = float(cfg.ctrl_freq * 2)
        params["done_collision"] = bool(cfg.done_on_collision)
        params["done_completion"] = bool(cfg.done_on_completion)
    return params


def maze_rows(p) -> int:
    """Extra state rows for the maze family: per-env gate poses (4/gate),
    obstacle xy (2/obstacle), current_gate, steps_at_goal, completed,
    prev_violation."""
    if not p.get("maze"):
        return 0
    return 4 * p["n_gates"] + 2 * p["n_obstacles"] + 4


def total_rows(p) -> int:
    return _NROWS + maze_rows(p)


def reset_rows(p, B, sub, lanes, seed: int = 0):
    """Fresh packed state rows mirroring ``vec.reset(jax.random.key(seed))``
    BIT-EXACTLY: per-env seeds from the same threefry key splits, reset
    draws from the shared counter stream (ops/ctr_prng.py) at episode 0 —
    so a fast-engine rollout and a general-engine rollout from the same
    seed start from identical states (and stay identical through in-kernel
    auto-resets)."""
    from safe_control_gym_tpu.ops import ctr_prng

    def tile(a):
        return np.asarray(a, np.float32).T.reshape(-1, sub, lanes)

    NG, NO = p.get("n_gates", 0), p.get("n_obstacles", 0)
    # f32 arithmetic throughout to match the general engine's dtype exactly.
    nm = np.asarray(p["rand_nominal"], np.float32)
    lo = np.asarray(p["rand_lo"], np.float32)
    hi = np.asarray(p["rand_hi"], np.float32)
    keys = jax.random.split(jax.random.key(seed), B)
    es = jax.vmap(ctr_prng.env_seed_from_key)(keys)  # (B,) int32
    n_slots = 17 + 3 * NG + 2 * NO
    base = ctr_prng.episode_base(es, jnp.zeros_like(es))
    u_all = np.asarray(
        jax.vmap(lambda b: ctr_prng.uniform_slots(b, n_slots))(base),
        np.float32,
    )  # (B, n_slots)
    drawn = nm + lo + u_all[:, :16] * (hi - lo)  # (B, 16): mass, j3, x12
    rows = np.zeros((total_rows(p), sub, lanes), np.float32)
    rows[:_NX] = tile(drawn[:, 4:])
    rows[_R_MASS] = tile(drawn[:, :1])[0]
    rows[_R_J:_R_J + 3] = tile(drawn[:, 1:4])
    rows[_R_OFFSET] = tile(
        np.floor(u_all[:, 16:17] * p["max_steps"]).astype(np.float32)
    )[0]
    rows[_R_SEED] = tile(ctr_prng.seed_to_row(es)[:, None])[0]
    if p.get("maze"):
        glo, ghi = (np.float32(v) for v in p["gate_rand"])
        olo, ohi = (np.float32(v) for v in p["obst_rand"])
        m0 = _NROWS
        for g in range(NG):
            nx0, ny0, nyaw, nh = p["gates_nom"][g]
            for j, nv in enumerate((nx0, ny0, nyaw)):
                rows[m0 + 4 * g + j] = tile(
                    np.float32(nv) + glo
                    + u_all[:, 17 + 3 * g + j:18 + 3 * g + j] * (ghi - glo)
                )[0]
            rows[m0 + 4 * g + 3] = nh
        for o in range(NO):
            nx0, ny0 = p["obstacles_nom"][o]
            for j, nv in enumerate((nx0, ny0)):
                rows[m0 + 4 * NG + 2 * o + j] = tile(
                    np.float32(nv) + olo
                    + u_all[:, 17 + 3 * NG + 2 * o + j:18 + 3 * NG + 2 * o + j]
                    * (ohi - olo)
                )[0]
    return jnp.asarray(rows)


class FastQuadRollout:
    """Host wrapper: packed state + one-dispatch rollout calls."""

    def __init__(self, env, num_envs: int, steps_per_call: int = 256,
                 sub: int = 8, interpret: bool = False, allow_maze: bool = True):
        cfg = env.config
        assert num_envs % (sub * 128) == 0, "num_envs must be a multiple of sub*128"
        self.env = env
        self.B = num_envs
        self.sub = sub
        self.lanes = num_envs // sub
        self.steps = steps_per_call
        self._auto_seed = 1
        self.params = build_engine_params(env, steps_per_call, interpret,
                                          allow_maze=allow_maze)
        self.params["_sub"] = sub
        self.params["_lanes"] = self.lanes
        self.n_rows = total_rows(self.params)
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
                    spec(4),
                    spec(self.n_rows),
                ],
                out_specs=spec(self.n_rows),
                out_shape=jax.ShapeDtypeStruct((self.n_rows, sub, self.lanes), jnp.float32),
                interpret=interpret,
            )
        )

    # -- state packing -------------------------------------------------------
    def _tile(self, a):
        """(B, k) -> (k, sub, lanes)."""
        return np.asarray(a, np.float32).T.reshape(-1, self.sub, self.lanes)

    def reset(self, seed: int = 0):
        """Fresh packed state: same affine draws as the general engine."""
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

    def pack(self, env_states):
        """Pack a batched general-engine QuadState into fast rows."""
        rows = np.zeros((self.n_rows, self.sub, self.lanes), np.float32)
        rows[:_NX] = self._tile(np.asarray(env_states.x))
        rows[_R_MASS] = self._tile(np.asarray(env_states.mass)[:, None])[0]
        rows[_R_J:_R_J + 3] = self._tile(np.asarray(env_states.j_diag))
        rows[_R_STEP] = self._tile(
            np.asarray(env_states.ctrl_step, np.float32)[:, None]
        )[0]
        sched = env_states.dist_sched.get("dynamics")
        if isinstance(sched, dict) and sched.get("offsets") is not None \
                and np.asarray(sched["offsets"]).shape[-1]:
            rows[_R_OFFSET] = self._tile(
                np.asarray(sched["offsets"], np.float32)
            )[0]
        from safe_control_gym_tpu.ops import ctr_prng
        rows[_R_SEED] = self._tile(
            ctr_prng.seed_to_row(env_states.env_seed)[:, None])[0]
        rows[_R_EP] = self._tile(
            np.asarray(env_states.episode_idx, np.float32)[:, None])[0]
        p = self.params
        if p.get("maze"):
            NG, NO = p["n_gates"], p["n_obstacles"]
            m0 = _NROWS
            ge = np.asarray(env_states.gates_eff, np.float32)  # (B, NG, 4)
            for g in range(NG):
                for j in range(4):
                    rows[m0 + 4 * g + j] = self._tile(ge[:, g, j:j + 1])[0]
            oe = np.asarray(env_states.obstacles_eff, np.float32)  # (B, NO, 2)
            for o in range(NO):
                for j in range(2):
                    rows[m0 + 4 * NG + 2 * o + j] = self._tile(oe[:, o, j:j + 1])[0]
            mz = m0 + 4 * NG + 2 * NO
            rows[mz] = self._tile(
                np.asarray(env_states.current_gate, np.float32)[:, None])[0]
            rows[mz + 1] = self._tile(
                np.asarray(env_states.steps_at_goal, np.float32)[:, None])[0]
            rows[mz + 2] = self._tile(
                np.asarray(env_states.task_completed, np.float32)[:, None])[0]
            rows[mz + 3] = self._tile(
                np.asarray(env_states.cnstr_violation, np.float32)[:, None])[0]
        return jnp.asarray(rows)

    def states(self, rows):
        """(B, 12) state matrix from packed rows."""
        return np.asarray(rows[:_NX]).reshape(_NX, self.B).T

    def stats(self, rows):
        r = np.asarray(rows[_R_STATS:_R_STATS + 7]).reshape(7, self.B)
        d = dict(zip(_STATS_KEYS, r))
        n = max(d["done_count"].sum(), 1.0)
        return {
            "episodes": float(d["done_count"].sum()),
            "mean_return": float(d["sum_return"].sum() / n),
            "mean_length": float(d["sum_length"].sum() / n),
            "mean_violations": float(d["sum_violations"].sum() / n),
        }

    def prepare_action(self, action):
        """Place a (4,) or (B, 4) thrust command on device once; reuse the
        returned array across ``run`` calls (a fresh host->device transfer
        per call costs more than the whole 256-step kernel on tunneled
        backends)."""
        a = np.asarray(action, np.float32)
        if a.ndim == 1:
            a = np.broadcast_to(a.reshape(4, 1), (4, self.B))
        else:
            a = a.T
        return jnp.asarray(a.reshape(4, self.sub, self.lanes))

    def run(self, rows, action, seed=None):
        """One dispatch = ``steps_per_call`` env steps for all B envs.

        ``action``: (4,)/(B, 4) thrust command applied every step, or a
        device array from :meth:`prepare_action`.  ``seed`` may be an int, a
        device int32 array of shape (1,), or None (default) — None draws a
        fresh internal counter value per call so consecutive calls never
        replay the same in-kernel reset stream.  Returns new state rows.
        """
        if not isinstance(action, jax.Array):
            action = self.prepare_action(action)
        if seed is None:
            seed = self._auto_seed
            self._auto_seed += 1
        if not isinstance(seed, jax.Array):
            seed = jnp.asarray([seed], jnp.int32)
        return self._call(seed, action, rows)
