"""Whole-rollout Pallas engine for CartPole: N env steps per dispatch.

Counterpart of the quadrotor whole-rollout engine (fast_env.py) for the
BASELINE CartPole configs (config 1: stabilization, config 2: tracking with
box constraints + white-noise disturbance).  The cart-pole ODE is four
elementwise rows — at B=4096 the general engine's per-step XLA program is
pure dispatch overhead, so the ENTIRE rollout (action preprocessing, action
white noise, impulse dynamics disturbance, RK4 substeps, closed-form
trajectory reference, reward, done logic incl. the non-finite freeze,
constraint-violation counting, masked auto-reset from the shared
counter-based PRNG, episode statistics) runs as one `lax.fori_loop` inside
one Pallas program with all state resident in VMEM.

Reference behaviors reproduced (cites into the reference the env itself
rebuilds — envs/cartpole.py docstring): reward/done per benchmark_env.py
cost semantics, trajectory generators benchmark_env.py:124-170, additive
randomization benchmark_env.py:277-308.

Reset randomization replays the general engine's counter-based stream
(ops/ctr_prng.py) bit-exactly: slot layout 0..2 inertia (pole_length,
pole_mass, cart_mass), 3..6 initial state, 7 impulse offset — identical to
``cartpole._reset_core``, so fast-vs-general trajectories are comparable
THROUGH episode boundaries, as for the quadrotor engines.
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
from safe_control_gym_tpu.parallel import fast_env
from safe_control_gym_tpu.parallel.fast_env import (
    _STATS_KEYS,
    make_draw,
    obs_noise_rows,
)

# State-row layout (each row is one (sub, lanes) tile).
_X0, _NX = 0, 4
_R_PL, _R_PM, _R_CM = 4, 5, 6  # pole_length, pole_mass, cart_mass
_R_STEP = 7
_R_OFFSET = 8  # impulse step offset
_R_STATS = 9  # ep_ret, ep_len, ep_viol, done_cnt, sum_ret, sum_len, sum_viol
_R_SEED = 16  # 32-bit env seed (ops/ctr_prng.py), carried as an f32 bit pattern
_R_EP = 17  # episode index (f32 counter)
_NROWS = 18


def supports(cfg, allow_normalized: bool = False) -> bool:
    """True if the CartPole config is in this engine's validated envelope
    (mirrors fast_env.supports for the quadrotor)."""
    from safe_control_gym_tpu.envs import cartpole as C

    ti = {**C._DEFAULT_TASK_INFO, **(cfg.task_info or {})}
    has_d, fl = fast_env.dist_envelope_flags(cfg)
    impulse_ok = not has_d["dynamics"] or fl["impulse"]
    act_dist_ok = not has_d["action"] or fl["act_noise"]
    obs_dist_ok = not has_d["observation"] or fl["obs_noise"]
    return (
        cfg.cost in ("rl_reward", "quadratic")
        and (allow_normalized or not cfg.normalized_rl_action_space)
        and (cfg.task == "stabilization"
             or (cfg.task == "traj_tracking"
                 and ti.get("trajectory_type") in ("figure8", "circle", "square")))
        and int(cfg.obs_goal_horizon) == 0
        and impulse_ok and act_dist_ok and obs_dist_ok
        and cfg.adversary_disturbance is None
        and not cfg.done_on_violation
        and not cfg.use_constraint_penalty
        # In-kernel violation counting is per-dim bound tests: only pure box
        # programs on state/input are exact (envs/constraints.py
        # box_bounds_view); anything else falls back to the general engine.
        and (cfg.constraints is None
             or box_bounds_view(cfg.constraints, _NX, 1) is not None)
    )


def _fc_cart(s, force, pl_len, pm, cm, g):
    """Cart-pole continuous dynamics on (sub, lanes) tiles
    (envs/cartpole.py cartpole_fc, identical op order for exactness)."""
    x_dot, theta, theta_dot = s[1], s[2], s[3]
    half_l = pl_len / 2.0
    Mm = cm + pm
    ml = pm * half_l
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    temp = (force + ml * theta_dot**2 * sin_t) / Mm
    theta_dd = (g * sin_t - cos_t * temp) / (
        half_l * (4.0 / 3.0 - pm * cos_t**2 / Mm))
    x_dd = temp - ml * theta_dd * cos_t / Mm
    return (x_dot, x_dd, theta_dot, theta_dd)


def step_env_core(p, carry, force_pre, it, draw, act_raw=None):
    """One full CartPole control step on tiled rows.

    ``force_pre`` is the preprocessed (clipped / normalized-scaled) force
    tile — PRE action noise, which is what the reward's action error uses
    (envs/cartpole.py step).  ``act_raw`` is the unprocessed commanded
    action, which is what input-constraint rows are evaluated on
    (envs/cartpole.py step: ``get_values(x, action)``); required when
    ``p["u_check"]``.  Returns (new_carry, rew, done, trunc, violf,
    s_post) where s_post is the post-step PRE-reset state."""
    s = tuple(carry[_X0 + k] for k in range(_NX))
    pl_len, pm, cm = carry[_R_PL], carry[_R_PM], carry[_R_CM]
    step_f = carry[_R_STEP]
    offset = carry[_R_OFFSET]
    stats = carry[_R_STATS:_R_STATS + 7]

    act_err = force_pre - p["u_goal"]

    # -- action white noise -------------------------------------------------
    force = force_pre
    if p["act_noise_std"] > 0.0:
        un = draw(2, 1.0)
        force = force + p["act_noise_std"] \
            * jnp.sqrt(-2.0 * jnp.log(1.0 - un[0])) \
            * jnp.cos(2.0 * math.pi * un[1])

    # -- dynamics disturbance: impulse schedule -----------------------------
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
        force_tot = force + ext
    else:
        force_tot = force

    # -- RK4 substeps -------------------------------------------------------
    dt = p["dt"]
    for _ in range(p["n_sub"]):
        k1 = _fc_cart(s, force_tot, pl_len, pm, cm, p["g"])
        k2 = _fc_cart(tuple(si + dt / 2 * ki for si, ki in zip(s, k1)),
                      force_tot, pl_len, pm, cm, p["g"])
        k3 = _fc_cart(tuple(si + dt / 2 * ki for si, ki in zip(s, k2)),
                      force_tot, pl_len, pm, cm, p["g"])
        k4 = _fc_cart(tuple(si + dt * ki for si, ki in zip(s, k3)),
                      force_tot, pl_len, pm, cm, p["g"])
        s = tuple(
            si + dt / 6 * (a + 2 * b + 2 * c + d)
            for si, a, b, c, d in zip(s, k1, k2, k3, k4)
        )

    # -- goal reference (static goal or closed-form x-axis curve) -----------
    zero_t = jnp.zeros_like(step_f)
    if p["task"] == "stab":
        goal = [jnp.full_like(step_f, v) for v in p["x_goal"]]
    else:
        from safe_control_gym_tpu.parallel.fast_env import eval_curve

        t = step_f * p["ctrl_dt"]
        a_p, b_p, a_v, b_v = eval_curve(p, t)
        # CartPole's X_GOAL takes the x-axis component of the planar curve
        # (envs/cartpole.py x_goal: pos[:, 0], vel[:, 0]).
        sel = p["x_axis_sel"]
        if sel == 0:
            gx, gv = a_p + p["plane_off"][0], a_v
        elif sel == 1:
            gx, gv = b_p + p["plane_off"][1], b_v
        else:
            gx, gv = zero_t, zero_t
        goal = [gx, gv, zero_t, zero_t]

    # -- violation (pure box constraint program on state/input) -------------
    viol = None
    for k in range(_NX):
        out_k = (s[k] < p["s_low"][k]) | (s[k] > p["s_high"][k])
        viol = out_k if viol is None else (viol | out_k)
    if p.get("u_check"):
        viol = viol | (act_raw < p["u_low"]) | (act_raw > p["u_high"])
    violf = viol.astype(jnp.float32) if p["count_viol"] else zero_t

    # -- reward -------------------------------------------------------------
    if p["cost"] == "quad":
        dist = 0.5 * p["r_weight"] * act_err * act_err
        for k in range(_NX):
            e = s[k] - goal[k]
            dist = dist + 0.5 * p["q_weight"][k] * e * e
        rew = -dist
    else:
        dist = p["rew_act_w"] * act_err * act_err
        for k in range(_NX):
            e = s[k] - goal[k]
            dist = dist + p["rew_state_w"][k] * e * e
        rew = jnp.exp(-dist) if p["rew_exp"] else -dist

    # -- done (incl. the general engine's non-finite freeze) ----------------
    done = zero_t > 1.0
    if p["cost"] == "quad" and p["task"] == "stab":
        d2 = zero_t
        for k in range(_NX):
            e = s[k] - goal[k]
            d2 = d2 + e * e
        done = done | (jnp.sqrt(d2) < p["stab_tol"])
    if p["done_oob"]:
        done = done | (jnp.abs(s[0]) > p["x_threshold"]) \
                    | (jnp.abs(s[2]) > p["theta_threshold"])
    # Numerical safety net (envs/cartpole.py step): freeze the last finite
    # state, zero the reward, end the episode.
    finite = None
    for k in range(_NX):
        ok = (s[k] == s[k]) & (jnp.abs(s[k]) < jnp.float32(3.0e38))
        finite = ok if finite is None else (finite & ok)
    s = tuple(jnp.where(finite, s[k], carry[_X0 + k]) for k in range(_NX))
    rew = jnp.where(finite, rew, zero_t)
    done = done | ~finite

    new_step = step_f + 1.0
    timeout = new_step >= p["max_steps"]
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

    # -- masked auto-reset (shared counter stream, cartpole._reset_core) ----
    from safe_control_gym_tpu.ops import ctr_prng

    es = ctr_prng.seed_from_row(carry[_R_SEED])
    ep_next = carry[_R_EP].astype(jnp.int32) + 1
    base = ctr_prng.episode_base(es, ep_next)
    u = [ctr_prng.slot_uniform(base, k) for k in range(8)]
    nm, lo_v, hi_v = p["rand_nominal"], p["rand_lo"], p["rand_hi"]
    new_x = tuple(
        jnp.where(done, nm[3 + k] + lo_v[3 + k] + u[3 + k] * (hi_v[3 + k] - lo_v[3 + k]), s[k])
        for k in range(_NX)
    )
    new_inert = tuple(
        jnp.where(done, nm[i] + lo_v[i] + u[i] * (hi_v[i] - lo_v[i]), c)
        for i, c in enumerate((pl_len, pm, cm))
    )
    new_off = jnp.where(done, jnp.floor(u[7] * p["max_steps"]), offset)
    new_step = jnp.where(done, 0.0, new_step)
    new_ep = jnp.where(done, carry[_R_EP] + 1.0, carry[_R_EP])
    out = (new_x + new_inert + (new_step, new_off)
           + new_stats + (carry[_R_SEED], new_ep))
    return out, rew, done, trunc, violf, s


def _rollout_kernel(seed_ref, act_ref, st_ref, out_ref, *, p):
    """Constant-action whole-rollout kernel (throughput/benchmark path)."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = st_ref[:]
    act = act_ref[0]
    if p["normalized"]:
        force = p["act_scale"] * jnp.clip(act, -1.0, 1.0)
    else:
        force = jnp.clip(act, p["a_low"], p["a_high"])
    carry = tuple(rows[i] for i in range(_NROWS))

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        new_carry, *_ = step_env_core(p, carry, force, it, draw, act_raw=act)
        return new_carry

    carry = jax.lax.fori_loop(0, p["steps"], body, carry)
    out_ref[:] = jnp.stack(carry, axis=0)


_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _policy_rollout_kernel(
    seed_ref, logstd_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    st_ref, out_ref, traj_ref, scratch_ref, sem_ref, *, p,
):
    """Policy-in-kernel cartpole rollout (mirrors fast_policy.py for the
    quadrotor): per step, fully VMEM-resident — obs -> dual actor+critic MLP
    forward -> Gaussian sampling -> env step — with the (obs, act, rew,
    done, trunc, v, logp, terminal-obs) record DMA'd to an HBM trajectory
    buffer through a double-buffered scratch."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = st_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]
    sub, lanes = rows.shape[1], rows.shape[2]
    BB = sub * lanes
    carry = tuple(rows[i] for i in range(_NROWS))
    act_fn = jnp.tanh if p["mlp_act"] == "tanh" else \
        (lambda z: jnp.maximum(z, 0.0))

    def forward(obs_rows):
        X = jnp.stack(obs_rows, 0).reshape(_NX, BB)
        h = act_fn(jnp.dot(w1, X, preferred_element_type=jnp.float32) + b1)
        h = act_fn(jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
        O = jnp.dot(w3, h, preferred_element_type=jnp.float32) + b3  # (8, BB)
        return O[0:1], O[1:2]  # actor mean, value

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        s_pre = carry[:_NX]

        # Observation white noise feeds the policy and the record; the env
        # state stays clean (envs/cartpole.py _obs semantics).
        s_pre = obs_noise_rows(p, draw, s_pre, 11.0)

        mean, value = forward(list(s_pre))

        # Gaussian sampling (Box-Muller) + log-prob + action preprocessing.
        u = draw(2, 7.0)
        u1 = 1.0 - u[0].reshape(1, BB)
        u2 = u[1].reshape(1, BB)
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)
        sd = jnp.exp(logstd_ref[0])
        a = mean + sd * eps
        logp_m = -0.5 * eps**2 - logstd_ref[0] - _HALF_LOG_2PI
        if p["normalized"]:
            force_m = p["act_scale"] * jnp.clip(a, -1.0, 1.0)
        else:
            force_m = jnp.clip(a, p["a_low"], p["a_high"])
        pol = jnp.concatenate([force_m, a, value, logp_m], axis=0)  # (4, BB)
        pol3 = pol.reshape(4, sub, lanes)
        force, a_tile, v_tile, logp_tile = pol3[0], pol3[1], pol3[2], pol3[3]

        new_carry, rew, done, trunc, violf, s_post = step_env_core(
            p, carry, force, it, draw, act_raw=a_tile
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
        record = jnp.stack(
            list(s_pre)
            + [a_tile, rew, donef, truncf, v_tile, logp_tile]
            + [si * truncf for si in s_term],  # terminal obs, masked
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


def build_engine_params(env, steps_per_call: int, interpret: bool,
                        allow_normalized: bool = False) -> dict:
    """Static kernel-parameter dict from a CartPole env config."""
    from safe_control_gym_tpu.envs import cartpole as C

    cfg = env.config
    assert supports(cfg, allow_normalized=allow_normalized), \
        "config outside the fast-cartpole envelope"
    ti = {**C._DEFAULT_TASK_INFO, **(cfg.task_info or {})}
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

    # Randomization bounds in counter-slot order (cartpole._reset_core):
    # 0..2 inertia (pole_length, pole_mass, cart_mass), 3..6 init state.
    iprop = cfg.inertial_prop or {}
    nominal = [
        float(iprop.get("pole_length", 1.0)),
        float(iprop.get("pole_mass", 0.1)),
        float(iprop.get("cart_mass", 1.0)),
    ]
    init_state = cfg.init_state or {}
    if isinstance(init_state, (list, np.ndarray)):
        init_state = dict(zip(
            [f"init_{s}" for s in C.STATE_LABELS], np.asarray(init_state, float)
        ))
    nominal += [float(init_state.get(f"init_{s}", 0.0)) for s in C.STATE_LABELS]
    inertial = {**C._DEFAULT_INERTIAL_RAND, **(cfg.inertial_prop_randomization_info or {})} \
        if cfg.randomized_inertial_prop else {}
    init_rand = {**C._DEFAULT_INIT_RAND, **(cfg.init_state_randomization_info or {})} \
        if cfg.randomized_init else {}
    names = ["pole_length", "pole_mass", "cart_mass"] + [
        f"init_{s}" for s in C.STATE_LABELS
    ]
    infos = [inertial] * 3 + [init_rand] * 4
    lo = [float(i[n]["low"]) if n in i else 0.0 for n, i in zip(names, infos)]
    hi = [float(i[n]["high"]) if n in i else 0.0 for n, i in zip(names, infos)]

    if cfg.task == "stabilization":
        task = "stab"
        x_goal = tuple(float(v) for v in np.asarray(env.x_goal, float).reshape(-1))
        traj_type, traj_w, traj_scale, period = "none", 0.0, 0.0, 1.0
        x_axis_sel, plane_off = -1, (0.0, 0.0)
    else:
        task = "traj"
        x_goal = (0.0,) * 4
        plane = ti.get("trajectory_plane", "zx")
        off = ti.get("trajectory_position_offset", (0.0, 0.0))
        plane_off = (float(off[0]), float(off[1]))
        # Which closed-form component lands on the x axis (cartpole's X_GOAL
        # reads pos[:, 0] / vel[:, 0] — benchmark.generate_trajectory).
        x_axis_sel = 0 if plane[0] == "x" else (1 if plane[1] == "x" else -1)
        traj_type = ti.get("trajectory_type")
        period = cfg.episode_len_sec / float(ti.get("num_cycles", 1))
        traj_w = 2.0 * math.pi / period
        traj_scale = float(ti.get("trajectory_scale", 1.0))

    # Constraint program -> per-dim box bounds (supports() guarantees the
    # program is a pure box; envs/constraints.py box_bounds_view).
    if cfg.constraints is not None:
        box = box_bounds_view(cfg.constraints, _NX, 1, env.spaces)
        assert box is not None, \
            "fast engine requires a pure box constraint program (supports())"
        c_s_lo, c_s_hi, c_u_lo, c_u_hi = box
        u_check = bool((c_u_lo > -1e29).any() or (c_u_hi < 1e29).any())
    else:
        c_s_lo = np.asarray(env.spaces.state_low, float)
        c_s_hi = np.asarray(env.spaces.state_high, float)
        c_u_lo, c_u_hi = np.full(1, -1e30), np.full(1, 1e30)
        u_check = False

    return dict(
        use_prng=not interpret,
        steps=steps_per_call,
        n_sub=n_sub,
        dt=1.0 / cfg.pyb_freq,
        ctrl_dt=1.0 / cfg.ctrl_freq,
        g=C.GRAVITY,
        a_low=float(env.spaces.action_low[0]),
        a_high=float(env.spaces.action_high[0]),
        normalized=bool(cfg.normalized_rl_action_space),
        act_scale=float(C.ACTION_THRESHOLD),
        u_goal=float(env.u_goal[0]),
        rew_act_w=float(np.ravel(cfg.rew_act_weight)[0]),
        rew_state_w=tuple(np.broadcast_to(
            np.asarray(cfg.rew_state_weight, float), (4,)).tolist()),
        rew_exp=bool(cfg.rew_exponential),
        q_weight=tuple(np.broadcast_to(
            np.asarray(1.0 if cfg.q_weight is None else cfg.q_weight, float).ravel(),
            (4,)).tolist()),
        r_weight=float(np.ravel(1.0 if cfg.r_weight is None else cfg.r_weight)[0]),
        s_low=tuple(float(v) for v in c_s_lo),
        s_high=tuple(float(v) for v in c_s_hi),
        u_check=bool(u_check),
        u_low=float(c_u_lo[0]),
        u_high=float(c_u_hi[0]),
        x_threshold=float(C.X_THRESHOLD),
        theta_threshold=float(C.THETA_THRESHOLD),
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
        x_axis_sel=x_axis_sel, plane_off=plane_off,
        cost={"quadratic": "quad"}.get(cfg.cost, "rl"),
        rand_nominal=tuple(nominal), rand_lo=tuple(lo), rand_hi=tuple(hi),
    )


def reset_rows(p, B, sub, lanes, seed: int = 0):
    """Fresh packed state rows mirroring ``vec.reset(jax.random.key(seed))``
    bit-exactly (same threefry env seeds, same counter draws at episode 0)."""
    from safe_control_gym_tpu.ops import ctr_prng

    def tile(a):
        return np.asarray(a, np.float32).T.reshape(-1, sub, lanes)

    nm = np.asarray(p["rand_nominal"], np.float32)
    lo = np.asarray(p["rand_lo"], np.float32)
    hi = np.asarray(p["rand_hi"], np.float32)
    keys = jax.random.split(jax.random.key(seed), B)
    es = jax.vmap(ctr_prng.env_seed_from_key)(keys)  # (B,) int32
    base = ctr_prng.episode_base(es, jnp.zeros_like(es))
    u_all = np.asarray(
        jax.vmap(lambda b: ctr_prng.uniform_slots(b, 8))(base), np.float32
    )  # (B, 8)
    drawn = nm + lo + u_all[:, :7] * (hi - lo)  # (B, 7): pl, pm, cm, x0..3
    rows = np.zeros((_NROWS, sub, lanes), np.float32)
    rows[:_NX] = tile(drawn[:, 3:7])
    rows[_R_PL:_R_CM + 1] = tile(drawn[:, :3])
    rows[_R_OFFSET] = tile(
        np.floor(u_all[:, 7:8] * p["max_steps"]).astype(np.float32))[0]
    rows[_R_SEED] = tile(ctr_prng.seed_to_row(es)[:, None])[0]
    return jnp.asarray(rows)


class FastCartPoleRollout:
    """Host wrapper: packed state + one-dispatch rollout calls
    (API-compatible with fast_env.FastQuadRollout)."""

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
        self.n_rows = _NROWS
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
                    spec(1),
                    spec(self.n_rows),
                ],
                out_specs=spec(self.n_rows),
                out_shape=jax.ShapeDtypeStruct((self.n_rows, sub, self.lanes), jnp.float32),
                interpret=interpret,
            )
        )

    def _tile(self, a):
        """(B, k) -> (k, sub, lanes)."""
        return np.asarray(a, np.float32).T.reshape(-1, self.sub, self.lanes)

    def reset(self, seed: int = 0):
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

    def pack(self, env_states):
        """Pack a batched general-engine CartPoleState into fast rows."""
        rows = np.zeros((self.n_rows, self.sub, self.lanes), np.float32)
        rows[:_NX] = self._tile(np.asarray(env_states.x))
        rows[_R_PL] = self._tile(np.asarray(env_states.pole_length)[:, None])[0]
        rows[_R_PM] = self._tile(np.asarray(env_states.pole_mass)[:, None])[0]
        rows[_R_CM] = self._tile(np.asarray(env_states.cart_mass)[:, None])[0]
        rows[_R_STEP] = self._tile(
            np.asarray(env_states.ctrl_step, np.float32)[:, None])[0]
        sched = env_states.dist_sched.get("dynamics")
        if isinstance(sched, dict) and sched.get("offsets") is not None \
                and np.asarray(sched["offsets"]).shape[-1]:
            rows[_R_OFFSET] = self._tile(
                np.asarray(sched["offsets"], np.float32))[0]
        from safe_control_gym_tpu.ops import ctr_prng
        rows[_R_SEED] = self._tile(
            ctr_prng.seed_to_row(env_states.env_seed)[:, None])[0]
        rows[_R_EP] = self._tile(
            np.asarray(env_states.episode_idx, np.float32)[:, None])[0]
        return jnp.asarray(rows)

    def states(self, rows):
        """(B, 4) state matrix from packed rows."""
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
        """Place a scalar/(B,) force command on device once."""
        a = np.asarray(action, np.float32).reshape(-1)
        if a.size == 1:
            a = np.broadcast_to(a, (self.B,))
        return jnp.asarray(a.reshape(1, self.sub, self.lanes))

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


# Trajectory-record rows: obs 4 | act 1 | rew/done/trunc/v/logp | term-obs 4.
TRAJ_ROWS = 14
_T_OBS = slice(0, 4)
_T_ACT = slice(4, 5)
_T_REW, _T_DONE, _T_TRUNC, _T_V, _T_LOGP = 5, 6, 7, 8, 9
_T_TERMOBS = slice(10, 14)


class FastCartPolePolicyRollout:
    """Policy-in-kernel cartpole collection: one dispatch = T policy-driven
    env steps for B envs, returning the full PPO trajectory record.

    API-compatible with fast_policy.FastPolicyRollout (pack_weights /
    unpack_traj / observe / reset / states / run), so controllers/ppo.py's
    ``collect_fast`` drives either engine unchanged."""

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
                                          allow_normalized=True)
        self.params["mlp_act"] = mlp_act
        self.params["_sub"] = sub
        self.params["_lanes"] = self.lanes
        self.obs_dim = _NX
        self.traj_rows = TRAJ_ROWS
        self.n_rows = _NROWS
        p = dict(self.params)
        kern = functools.partial(_policy_rollout_kernel, p=p)
        L = self.lanes
        spec = lambda rows: pl.BlockSpec(
            (rows, sub, L), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        self._call = jax.jit(
            pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[
                    smem(),          # seed
                    smem(),          # logstd (1,)
                    vmem(), vmem(),  # w1 (2H, 4), b1 (2H, 1)
                    vmem(), vmem(),  # w2 (2H, 2H), b2 (2H, 1)
                    vmem(), vmem(),  # w3 (8, 2H), b3 (8, 1)
                    spec(self.n_rows),
                ],
                out_specs=[spec(self.n_rows), pl.BlockSpec(memory_space=pl.ANY)],
                out_shape=[
                    jax.ShapeDtypeStruct((self.n_rows, sub, L), jnp.float32),
                    jax.ShapeDtypeStruct((steps_per_call, TRAJ_ROWS, sub, L), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, TRAJ_ROWS, sub, L), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
        )

    def reset(self, seed: int = 0):
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

    def pack_weights(self, actor_params, critic_params, logstd):
        """Flax MLP params -> fused dual-network matrices (actor rows 0..H-1,
        critic rows H..2H-1; output row 0 actor mean, row 1 value)."""
        H = self.H
        ap, cp = actor_params["params"], critic_params["params"]
        w1 = jnp.concatenate(
            [ap["Dense_0"]["kernel"].T, cp["Dense_0"]["kernel"].T], 0
        )  # (2H, 4)
        b1 = jnp.concatenate(
            [ap["Dense_0"]["bias"], cp["Dense_0"]["bias"]], 0
        )[:, None]
        z = jnp.zeros((H, H), jnp.float32)
        w2 = jnp.block([[ap["Dense_1"]["kernel"].T, z],
                        [z, cp["Dense_1"]["kernel"].T]])  # (2H, 2H)
        b2 = jnp.concatenate(
            [ap["Dense_1"]["bias"], cp["Dense_1"]["bias"]], 0
        )[:, None]
        zh = jnp.zeros((1, H), jnp.float32)
        w3 = jnp.concatenate([
            jnp.concatenate([ap["Dense_2"]["kernel"].T, zh], 1),   # (1, 2H)
            jnp.concatenate([zh, cp["Dense_2"]["kernel"].T], 1),   # (1, 2H)
            jnp.zeros((6, 2 * H), jnp.float32),
        ], 0)  # (8, 2H)
        b3 = jnp.concatenate([
            ap["Dense_2"]["bias"], cp["Dense_2"]["bias"], jnp.zeros(6)
        ])[:, None]
        return (w1.astype(jnp.float32), b1.astype(jnp.float32),
                w2.astype(jnp.float32), b2.astype(jnp.float32),
                w3.astype(jnp.float32), b3.astype(jnp.float32),
                jnp.asarray(logstd, jnp.float32))

    def unpack_traj(self, traj):
        """(T, 14, 8, L) record -> PPO field dict with (T, B, ...) layout."""
        T = traj.shape[0]
        flat = traj.reshape(T, TRAJ_ROWS, self.B)

        def mat(sl):
            return jnp.moveaxis(flat[:, sl], 1, 2)

        return {
            "obs": mat(_T_OBS),
            "act": mat(_T_ACT),
            "rew": flat[:, _T_REW],
            "done": flat[:, _T_DONE],
            "mask": 1.0 - flat[:, _T_DONE],
            "trunc": flat[:, _T_TRUNC],
            "v": flat[:, _T_V],
            "logp": flat[:, _T_LOGP],
            "term_obs": mat(_T_TERMOBS),
        }

    def states(self, rows):
        """(B, 4) state matrix from packed rows (jnp, jit-safe)."""
        return jnp.moveaxis(rows[:_NX].reshape(_NX, self.B), 0, 1)

    def observe(self, rows, key=None):
        """(B, 4) observation (no goal-horizon support in this engine).

        With obs white noise configured and ``key`` given, noised like the
        general engine's _obs (the GAE bootstrap critic input)."""
        x = self.states(rows)
        std = self.params.get("obs_noise_std", 0.0)
        if std > 0.0 and key is not None:
            x = x + std * jax.random.normal(key, x.shape, x.dtype)
        return x

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
