"""Policy-in-kernel whole-rollout engine: PPO data collection as ONE Pallas
dispatch.

Round 1's whole-rollout engine (fast_env.py) could only apply a constant
action — the framework's main consumer (RL training) was excluded from its
fastest path (docs/PERF.md).  This engine puts the actor AND critic MLP
forward inside the rollout kernel:

  per step, fully VMEM-resident:
    obs -> dual-MLP forward (actor mean + value, one fused matmul chain on
    the MXU) -> Gaussian sampling via the TPU core PRNG (Box-Muller) ->
    log-prob -> normalized-action -> actuation pipeline -> RK4 substeps ->
    reward / done / episode stats -> masked auto-reset,
  with the (obs, act, rew, done, trunc, v, logp, terminal-obs) record DMA'd
  to an HBM trajectory buffer through a double-buffered scratch.

MXU layout: state components live as (8, B/8) tiles (full-VPU layout for
the dynamics); the MLP forward reshapes them once per step into a
(12, B) matrix so the layer contractions ride the MXU — measured 2.0
us/step for the full 128-wide dual forward at B=4096 vs 6.9 us/step for a
relayout-free kron-expanded formulation (8x FLOP waste loses to one
relayout).

The PPO integration (controllers/ppo.py use_fast_rollout) swaps this in
for the scan-based collect; GAE, terminal-value bootstrap (computed outside
from the stored terminal observations) and the update consume the
trajectory unchanged, so learning semantics match the general engine up to
the PRNG stream (reference rollout semantics: ppo_utils.py:282-456).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safe_control_gym_tpu.ops.pallas_quad import _actuate, _axpy, _fc_rows
from safe_control_gym_tpu.parallel.fast_env import (
    _NROWS,
    _NX,
    _R_J,
    _R_MASS,
    _R_OFFSET,
    _R_STATS,
    _R_STEP,
    _bits_to_unit,
    build_engine_params,
    supports,
)

# Trajectory-record row layout (per step, each row an (8, L) tile).
TRAJ_ROWS = 33
_T_OBS = slice(0, 12)
_T_ACT = slice(12, 16)
_T_REW, _T_DONE, _T_TRUNC, _T_V, _T_LOGP = 16, 17, 18, 19, 20
_T_TERMOBS = slice(21, 33)

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _policy_rollout_kernel(
    seed_ref, logstd_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    st_ref, out_ref, traj_ref, scratch_ref, sem_ref, *, p,
):
    """p: static parameter dict (fast_env.build_engine_params + policy keys)."""
    if p["use_prng"]:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = st_ref[:]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]
    sub, lanes = rows.shape[1], rows.shape[2]
    BB = sub * lanes

    carry = tuple(rows[i] for i in range(_NROWS))

    def fc(s, f, ext, minv, jd):
        return _fc_rows(s, f, ext, minv, jd, g=p["g"], arm_l=p["arm_l"],
                        km_over_kf=p["km_over_kf"])

    act_fn = jnp.tanh if p["mlp_act"] == "tanh" else \
        (lambda z: jnp.maximum(z, 0.0))

    def forward(s):
        """Dual actor+critic forward on the current state rows.

        Returns (mean (4, BB), value (1, BB))."""
        X = jnp.stack(s, 0).reshape(_NX, BB)
        h = act_fn(jnp.dot(w1, X, preferred_element_type=jnp.float32) + b1)
        h = act_fn(jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
        O = jnp.dot(w3, h, preferred_element_type=jnp.float32) + b3  # (8, BB)
        return O[0:4], O[4:5]

    def body(it, carry):
        s = carry[:_NX]
        mass, jd = carry[_R_MASS], carry[_R_J:_R_J + 3]
        step_f = carry[_R_STEP]
        offset = carry[_R_OFFSET]
        stats = carry[_R_STATS:]

        # -- policy + value forward -----------------------------------------
        mean, value = forward(s)

        # -- Gaussian sampling (Box-Muller on core-PRNG bits) ---------------
        if p["use_prng"]:
            bits = pltpu.prng_random_bits((8, BB))
            u = _bits_to_unit(pltpu.bitcast(bits, jnp.uint32))
        else:
            kf = jax.lax.broadcasted_iota(jnp.float32, (8, BB), 0)
            lf = jax.lax.broadcasted_iota(jnp.float32, (8, BB), 1)
            h0 = jnp.sin(kf * 12.99 + lf * 0.713 + it.astype(jnp.float32) * 7.77
                         + seed_ref[0].astype(jnp.float32)) * 43758.5453
            u = h0 - jnp.floor(h0)
        u1 = 1.0 - u[0:4]  # (0, 1]: keeps the log finite
        u2 = u[4:8]
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)

        # All policy quantities in (k, BB) matrix space, then ONE reshape
        # back to (k, sub, lanes) tiles (Mosaic supports the stacked shape
        # cast but not per-row (1, BB) -> (sub, lanes) casts).
        act_list, thrust_list = [], []
        logp_m = jnp.zeros((1, BB), jnp.float32)
        for i in range(4):
            sd = jnp.exp(logstd_ref[i])
            a_i = mean[i:i + 1] + sd * eps[i:i + 1]
            act_list.append(a_i)
            logp_m = logp_m - 0.5 * eps[i:i + 1] ** 2 - logstd_ref[i] - _HALF_LOG_2PI
            if p["normalized"]:
                t_i = (1.0 + p["norm_act_scale"] * jnp.clip(a_i, -1.0, 1.0)) \
                    * p["hover_thrust"]
            else:
                t_i = jnp.clip(a_i, p["a_low"], p["a_high"])
            thrust_list.append(t_i)
        pol = jnp.concatenate(
            thrust_list + act_list + [value, logp_m], axis=0
        )  # (10, BB)
        pol3 = pol.reshape(10, sub, lanes)
        thrust_rows = [pol3[i] for i in range(4)]
        act_rows = [pol3[4 + i] for i in range(4)]
        v_tile, logp_tile = pol3[8], pol3[9]
        forces = tuple(_actuate(t) for t in thrust_rows)
        act_cost = sum(
            (t - p["u_goal"]) ** 2 for t in thrust_rows
        ) * p["rew_act_w"]

        # -- impulse dynamics disturbance ----------------------------------
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
        else:
            z = jnp.zeros_like(step_f)
            ext = (z, z, z)

        # -- substeps (same chain as fast_env._rollout_kernel) --------------
        s_pre = s
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

        # -- trajectory reference (closed-form, fast_env comment applies) ---
        goal = [None] * _NX
        if p["task"] == "stab":
            for k in range(_NX):
                goal[k] = p["x_goal"][k]
        else:
            t = step_f * p["ctrl_dt"]
            w = p["traj_w"]
            sw, cw = jnp.sin(w * t), jnp.cos(w * t)
            sc = p["traj_scale"]
            if p["traj_type"] == "figure8":
                a_p, b_p = sc * sw, sc * sw * cw
                a_v, b_v = sc * w * cw, sc * w * (cw * cw - sw * sw)
            else:  # circle
                a_p, b_p = sc * cw, sc * sw
                a_v, b_v = -sc * w * sw, sc * w * cw
            zero = jnp.zeros_like(sw)
            p3 = [zero, zero, zero]
            v3 = [zero, zero, zero]
            ia, ib = p["plane_idx"]
            p3[ia] = a_p + p["plane_off"][0]
            p3[ib] = b_p + p["plane_off"][1]
            v3[ia] = a_v
            v3[ib] = b_v
            M = p["proj"]
            for k in range(3):
                gp = M[k][0] * p3[0] + M[k][1] * p3[1] + M[k][2] * p3[2] + M[k][3]
                gv = M[k][0] * v3[0] + M[k][1] * v3[1] + M[k][2] * v3[2] + M[k][3]
                goal[2 * k] = gp
                goal[2 * k + 1] = gv
            for k in range(6, _NX):
                goal[k] = zero

        # -- reward ---------------------------------------------------------
        dist = act_cost
        for k in range(_NX):
            e = s[k] - goal[k]
            dist = dist + p["rew_state_w"][k] * e * e
        rew = jnp.exp(-dist) if p["rew_exp"] else -dist

        # -- done: out-of-bound + time limit --------------------------------
        new_step = step_f + 1.0
        timeout = new_step >= p["max_steps"]
        oob_done = jnp.zeros_like(timeout)
        viol = None
        for k in range(_NX):
            lo, hi = p["s_low"][k], p["s_high"][k]
            out_k = (s[k] < lo) | (s[k] > hi)
            viol = out_k if viol is None else (viol | out_k)
            if p["done_oob"] and p["oob_mask"][k]:
                oob_done = oob_done | out_k
        done = timeout | oob_done
        trunc = timeout & ~oob_done  # TimeLimit.truncated semantics
        violf = viol.astype(jnp.float32) if p["count_viol"] \
            else jnp.zeros_like(step_f)

        # -- episode stats --------------------------------------------------
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

        # -- trajectory record: wait slot, fill scratch, start DMA ----------
        slot = jax.lax.rem(it, 2)
        truncf = trunc.astype(jnp.float32)

        @pl.when(it >= 2)
        def _wait_prev():
            pltpu.make_async_copy(
                scratch_ref.at[slot], traj_ref.at[it - 2], sem_ref.at[slot]
            ).wait()

        record = jnp.stack(
            list(s_pre)
            + act_rows
            + [rew, donef, truncf, v_tile, logp_tile]
            + [si * truncf for si in s],  # terminal obs, masked to truncation
            axis=0,
        )
        scratch_ref[slot] = record
        pltpu.make_async_copy(
            scratch_ref.at[slot], traj_ref.at[it], sem_ref.at[slot]
        ).start()

        # -- masked auto-reset (fast_env semantics) -------------------------
        if p["use_prng"]:
            bits = pltpu.prng_random_bits((17, sub, lanes))
            ur = _bits_to_unit(pltpu.bitcast(bits, jnp.uint32))
        else:
            kf = jax.lax.broadcasted_iota(jnp.float32, (17, sub, lanes), 0)
            sf = jax.lax.broadcasted_iota(jnp.float32, (17, sub, lanes), 1)
            lf = jax.lax.broadcasted_iota(jnp.float32, (17, sub, lanes), 2)
            h0 = jnp.sin(kf * 7.91 + sf * 3.77 + lf * 0.613
                         + it.astype(jnp.float32) * 17.23
                         + seed_ref[0].astype(jnp.float32)) * 43758.5453
            ur = h0 - jnp.floor(h0)
        nm, lo_v, hi_v = p["rand_nominal"], p["rand_lo"], p["rand_hi"]
        new_x = []
        for k in range(_NX):
            drawn = nm[4 + k] + lo_v[4 + k] + ur[k] * (hi_v[4 + k] - lo_v[4 + k])
            new_x.append(jnp.where(done, drawn, s[k]))
        new_mass = jnp.where(done, nm[0] + lo_v[0] + ur[12] * (hi_v[0] - lo_v[0]), mass)
        new_j = tuple(
            jnp.where(done, nm[1 + i] + lo_v[1 + i] + ur[13 + i] * (hi_v[1 + i] - lo_v[1 + i]), jd[i])
            for i in range(3)
        )
        new_off = jnp.where(done, jnp.floor(ur[16] * p["max_steps"]), offset)
        new_step = jnp.where(done, 0.0, new_step)

        return tuple(new_x) + (new_mass,) + new_j + (new_step, new_off) + new_stats

    carry = jax.lax.fori_loop(0, p["steps"], body, carry)
    # Drain the last two in-flight records.
    for k in (p["steps"] - 2, p["steps"] - 1):
        if k >= 0:
            pltpu.make_async_copy(
                scratch_ref.at[k % 2], traj_ref.at[k], sem_ref.at[k % 2]
            ).wait()
    out_ref[:] = jnp.stack(carry, axis=0)


class FastPolicyRollout:
    """Host wrapper: one dispatch = T policy-driven env steps for B envs,
    returning the full PPO trajectory record."""

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
        self.params = build_engine_params(
            env, steps_per_call, interpret, allow_normalized=True
        )
        self.params["mlp_act"] = mlp_act
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
                    smem(),          # logstd (4,)
                    vmem(), vmem(),  # w1 (2H, 12), b1 (2H, 1)
                    vmem(), vmem(),  # w2 (2H, 2H), b2 (2H, 1)
                    vmem(), vmem(),  # w3 (8, 2H), b3 (8, 1)
                    spec(_NROWS),    # state rows
                ],
                out_specs=[spec(_NROWS), pl.BlockSpec(memory_space=pl.ANY)],
                out_shape=[
                    jax.ShapeDtypeStruct((_NROWS, sub, L), jnp.float32),
                    jax.ShapeDtypeStruct((steps_per_call, TRAJ_ROWS, sub, L), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, TRAJ_ROWS, sub, L), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
        )

    # -- state packing (same layout as FastQuadRollout) ----------------------
    def _tile(self, a):
        """(B, k) -> (k, sub, lanes)."""
        return np.asarray(a, np.float32).T.reshape(-1, self.sub, self.lanes)

    def reset(self, seed: int = 0):
        """Fresh packed state: same affine draws as the general engine."""
        rng = np.random.default_rng(seed)
        nm = np.asarray(self.params["rand_nominal"])
        lo = np.asarray(self.params["rand_lo"])
        hi = np.asarray(self.params["rand_hi"])
        u = rng.random((self.B, 16), dtype=np.float32)
        drawn = nm + lo + u * (hi - lo)  # (B, 16): mass, j3, x12
        rows = np.zeros((_NROWS, self.sub, self.lanes), np.float32)
        rows[:_NX] = self._tile(drawn[:, 4:])
        rows[_R_MASS] = self._tile(drawn[:, :1])[0]
        rows[_R_J:_R_J + 3] = self._tile(drawn[:, 1:4])
        rows[_R_OFFSET] = self._tile(
            np.floor(rng.random((self.B, 1)) * self.params["max_steps"]).astype(np.float32)
        )[0]
        return jnp.asarray(rows)

    # -- weight packing ------------------------------------------------------
    def pack_weights(self, actor_params, critic_params, logstd):
        """Flax MLP params -> fused dual-network matrices.

        Layout: rows 0..H-1 actor, H..2H-1 critic in the hidden layers;
        output rows 0..3 actor mean, row 4 value, 5..7 zero padding.
        Pure jnp — runs inside the caller's jit.
        """
        H = self.H
        ap, cp = actor_params["params"], critic_params["params"]
        w1 = jnp.concatenate(
            [ap["Dense_0"]["kernel"].T, cp["Dense_0"]["kernel"].T], 0
        )  # (2H, 12)
        b1 = jnp.concatenate(
            [ap["Dense_0"]["bias"], cp["Dense_0"]["bias"]], 0
        )[:, None]
        z = jnp.zeros((H, H), jnp.float32)
        w2 = jnp.block([[ap["Dense_1"]["kernel"].T, z],
                        [z, cp["Dense_1"]["kernel"].T]])  # (2H, 2H)
        b2 = jnp.concatenate(
            [ap["Dense_1"]["bias"], cp["Dense_1"]["bias"]], 0
        )[:, None]
        za = jnp.zeros((4, H), jnp.float32)
        zc = jnp.zeros((1, H), jnp.float32)
        w3 = jnp.concatenate([
            jnp.concatenate([ap["Dense_2"]["kernel"].T, za], 1),   # (4, 2H)
            jnp.concatenate([zc, cp["Dense_2"]["kernel"].T], 1),   # (1, 2H)
            jnp.zeros((3, 2 * H), jnp.float32),
        ], 0)  # (8, 2H)
        b3 = jnp.concatenate([
            ap["Dense_2"]["bias"], cp["Dense_2"]["bias"], jnp.zeros(3)
        ])[:, None]
        return (w1.astype(jnp.float32), b1.astype(jnp.float32),
                w2.astype(jnp.float32), b2.astype(jnp.float32),
                w3.astype(jnp.float32), b3.astype(jnp.float32),
                jnp.asarray(logstd, jnp.float32))

    # -- trajectory unpacking ------------------------------------------------
    def unpack_traj(self, traj):
        """(T, 33, 8, L) record -> PPO field dict with (T, B, ...) layout.

        Pure jnp — runs inside the caller's jit; one transpose per field.
        """
        T = traj.shape[0]
        flat = traj.reshape(T, TRAJ_ROWS, self.B)  # (T, rows, B)

        def mat(sl):
            return jnp.moveaxis(flat[:, sl], 1, 2)  # (T, B, d)

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
        """(B, 12) state matrix from packed rows (jnp, jit-safe)."""
        return jnp.moveaxis(rows[:_NX].reshape(_NX, self.B), 0, 1)

    def run(self, rows, weights, seed=None):
        """One dispatch = T policy-driven env steps.

        ``weights``: tuple from :meth:`pack_weights`.  Returns
        (new_state_rows, traj_record)."""
        if seed is None:
            seed = self._auto_seed
            self._auto_seed += 1
        if not isinstance(seed, jax.Array):
            seed = jnp.asarray([seed], jnp.int32)
        w1, b1, w2, b2, w3, b3, logstd = weights
        return self._call(seed, logstd, w1, b1, w2, b2, w3, b3, rows)
