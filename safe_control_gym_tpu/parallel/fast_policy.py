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
    eval_goal,
    make_draw,
    obs_noise_rows,
    reset_rows,
    step_env_core,
    supports,
    total_rows,
)

# Trajectory-record row layout for the default 12-dim obs (per step, each
# row an (8, L) tile).  With a goal-horizon obs extension the obs/terminal
# blocks widen to D = 12 * obs_mul and the layout is computed per instance
# (FastPolicyRollout._layout): obs D | act 4 | rew/done/trunc/v/logp |
# term-obs D -> 2D + 9 rows.
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
    n_rows = total_rows(p)

    carry = tuple(rows[i] for i in range(n_rows))

    act_fn = jnp.tanh if p["mlp_act"] == "tanh" else \
        (lambda z: jnp.maximum(z, 0.0))
    D = p["obs_dim"]

    def forward(obs_rows):
        """Dual actor+critic forward on the current observation rows
        (state + optional goal-horizon extension).

        Returns (mean (4, BB), value (1, BB))."""
        X = jnp.stack(obs_rows, 0).reshape(D, BB)
        h = act_fn(jnp.dot(w1, X, preferred_element_type=jnp.float32) + b1)
        h = act_fn(jnp.dot(w2, h, preferred_element_type=jnp.float32) + b2)
        O = jnp.dot(w3, h, preferred_element_type=jnp.float32) + b3  # (8, BB)
        return O[0:4], O[4:5]

    def goal_ext_rows(step_tile, first_idx_offset):
        """Goal-horizon extension rows for an obs produced at control step
        ``step_tile`` (benchmark_env.py:406-420): stabilization appends the
        static goal once; tracking appends the next ``obs_goal_horizon``
        reference states, indices clipped to the end of the table."""
        if p.get("obs_mul", 1) <= 1:
            return []
        if p["task"] == "stab":
            return [jnp.full_like(step_tile, v) for v in p["x_goal"]]
        rows = []
        tmax = p["max_steps"] - 1.0
        for i in range(p["obs_goal_horizon"]):
            idx = jnp.minimum(step_tile + (first_idx_offset + i), tmax)
            rows += eval_goal(p, idx)
        return rows

    def body(it, carry):
        draw = make_draw(p, seed_ref, it)
        s_pre = carry[:_NX]

        # -- observation white noise (quadrotor.py obs disturbance): the
        # policy acts on — and the trajectory records — the NOISY obs, while
        # the env state stays clean, matching the general engine's
        # obs-channel semantics.
        s_pre = obs_noise_rows(p, draw, s_pre, 11.0)

        # -- policy + value forward -----------------------------------------
        # Obs = (noisy) state + goal-horizon extension at next_step =
        # ctrl_step + 1 (quadrotor._obs -> _extend_obs); goals stay clean.
        obs_rows = list(s_pre) + goal_ext_rows(carry[_R_STEP], 1.0)
        mean, value = forward(obs_rows)

        # -- Gaussian sampling (Box-Muller on core-PRNG bits) ---------------
        u = draw(8, 7.0)
        u1 = 1.0 - u[0:4].reshape(4, BB)  # (0, 1]: keeps the log finite
        u2 = u[4:8].reshape(4, BB)
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

        # -- shared env step (dynamics/reward/done/stats/auto-reset) --------
        new_carry, rew, done, trunc, violf, collidedf, s_post = step_env_core(
            p, carry, thrust_rows, it, draw, act_rows=act_rows
        )
        donef = done.astype(jnp.float32)
        truncf = trunc.astype(jnp.float32)

        # -- trajectory record: wait slot, fill scratch, start DMA ----------
        slot = jax.lax.rem(it, 2)

        @pl.when(it >= 2)
        def _wait_prev():
            pltpu.make_async_copy(
                scratch_ref.at[slot], traj_ref.at[it - 2], sem_ref.at[slot]
            ).wait()

        # Terminal obs (masked to truncation steps): post-step state + goal
        # extension at the INCREMENTED step's next index (new ctrl_step + 1
        # = step + 2 — quadrotor.py:1031 obs of new_state).  The general
        # engine's terminal observation goes through _obs and is therefore
        # NOISY on the state part; draw fresh noise here so the GAE
        # truncation bootstrap sees the same channel the critic trains on.
        s_term = obs_noise_rows(p, draw, s_post, 13.0)
        term_rows = [si * truncf for si in s_term] + [
            g * truncf for g in goal_ext_rows(carry[_R_STEP], 2.0)
        ]
        record = jnp.stack(
            obs_rows
            + act_rows
            + [rew, donef, truncf, v_tile, logp_tile]
            + term_rows,
            axis=0,
        )
        scratch_ref[slot] = record
        pltpu.make_async_copy(
            scratch_ref.at[slot], traj_ref.at[it], sem_ref.at[slot]
        ).start()
        return new_carry

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
            env, steps_per_call, interpret, allow_normalized=True,
            allow_maze=True, allow_goal_horizon=True,
        )
        self.params["mlp_act"] = mlp_act
        self.params["_sub"] = sub
        self.params["_lanes"] = self.lanes
        # Observation width incl. the goal-horizon extension; the trajectory
        # record widens with it (obs D | act 4 | 5 scalars | term-obs D).
        self.obs_dim = _NX * self.params["obs_mul"]
        self.params["obs_dim"] = self.obs_dim
        self.traj_rows = 2 * self.obs_dim + 9
        self._t_obs = slice(0, self.obs_dim)
        self._t_act = slice(self.obs_dim, self.obs_dim + 4)
        (self._t_rew, self._t_done, self._t_trunc, self._t_v,
         self._t_logp) = range(self.obs_dim + 4, self.obs_dim + 9)
        self._t_termobs = slice(self.obs_dim + 9, self.traj_rows)
        self.n_rows = total_rows(self.params)
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
                    spec(self.n_rows),  # state rows
                ],
                out_specs=[spec(self.n_rows), pl.BlockSpec(memory_space=pl.ANY)],
                out_shape=[
                    jax.ShapeDtypeStruct((self.n_rows, sub, L), jnp.float32),
                    jax.ShapeDtypeStruct((steps_per_call, self.traj_rows, sub, L), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, self.traj_rows, sub, L), jnp.float32),
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
        return reset_rows(self.params, self.B, self.sub, self.lanes, seed)

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
        """(T, traj_rows, 8, L) record -> PPO field dict with (T, B, ...)
        layout.

        Pure jnp — runs inside the caller's jit; one transpose per field.
        """
        T = traj.shape[0]
        flat = traj.reshape(T, self.traj_rows, self.B)  # (T, rows, B)

        def mat(sl):
            return jnp.moveaxis(flat[:, sl], 1, 2)  # (T, B, d)

        return {
            "obs": mat(self._t_obs),
            "act": mat(self._t_act),
            "rew": flat[:, self._t_rew],
            "done": flat[:, self._t_done],
            "mask": 1.0 - flat[:, self._t_done],
            "trunc": flat[:, self._t_trunc],
            "v": flat[:, self._t_v],
            "logp": flat[:, self._t_logp],
            "term_obs": mat(self._t_termobs),
        }

    def states(self, rows):
        """(B, 12) state matrix from packed rows (jnp, jit-safe)."""
        return jnp.moveaxis(rows[:_NX].reshape(_NX, self.B), 0, 1)

    def observe(self, rows, key=None):
        """(B, obs_dim) observation matrix from packed rows (jnp, jit-safe):
        state + goal-horizon extension at next_step = ctrl_step + 1, gathered
        from the env's X_GOAL table exactly like the general engine
        (quadrotor._extend_obs, benchmark_env.py:406-420).  Used for the GAE
        bootstrap value of the post-rollout state.

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
            ext = jnp.broadcast_to(xg.reshape(-1), (self.B, _NX))
            return jnp.concatenate([x, ext], axis=-1)
        steps = rows[_R_STEP].reshape(self.B).astype(jnp.int32)  # ctrl_step
        h = self.params["obs_goal_horizon"]
        idx = jnp.clip(steps[:, None] + 1 + jnp.arange(h)[None, :],
                       0, xg.shape[0] - 1)  # (B, h)
        ext = xg[idx].reshape(self.B, h * _NX)
        return jnp.concatenate([x, ext], axis=-1)

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
