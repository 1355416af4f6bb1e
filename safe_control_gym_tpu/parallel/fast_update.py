"""VMEM-resident PPO minibatch update kernel.

The XLA minibatch SGD is HBM-bound: each fwd+bwd materializes the
(mb, H) hidden activations to HBM and reads them back in the backward —
~200 MB of traffic per 131072-sample minibatch against <1 ms of useful
MXU work (docs/PERF.md round 3; the 2H-wide "more MXU" rewrite made it
SLOWER because it doubled the activation bytes).

This kernel computes the exact PPO actor+critic gradients for one
minibatch with activations resident in VMEM: the packed minibatch
(F=20 f32 per sample, batch on lanes) is double-buffer DMA'd from HBM
chunk-by-chunk, the dual-MLP forward AND hand-written backward run on
the chunk in VMEM, and only the parameter gradients (~70 KB) plus
loss-sum rows leave the kernel.  HBM traffic drops to reading the
minibatch once (~10 MB).

Scope guard (use_clipped_value=False, tanh/relu (H, H) MLPs, Gaussian
policy with state-independent logstd — the PPOConfig defaults); the XLA
path remains for everything else.  Gradient semantics match
jax.value_and_grad of the reference losses exactly (subgradient
conventions of jnp.minimum/jnp.clip included); equality is pinned by
tests/test_fast_update.py.

Layout notes (see fast_policy.py for the lineage): batch on lanes, the
minibatch arrives TRANSPOSED as (F, 8, mb/8); matrix-space quantities
use plain (rows, C) matmuls; backward contractions avoid materialized
transposes — dW = G @ A^T via dot_general contracting the lane dim, and
dX = W^T @ G via pre-transposed weight copies passed in (weights are
tiny).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)

def _make_kernel_body(p):
    H = p["H"]
    CL = p["chunk_lanes"]  # lanes per chunk; chunk batch = 8 * CL
    n_chunks = p["n_chunks"]
    act_name = p["act"]
    clip = p["clip"]
    inv_n = 1.0 / p["mb_total"]
    # Packed-field row offsets (ppo.update packs obs, act, v, logp, ret,
    # adv); v (row nx+nu) is unused — the scope guard excludes
    # use_clipped_value.
    nx, nu = p["nx"], p["nu"]
    F_ROWS = nx + nu + 4
    _OBS = slice(0, nx)
    _ACT = slice(nx, nx + nu)
    _LOGP = nx + nu + 1
    _RET = nx + nu + 2
    _ADV = nx + nu + 3

    def act_fn(z):
        return jnp.tanh(z) if act_name == "tanh" else jnp.maximum(z, 0.0)

    def act_grad(a, z):
        if act_name == "tanh":
            return 1.0 - a * a
        return (z > 0.0).astype(jnp.float32)

    def body(
        mb_ref,
        w1a_ref, b1a_ref, w2a_ref, w2aT_ref, b2a_ref, w3a_ref, w3aT_ref, b3a_ref,
        w1c_ref, b1c_ref, w2c_ref, w2cT_ref, b2c_ref, w3c_ref, w3cT_ref, b3c_ref,
        logstd_ref,
        g1a_ref, gb1a_ref, g2a_ref, gb2a_ref, g3a_ref, gb3a_ref,
        g1c_ref, gb1c_ref, g2c_ref, gb2c_ref, g3c_ref, gb3c_ref,
        glogstd_ref, stats_ref,
        scratch_ref, sem_ref,
    ):
        w1a, b1a = w1a_ref[:], b1a_ref[:]
        w2a, w2aT, b2a = w2a_ref[:], w2aT_ref[:], b2a_ref[:]
        w3a, w3aT, b3a = w3a_ref[:], w3aT_ref[:], b3a_ref[:]
        w1c, b1c = w1c_ref[:], b1c_ref[:]
        w2c, w2cT, b2c = w2c_ref[:], w2cT_ref[:], b2c_ref[:]
        w3c, w3cT, b3c = w3c_ref[:], w3cT_ref[:], b3c_ref[:]
        logstd = logstd_ref[:]          # (nu, 1)
        inv_var = jnp.exp(-2.0 * logstd)

        for r in (g1a_ref, gb1a_ref, g2a_ref, gb2a_ref, g3a_ref, gb3a_ref,
                  g1c_ref, gb1c_ref, g2c_ref, gb2c_ref, g3c_ref, gb3c_ref,
                  glogstd_ref, stats_ref):
            r[:] = jnp.zeros_like(r)

        def start_dma(ci, slot):
            pltpu.make_async_copy(
                mb_ref.at[:, :, pl.ds(ci * CL, CL)],
                scratch_ref.at[slot],
                sem_ref.at[slot],
            ).start()

        start_dma(0, 0)
        if n_chunks > 1:
            start_dma(1, 1)

        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        dotT = functools.partial(  # (m, C) x (n, C) -> (m, n), contract lanes
            jax.lax.dot_general,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def chunk(ci, _):
            slot = jax.lax.rem(ci, 2)
            pltpu.make_async_copy(
                mb_ref.at[:, :, pl.ds(ci * CL, CL)],
                scratch_ref.at[slot],
                sem_ref.at[slot],
            ).wait()
            blk = scratch_ref[slot]          # (F, 8, CL)
            C = 8 * CL
            flat = blk.reshape(F_ROWS, C)
            X = flat[_OBS]                   # (12, C)
            A = flat[_ACT]                   # (nu, C)
            logp_old = flat[_LOGP][None]
            ret = flat[_RET][None]
            adv = flat[_ADV][None]

            # -- forward ---------------------------------------------------
            z1a = dot(w1a, X) + b1a
            a1 = act_fn(z1a)
            z2a = dot(w2a, a1) + b2a
            a2 = act_fn(z2a)
            mean = dot(w3a, a2) + b3a        # (nu, C)

            z1c = dot(w1c, X) + b1c
            c1 = act_fn(z1c)
            z2c = dot(w2c, c1) + b2c
            c2 = act_fn(z2c)
            v = dot(w3c, c2) + b3c           # (1, C)

            # -- losses ----------------------------------------------------
            diff = A - mean
            logp = jnp.sum(
                -0.5 * diff * diff * inv_var - logstd - _HALF_LOG_2PI,
                axis=0, keepdims=True)
            ratio = jnp.exp(logp - logp_old)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv
            min_surr = jnp.minimum(surr1, surr2)

            # d policy_loss / d logp with jnp.minimum / jnp.clip
            # subgradients: minimum passes to the smaller branch (0.5 each
            # at exact ties), clip passes iff strictly inside the bounds.
            take1 = (surr1 < surr2).astype(jnp.float32) \
                + 0.5 * (surr1 == surr2).astype(jnp.float32)
            inside = ((ratio > 1.0 - clip) & (ratio < 1.0 + clip)) \
                .astype(jnp.float32)
            w_pol = -inv_n * (take1 + (1.0 - take1) * inside) * ratio * adv

            # -- actor backward -------------------------------------------
            gmean = w_pol * (diff * inv_var)          # (nu, C)
            g3a_ref[:, :] += dotT(gmean, a2)
            gb3a_ref[:, :] += jnp.sum(gmean, axis=1, keepdims=True)
            ga2 = dot(w3aT, gmean) * act_grad(a2, z2a)
            g2a_ref[:, :] += dotT(ga2, a1)
            gb2a_ref[:, :] += jnp.sum(ga2, axis=1, keepdims=True)
            ga1 = dot(w2aT, ga2) * act_grad(a1, z1a)
            g1a_ref[:, :] += dotT(ga1, X)
            gb1a_ref[:, :] += jnp.sum(ga1, axis=1, keepdims=True)
            glogstd_ref[:, :] += jnp.sum(
                w_pol * (diff * diff * inv_var - 1.0), axis=1, keepdims=True)

            # -- critic backward ------------------------------------------
            gv = inv_n * (v - ret)
            g3c_ref[:, :] += dotT(gv, c2)
            gb3c_ref[:, :] += jnp.sum(gv, axis=1, keepdims=True)
            gc2 = dot(w3cT, gv) * act_grad(c2, z2c)
            g2c_ref[:, :] += dotT(gc2, c1)
            gb2c_ref[:, :] += jnp.sum(gc2, axis=1, keepdims=True)
            gc1 = dot(w2cT, gc2) * act_grad(c1, z1c)
            g1c_ref[:, :] += dotT(gc1, X)
            gb1c_ref[:, :] += jnp.sum(gc1, axis=1, keepdims=True)

            # -- loss sums (reduced outside) -------------------------------
            # Stacked (3, C) -> (3, 8, CL): Mosaic accepts the stacked
            # sublane fold but rejects per-row (1, C) -> (8, CL) casts.
            verr = v - ret
            stats3 = jnp.concatenate(
                [min_surr, logp_old - logp, verr * verr], 0)
            stats_ref[:, :] += jnp.sum(stats3.reshape(3, 8, CL), axis=1)

            # Refill this slot for iteration ci+2 — every value read from it
            # above is already consumed; the DMA overlaps the next
            # iteration's compute on the other slot.
            @pl.when(ci + 2 < n_chunks)
            def _prefetch():
                pltpu.make_async_copy(
                    mb_ref.at[:, :, pl.ds((ci + 2) * CL, CL)],
                    scratch_ref.at[slot],
                    sem_ref.at[slot],
                ).start()

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)

    return body


class FastPPOUpdate:
    """Host wrapper: per-minibatch exact-PPO-gradient kernel."""

    def __init__(self, mb_size: int, hidden: int, act: str, clip_param: float,
                 chunk: int = 4096, interpret: bool = False,
                 obs_dim: int = 12, act_dim: int = 4):
        chunk = min(chunk, mb_size)
        assert mb_size % chunk == 0 and chunk % 8 == 0
        if chunk % 1024 != 0 and not interpret:
            # The in-kernel (F, 8, CL) -> (F, 8*CL) flatten is a
            # sublane->lane fold; Mosaic only supports it when the chunk's
            # lane count (CL = chunk/8) is a whole number of 128-lane
            # registers.  Smaller minibatches would die inside the Mosaic
            # compiler with an internal "unsupported shape cast" — reject
            # them here with an actionable message instead.
            raise ValueError(
                f"FastPPOUpdate requires the minibatch chunk ({chunk}) to be "
                "a multiple of 1024 samples (8 sublanes x 128 lanes) on TPU; "
                "use the XLA update path (use_fast_update=False) for smaller "
                "minibatches."
            )
        self.mb = mb_size
        self.H = hidden
        self.F = obs_dim + act_dim + 4
        p = dict(H=hidden, act=act, clip=clip_param, mb_total=mb_size,
                 nx=obs_dim, nu=act_dim,
                 chunk_lanes=chunk // 8, n_chunks=mb_size // chunk)
        self.p = p
        body = _make_kernel_body(p)
        H = hidden
        CL = p["chunk_lanes"]
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        nx, nu = obs_dim, act_dim
        out_shapes = [
            jax.ShapeDtypeStruct(s, jnp.float32) for s in (
                (H, nx), (H, 1), (H, H), (H, 1), (nu, H), (nu, 1),  # actor
                (H, nx), (H, 1), (H, H), (H, 1), (1, H), (1, 1),    # critic
                (nu, 1),                                            # logstd
                (3, CL),                                            # loss sums
            )
        ]
        self._call = jax.jit(
            pl.pallas_call(
                body,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
                + [vmem() for _ in range(17)],
                out_specs=[vmem() for _ in out_shapes],
                out_shape=out_shapes,
                scratch_shapes=[
                    pltpu.VMEM((2, self.F, 8, CL), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
        )

    def prep_weights(self, ap, cp, logstd):
        """Flax param trees -> kernel weight operands (incl. transposed
        copies for the backward).  Pure jnp — call inside jit.  Kernel
        orientation: W (out, in) = flax kernel.T; the transposed backward
        copies are therefore the flax kernels themselves."""
        a, c = ap["params"], cp["params"]

        def mats(t):
            return (t["Dense_0"]["kernel"].T, t["Dense_0"]["bias"][:, None],
                    t["Dense_1"]["kernel"].T, t["Dense_1"]["kernel"],
                    t["Dense_1"]["bias"][:, None],
                    t["Dense_2"]["kernel"].T, t["Dense_2"]["kernel"],
                    t["Dense_2"]["bias"][:, None])

        return mats(a) + mats(c) + (logstd[:, None],)

    def grads(self, mb_T, weight_ops):
        """mb_T: (F_ROWS, 8, mb/8) packed minibatch, batch on (sub, lanes).

        Returns (actor_grad_tree, critic_grad_tree, glogstd (act_dim,),
        loss_sums (3,) = [sum min_surr, sum (logp_old - logp),
        sum (v - ret)^2])."""
        outs = self._call(mb_T, *weight_ops)
        (g1a, gb1a, g2a, gb2a, g3a, gb3a,
         g1c, gb1c, g2c, gb2c, g3c, gb3c, glogstd, stats) = outs
        ga = {"params": {
            "Dense_0": {"kernel": g1a.T, "bias": gb1a[:, 0]},
            "Dense_1": {"kernel": g2a.T, "bias": gb2a[:, 0]},
            "Dense_2": {"kernel": g3a.T, "bias": gb3a[:, 0]},
        }}
        gc = {"params": {
            "Dense_0": {"kernel": g1c.T, "bias": gb1c[:, 0]},
            "Dense_1": {"kernel": g2c.T, "bias": gb2c[:, 0]},
            "Dense_2": {"kernel": g3c.T, "bias": gb3c[:, 0]},
        }}
        return ga, gc, glogstd[:, 0], jnp.sum(stats, axis=1)
