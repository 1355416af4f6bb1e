"""PPO (clipped surrogate) — fully-jitted, sharded-ready.

TPU-native counterpart of the reference's PPO
(safe_control_gym/controllers/ppo/ppo.py + ppo_utils.py).  Semantics kept:

  * rollout over a vectorized env batch with obs/reward normalizers
    (ppo.py:247-276);
  * time-truncation bootstrap: at TimeLimit-truncated steps the critic value
    of the terminal observation is folded into the reward as
    ``rew += gamma * terminal_v`` (ppo.py:259-273, ppo_utils.py:441-443);
  * returns/advantages via reversed GAE scan with done masks
    (ppo_utils.py:428-456), global advantage standardization (ppo.py:290);
  * clipped surrogate + entropy, approximate-KL-gated actor updates
    (skip actor minibatch when approx_kl > 1.5 * target_kl,
    ppo_utils.py:128-161), optional clipped value loss (ppo_utils.py:112-126);
  * Gaussian policy: MLP mean + state-independent logstd initialized at -0.5
    (ppo_utils.py:186-187).

Where the reference steps pipes to worker processes and torch on one device,
here the whole ``train_step`` — rollout scan, GAE, opt_epochs x minibatch
SGD — is ONE jitted program; under a device mesh the env batch shards over
``env`` and gradients psum over ICI (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.models.distributions import Normal
from safe_control_gym_tpu.models.networks import MLP
from safe_control_gym_tpu.models.normalization import MeanStdNormalizer, RewardStdNormalizer
from safe_control_gym_tpu.parallel import make_vec_env


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults mirror the reference's ppo.yaml."""

    hidden_dim: int = 64
    activation: str = "tanh"
    norm_obs: bool = False
    norm_reward: bool = False
    clip_obs: float = 10.0
    clip_reward: float = 10.0
    gamma: float = 0.99
    use_gae: bool = False
    gae_lambda: float = 0.95
    use_clipped_value: bool = False
    clip_param: float = 0.2
    target_kl: float = 0.01
    entropy_coef: float = 0.01
    opt_epochs: int = 10
    mini_batch_size: int = 64
    # True (reference semantics, ppo_utils.py:147): a fresh random
    # permutation every epoch.  False: ONE shuffle per train step, epochs
    # iterate the same minibatch blocks in rotated order — saves a
    # ~ms-per-epoch gather on TPU; learning quality is indistinguishable.
    reshuffle_each_epoch: bool = True
    # Minibatch SGD through ONE fused 2H-wide network (actor+critic hidden
    # layers concatenated, cross-blocks structurally zero): gradients are
    # mathematically identical to the separate nets (disjoint params,
    # additive losses; tested equal to fp tolerance).  Measured SLOWER on
    # TPU at B=4096 x T=128 (SGD scan 12.8 -> 28.9 ms): the update is
    # HBM-bound on (N, H) activation traffic, and doubling H doubles the
    # bytes — MXU tiling was never the bottleneck.  Kept for A/B evidence;
    # the bandwidth fix is the VMEM-resident update path.
    fused_update: bool = False
    # VMEM-resident Pallas minibatch update (parallel/fast_update.py): the
    # packed minibatch is read from HBM ONCE and the dual-MLP fwd+bwd runs
    # with activations resident in VMEM — the bandwidth fix the profile
    # asked for (the XLA update round-trips ~200 MB of activations per
    # 131072-sample minibatch; measured 25.6 -> 16.7 ms/train-step,
    # 21.3M -> 31.5M env-steps/s at B=4096 x T=128).  Exact gradients
    # (tests/test_fast_update.py); requires tanh/relu MLPs and
    # use_clipped_value=False (obs/act dims are kernel parameters —
    # quad-3D, cartpole, and planar-quad shapes all covered).  "auto"
    # (default) enables it on the TPU backend when those conditions hold;
    # True forces it (asserts on violation); False keeps the XLA update.
    use_fast_update: Any = "auto"
    actor_lr: float = 3e-4
    critic_lr: float = 1e-3
    max_grad_norm: float = 0.5
    max_env_steps: int = 1_000_000
    rollout_batch_size: int = 4
    rollout_steps: int = 100


class ActorCritic(struct.PyTreeNode):
    actor_params: Any
    critic_params: Any
    logstd: jnp.ndarray


class PPOState(struct.PyTreeNode):
    ac: ActorCritic
    actor_opt: Any
    critic_opt: Any
    obs_norm: MeanStdNormalizer
    rew_norm: RewardStdNormalizer
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    total_steps: jnp.ndarray


class PPO(BaseController):
    """Host shell; all compute lives in the jitted ``self._train_step``.

    ``use_fast_rollout=True`` collects trajectories with the policy-in-kernel
    whole-rollout Pallas engine (parallel/fast_policy.py) instead of the
    scan: the entire rollout — actor/critic forward, Gaussian sampling,
    dynamics, reward, auto-reset, trajectory recording — is ONE kernel
    dispatch.  Requires the fast-engine config envelope (3D quad, rl_reward,
    no obs/act disturbances), norm_obs/norm_reward off, 64-wide tanh/relu
    MLPs, and rollout_batch_size a multiple of 1024.  Learning semantics
    match the scan path up to the PRNG stream (tests/test_fast_policy.py).
    """

    def __init__(self, env, seed: int = 0, output_dir: str = ".", action_filter_fn=None,
                 use_fast_rollout: bool = False, fast_interpret: bool = False, **kwargs):
        super().__init__(env, output_dir=output_dir, seed=seed)
        known = {f.name for f in dataclasses.fields(PPOConfig)}
        self.cfg = PPOConfig(**{k: v for k, v in kwargs.items() if k in known})
        self.use_fast_rollout = use_fast_rollout
        self._fast_interpret = fast_interpret
        # Optional pure hook (obs, act) -> act applied after sampling — the
        # safety-layer projection point (reference SafePPO applies Dalal's
        # layer inside the actor's act, safe_ppo_utils.py:15-130).
        self.action_filter_fn = action_filter_fn
        cfg = self.cfg
        self.vec = make_vec_env(env, cfg.rollout_batch_size)
        obs_dim = env.spaces.obs_dim
        act_dim = env.spaces.action_dim
        self.actor = MLP(act_dim, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation, out_gain=0.01)
        self.critic = MLP(1, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.actor_lr)
        )
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.critic_lr)
        )
        key = jax.random.key(seed)
        k1, k2, k3, self._carry_key = jax.random.split(key, 4)
        dummy = jnp.zeros((1, obs_dim))
        ac = ActorCritic(
            actor_params=self.actor.init(k1, dummy),
            critic_params=self.critic.init(k2, dummy),
            logstd=-0.5 * jnp.ones((act_dim,)),
        )
        self._fp = None
        if use_fast_rollout:
            from safe_control_gym_tpu.envs.cartpole import CartPoleConfig

            assert not (cfg.norm_obs or cfg.norm_reward), \
                "fast rollout does not implement running normalizers"
            assert action_filter_fn is None
            if isinstance(env.config, CartPoleConfig):
                from safe_control_gym_tpu.parallel.fast_cartpole import (
                    FastCartPolePolicyRollout,
                )
                from safe_control_gym_tpu.parallel.fast_cartpole import (
                    supports as cp_supports,
                )

                assert cp_supports(env.config, allow_normalized=True), \
                    "env config outside the fast-cartpole envelope"
                assert act_dim == 1
                self._fp = FastCartPolePolicyRollout(
                    env, cfg.rollout_batch_size, cfg.rollout_steps,
                    mlp_hidden=cfg.hidden_dim, mlp_act=cfg.activation,
                    interpret=self._fast_interpret,
                )
            elif not hasattr(env.config, "quad_type"):
                raise AssertionError(
                    "use_fast_rollout supports CartPole and Quadrotor "
                    f"configs only, got {type(env.config).__name__}"
                )
            elif int(env.config.quad_type) in (1, 2):
                from safe_control_gym_tpu.parallel.fast_quad_planar import (
                    FastPlanarQuadPolicyRollout,
                )
                from safe_control_gym_tpu.parallel.fast_quad_planar import (
                    supports as pq_supports,
                )

                assert pq_supports(env.config, allow_normalized=True,
                                   allow_goal_horizon=True), \
                    "env config outside the fast-planar-quad envelope"
                self._fp = FastPlanarQuadPolicyRollout(
                    env, cfg.rollout_batch_size, cfg.rollout_steps,
                    mlp_hidden=cfg.hidden_dim, mlp_act=cfg.activation,
                    interpret=self._fast_interpret,
                )
            else:
                from safe_control_gym_tpu.parallel.fast_env import supports
                from safe_control_gym_tpu.parallel.fast_policy import (
                    FastPolicyRollout,
                )

                assert supports(env.config, allow_normalized=True,
                                allow_goal_horizon=True), \
                    "env config outside the fast-engine envelope"
                assert act_dim == 4
                self._fp = FastPolicyRollout(
                    env, cfg.rollout_batch_size, cfg.rollout_steps,
                    mlp_hidden=cfg.hidden_dim, mlp_act=cfg.activation,
                    interpret=self._fast_interpret,
                )
            assert obs_dim == self._fp.obs_dim, \
                (obs_dim, self._fp.obs_dim)
            env_state = self._fp.reset(seed)
            # Initial obs carries the configured obs noise, like the general
            # engine's reset (quadrotor._obs of the reset state).
            obs = self._fp.observe(env_state, key=k3)
        else:
            env_state, obs, _ = jax.jit(self.vec.reset)(k3)
        self.state = PPOState(
            ac=ac,
            actor_opt=self.actor_tx.init((ac.actor_params, ac.logstd)),
            critic_opt=self.critic_tx.init(ac.critic_params),
            obs_norm=MeanStdNormalizer.create((obs_dim,), clip=cfg.clip_obs),
            rew_norm=RewardStdNormalizer.create(
                cfg.rollout_batch_size, gamma=cfg.gamma, clip=cfg.clip_reward
            ),
            env_state=env_state,
            obs=obs,
            key=self._carry_key,
            total_steps=jnp.zeros((), jnp.int32),
        )
        self._fu = None
        use_fu = cfg.use_fast_update
        if use_fu == "auto":
            mb = cfg.mini_batch_size
            use_fu = (
                (jax.default_backend() == "tpu" or self._fast_interpret)
                and not cfg.use_clipped_value
                and not cfg.fused_update  # explicit A/B request wins over auto
                and cfg.activation in ("tanh", "relu")
                and obs_dim <= 128 and act_dim <= 8
                and mb % 8 == 0
                # FastPPOUpdate chunks the minibatch at 4096 (VMEM limit);
                # the minibatch must split into whole chunks, and each
                # chunk must be a whole number of (8 sublane x 128 lane)
                # registers for the in-kernel flatten (Mosaic rejects
                # narrower sublane->lane folds) — so mb must be a
                # multiple of 1024 below the chunk size.
                and (mb % 1024 == 0 if mb <= 4096 else mb % 4096 == 0)
            )
        if use_fu:
            from safe_control_gym_tpu.parallel.fast_update import FastPPOUpdate

            # The two update rewrites are mutually exclusive: fused_update is
            # the XLA 2H-wide A/B path, and silently preferring the Pallas
            # kernel would misattribute its numbers.
            assert not cfg.fused_update, \
                "use_fast_update=True conflicts with fused_update=True"
            assert not cfg.use_clipped_value and cfg.activation in ("tanh", "relu")
            assert cfg.mini_batch_size % 8 == 0
            self._fu = FastPPOUpdate(
                cfg.mini_batch_size, cfg.hidden_dim, cfg.activation,
                cfg.clip_param, interpret=self._fast_interpret,
                obs_dim=obs_dim, act_dim=act_dim,
            )
        self._train_step_fn = self._make_train_step()
        self._train_step = jax.jit(self._train_step_fn)
        # train_many(n) chunked dispatch comes from BaseController.

    # -- pure functions -------------------------------------------------------
    def _dist(self, ac: ActorCritic, obs):
        mean = self.actor.apply(ac.actor_params, obs)
        return Normal(mean, jnp.exp(ac.logstd))

    def _value(self, ac: ActorCritic, obs):
        return self.critic.apply(ac.critic_params, obs)[..., 0]

    def _make_train_step(self):
        cfg = self.cfg
        B, T = cfg.rollout_batch_size, cfg.rollout_steps
        vec = self.vec

        def collect(state: PPOState):
            def body(carry, _):
                st = carry
                key, k_act = jax.random.split(st.key)
                dist = self._dist(st.ac, st.obs)
                act = dist.sample(k_act)
                if self.action_filter_fn is not None:
                    act = self.action_filter_fn(st.obs, act)
                logp = dist.log_prob(act)
                v = self._value(st.ac, st.obs)
                env_state, next_obs, rew, done, info = vec.step(st.env_state, act)
                next_obs_n, obs_norm = (
                    st.obs_norm(next_obs) if cfg.norm_obs else (next_obs, st.obs_norm)
                )
                rew_n, rew_norm = (
                    st.rew_norm(rew, done) if cfg.norm_reward else (rew, st.rew_norm)
                )
                # Truncation bootstrap (ppo.py:259-273).
                truncated = info["TimeLimit.truncated"]
                term_obs = info["terminal_observation"]
                terminal_v = jnp.where(truncated, self._value(st.ac, term_obs), 0.0)
                out = {
                    "obs": st.obs,
                    "act": act,
                    "rew": rew_n,
                    "mask": 1.0 - done.astype(rew_n.dtype),
                    "v": v,
                    "logp": logp,
                    "terminal_v": terminal_v,
                }
                st = st.replace(
                    env_state=env_state,
                    obs=next_obs_n,
                    obs_norm=obs_norm,
                    rew_norm=rew_norm,
                    key=key,
                )
                return st, out

            state, roll = jax.lax.scan(body, state, None, length=T)
            return state, roll

        def collect_fast(state: PPOState):
            """Whole-rollout Pallas collection (one kernel dispatch)."""
            fp = self._fp
            key, k_seed, k_obs = jax.random.split(state.key, 3)
            seed = jax.random.randint(k_seed, (1,), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            w1, b1, w2, b2, w3, b3, logstd = fp.pack_weights(
                state.ac.actor_params, state.ac.critic_params, state.ac.logstd
            )
            rows, traj = fp._call(seed, logstd, w1, b1, w2, b2, w3, b3,
                                  state.env_state)
            d = fp.unpack_traj(traj)
            # Truncation bootstrap from the stored terminal observations
            # (one batched critic matmul; the kernel masks term_obs to
            # truncated steps).
            term_v = jnp.where(
                d["trunc"] > 0.0, self._value(state.ac, d["term_obs"]), 0.0
            )
            roll = {
                "obs": d["obs"],
                "act": d["act"],
                "rew": d["rew"],
                "mask": d["mask"],
                "v": d["v"],
                "logp": d["logp"],
                "terminal_v": term_v,
            }
            # The bootstrap obs carries the configured obs noise like the
            # general engine's state.obs (quadrotor._obs of the final state).
            state = state.replace(
                env_state=rows, obs=fp.observe(rows, key=k_obs), key=key
            )
            return state, roll

        def gae(roll, last_val):
            """Reversed scan (ppo_utils.py:428-456)."""
            rews = roll["rew"] + cfg.gamma * roll["terminal_v"]
            vals = jnp.concatenate([roll["v"], last_val[None]], 0)

            def body(carry, xs):
                ret, adv = carry
                rew, mask, v, v_next = xs
                ret = rew + cfg.gamma * mask * ret
                if cfg.use_gae:
                    td = rew + cfg.gamma * mask * v_next - v
                    adv = adv * cfg.gae_lambda * cfg.gamma * mask + td
                else:
                    adv = ret - v
                return (ret, adv), (ret, adv)

            (_, _), (rets, advs) = jax.lax.scan(
                body,
                (last_val, jnp.zeros_like(last_val)),
                (rews, roll["mask"], roll["v"], vals[1:]),
                reverse=True,
            )
            return rets, advs

        def update(state: PPOState, batch_all):
            N = B * T
            n_mini = max(N // cfg.mini_batch_size, 1)
            flat = jax.tree.map(lambda x: x.reshape((N,) + x.shape[2:]), batch_all)

            # Pack every per-sample field into ONE (N, F) matrix so each
            # minibatch costs a single row-gather.  TPU row-gathers are
            # overhead-bound per launched gather, not per byte: the unpacked
            # tree cost 5 gather fusions x ~500 us per minibatch — ~100 ms of
            # a 117 ms train step at B=4096 (see docs/PERF.md).
            fields = ("obs", "act", "v", "logp", "ret", "adv")  # all the update reads
            widths = []
            cols = []
            for f in fields:
                arr = flat[f]
                arr2 = arr[:, None] if arr.ndim == 1 else arr
                widths.append(arr2.shape[1])
                cols.append(arr2.astype(jnp.float32))
            packed = jnp.concatenate(cols, axis=1)
            offsets = np.concatenate([[0], np.cumsum(widths)])

            def unpack(rows):
                mb = {}
                for f, s, e in zip(fields, offsets[:-1], offsets[1:]):
                    col = rows[:, int(s):int(e)]
                    mb[f] = col[:, 0] if flat[f].ndim == 1 else col
                return mb

            H = cfg.hidden_dim
            act_dim = self.actor.output_dim

            def fused_losses(ap, logstd, cp, mb):
                """Both losses through ONE 2H-wide forward (see PPOConfig.
                fused_update).  The hidden block-diagonal carries no
                cross-terms, so d/d(ap) and d/d(cp) equal the separate-net
                gradients exactly; losses are additive over disjoint
                params, so one value_and_grad recovers both updates."""
                from safe_control_gym_tpu.models.networks import get_activation

                a, c = ap["params"], cp["params"]
                zz = jnp.zeros((H, H), jnp.float32)
                W1 = jnp.concatenate(
                    [a["Dense_0"]["kernel"], c["Dense_0"]["kernel"]], 1)
                b1 = jnp.concatenate([a["Dense_0"]["bias"], c["Dense_0"]["bias"]])
                W2 = jnp.block([[a["Dense_1"]["kernel"], zz],
                                [zz, c["Dense_1"]["kernel"]]])
                b2 = jnp.concatenate([a["Dense_1"]["bias"], c["Dense_1"]["bias"]])
                W3 = jnp.block(
                    [[a["Dense_2"]["kernel"], jnp.zeros((H, 1), jnp.float32)],
                     [jnp.zeros((H, act_dim), jnp.float32),
                      c["Dense_2"]["kernel"]]])
                b3 = jnp.concatenate([a["Dense_2"]["bias"], c["Dense_2"]["bias"]])
                act = get_activation(cfg.activation)
                h = act(mb["obs"] @ W1 + b1)
                h = act(h @ W2 + b2)
                out = h @ W3 + b3
                mean, v_cur = out[:, :act_dim], out[:, act_dim]

                dist = Normal(mean, jnp.exp(logstd))
                logp = dist.log_prob(mb["act"])
                ratio = jnp.exp(logp - mb["logp"])
                clip_adv = (
                    jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param)
                    * mb["adv"]
                )
                policy_loss = -jnp.minimum(ratio * mb["adv"], clip_adv).mean()
                entropy_loss = -dist.entropy().mean()
                approx_kl = (mb["logp"] - logp).mean()

                if cfg.use_clipped_value:
                    v_old_c = mb["v"] + jnp.clip(
                        v_cur - mb["v"], -cfg.clip_param, cfg.clip_param
                    )
                    v_loss = 0.5 * jnp.maximum(
                        (v_cur - mb["ret"]) ** 2, (v_old_c - mb["ret"]) ** 2
                    ).mean()
                else:
                    v_loss = 0.5 * ((v_cur - mb["ret"]) ** 2).mean()

                total = policy_loss + cfg.entropy_coef * entropy_loss + v_loss
                return total, (policy_loss, entropy_loss, approx_kl, v_loss)

            def minibatch_step_fused(carry, mb_rows):
                ac, aopt, copt = carry
                mb = unpack(mb_rows)
                (_, (p_loss, e_loss, kl, v_loss)), (ga, gl, gc) = (
                    jax.value_and_grad(fused_losses, argnums=(0, 1, 2),
                                       has_aux=True)
                    (ac.actor_params, ac.logstd, ac.critic_params, mb)
                )
                # KL gate (ppo_utils.py:139-144) applies to the ACTOR update
                # only; the critic always steps.
                gate = (cfg.target_kl <= 0) | (kl <= 1.5 * cfg.target_kl)
                ga, gl = jax.tree.map(
                    lambda x: x * gate.astype(x.dtype), (ga, gl))
                updates, aopt2 = self.actor_tx.update(
                    (ga, gl), aopt, (ac.actor_params, ac.logstd))
                new_ap, new_logstd = optax.apply_updates(
                    (ac.actor_params, ac.logstd), updates)
                cupd, copt2 = self.critic_tx.update(gc, copt, ac.critic_params)
                new_cp = optax.apply_updates(ac.critic_params, cupd)
                ac2 = ac.replace(
                    actor_params=new_ap, critic_params=new_cp, logstd=new_logstd
                )
                metrics = jnp.stack([p_loss, v_loss, e_loss, kl])
                return (ac2, aopt2, copt2), metrics

            def minibatch_step_kernel(carry, mb_T):
                """Gradients from the VMEM-resident Pallas kernel
                (parallel/fast_update.py); KL gate, entropy term, and the
                Adam steps stay in XLA (they are parameter-sized)."""
                import math as _math

                ac, aopt, copt = carry
                wops = self._fu.prep_weights(
                    ac.actor_params, ac.critic_params, ac.logstd)
                ga, gc, glogstd, sums = self._fu.grads(mb_T, wops)
                n = cfg.mini_batch_size
                p_loss = -sums[0] / n
                kl = sums[1] / n
                v_loss = 0.5 * sums[2] / n
                # Gaussian entropy depends only on logstd: loss value and
                # gradient are closed-form outside the kernel.
                e_loss = -(jnp.sum(ac.logstd)
                           + 0.5 * act_dim * (1.0 + _math.log(2.0 * _math.pi)))
                glogstd = glogstd - cfg.entropy_coef
                gate = (cfg.target_kl <= 0) | (kl <= 1.5 * cfg.target_kl)
                ga, glogstd = jax.tree.map(
                    lambda x: x * gate.astype(x.dtype), (ga, glogstd))
                updates, aopt2 = self.actor_tx.update(
                    (ga, glogstd), aopt, (ac.actor_params, ac.logstd))
                new_ap, new_logstd = optax.apply_updates(
                    (ac.actor_params, ac.logstd), updates)
                cupd, copt2 = self.critic_tx.update(gc, copt, ac.critic_params)
                new_cp = optax.apply_updates(ac.critic_params, cupd)
                ac2 = ac.replace(
                    actor_params=new_ap, critic_params=new_cp, logstd=new_logstd
                )
                return (ac2, aopt2, copt2), jnp.stack([p_loss, v_loss, e_loss, kl])

            def minibatch_step(carry, mb_rows):
                ac, aopt, copt = carry
                mb = unpack(mb_rows)

                def actor_loss_fn(ap, logstd):
                    dist = self._dist(ac.replace(actor_params=ap, logstd=logstd), mb["obs"])
                    logp = dist.log_prob(mb["act"])
                    ratio = jnp.exp(logp - mb["logp"])
                    clip_adv = (
                        jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * mb["adv"]
                    )
                    policy_loss = -jnp.minimum(ratio * mb["adv"], clip_adv).mean()
                    entropy_loss = -dist.entropy().mean()
                    approx_kl = (mb["logp"] - logp).mean()
                    return policy_loss + cfg.entropy_coef * entropy_loss, (
                        policy_loss,
                        entropy_loss,
                        approx_kl,
                    )

                (loss, (p_loss, e_loss, kl)), grads = jax.value_and_grad(
                    actor_loss_fn, argnums=(0, 1), has_aux=True
                )(ac.actor_params, ac.logstd)
                # KL gate (ppo_utils.py:139-144): skip actor update when the
                # approximate KL exceeds 1.5 * target_kl.
                gate = (cfg.target_kl <= 0) | (kl <= 1.5 * cfg.target_kl)
                g = jax.tree.map(lambda x: x * gate.astype(x.dtype), grads)
                # One Adam group over (MLP params, state-independent logstd),
                # matching the reference's single optimizer over all actor
                # parameters (ppo_utils.py MLPActor + optimizer setup).
                updates, aopt2 = self.actor_tx.update(g, aopt, (ac.actor_params, ac.logstd))
                new_ap, new_logstd = optax.apply_updates((ac.actor_params, ac.logstd), updates)

                def critic_loss_fn(cp):
                    v_cur = self.critic.apply(cp, mb["obs"])[..., 0]
                    if cfg.use_clipped_value:
                        v_old_c = mb["v"] + jnp.clip(
                            v_cur - mb["v"], -cfg.clip_param, cfg.clip_param
                        )
                        v_loss = jnp.maximum(
                            (v_cur - mb["ret"]) ** 2, (v_old_c - mb["ret"]) ** 2
                        )
                        return 0.5 * v_loss.mean()
                    return 0.5 * ((v_cur - mb["ret"]) ** 2).mean()

                v_loss, cgrads = jax.value_and_grad(critic_loss_fn)(ac.critic_params)
                cupd, copt2 = self.critic_tx.update(cgrads, copt, ac.critic_params)
                new_cp = optax.apply_updates(ac.critic_params, cupd)
                ac2 = ac.replace(
                    actor_params=new_ap, critic_params=new_cp, logstd=new_logstd
                )
                metrics = jnp.stack([p_loss, v_loss, e_loss, kl])
                return (ac2, aopt2, copt2), metrics

            keys = jax.random.split(state.key, cfg.opt_epochs + 2)
            if self._fu is not None:
                mb_step = minibatch_step_kernel
            elif cfg.fused_update:
                mb_step = minibatch_step_fused
            else:
                mb_step = minibatch_step

            def to_kernel_layout(mbs):
                """(n_mini, mb, F) -> (n_mini, F, 8, mb/8): batch on lanes,
                one bandwidth-bound transpose per shuffle."""
                if self._fu is None:
                    return mbs
                return mbs.swapaxes(1, 2).reshape(
                    n_mini, mbs.shape[-1], 8, cfg.mini_batch_size // 8)

            if cfg.reshuffle_each_epoch:
                # Reference semantics: fresh permutation per epoch — one
                # packed gather per epoch.
                def epoch_step(carry, key):
                    perm = jax.random.permutation(key, N)
                    shuffled = packed[perm[: n_mini * cfg.mini_batch_size]]
                    mbs = shuffled.reshape(n_mini, cfg.mini_batch_size, -1)
                    carry, metrics = jax.lax.scan(
                        mb_step, carry, to_kernel_layout(mbs))
                    return carry, metrics.mean(0)
            else:
                # One shuffle per train step; epochs sweep the same minibatch
                # blocks in order.  Even a coarse per-epoch block permutation
                # measurably hurts: re-materializing the 24 MB block tensor
                # 10x showed up as ~10 ms of dynamic-update-slices in the
                # device trace (docs/PERF.md).
                #
                # The shuffle itself is BLOCK-granular when shapes allow:
                # permuting 96-byte sample rows costs a launch-overhead-bound
                # row-gather (~1.6 ms) plus a 524k-element sort (~0.6 ms);
                # permuting 256-sample blocks moves the same bytes in
                # bandwidth-efficient 24 KB rows with a 2k-element sort.
                # Sample order within a block is rotation-invariant across
                # epochs, and blocks mix globally — learning equivalence is
                # covered by benchmarks/rl_equivalence.py.
                take = n_mini * cfg.mini_batch_size
                BLK = 256
                if take == N and N % BLK == 0 and cfg.mini_batch_size % BLK == 0:
                    nb = N // BLK
                    perm = jax.random.permutation(keys[-1], nb)
                    blocks = packed.reshape(nb, -1)[perm].reshape(
                        n_mini, cfg.mini_batch_size, -1
                    )
                else:
                    perm = jax.random.permutation(keys[-1], N)
                    blocks = packed[perm[:take]].reshape(
                        n_mini, cfg.mini_batch_size, -1
                    )
                blocks = to_kernel_layout(blocks)

                def epoch_step(carry, key):
                    del key
                    carry, metrics = jax.lax.scan(mb_step, carry, blocks)
                    return carry, metrics.mean(0)

            (ac, aopt, copt), metrics = jax.lax.scan(
                epoch_step, (state.ac, state.actor_opt, state.critic_opt), keys[1:-1]
            )
            state = state.replace(
                ac=ac, actor_opt=aopt, critic_opt=copt, key=keys[0]
            )
            m = metrics.mean(0)
            return state, {
                "policy_loss": m[0],
                "value_loss": m[1],
                "entropy_loss": m[2],
                "approx_kl": m[3],
            }

        def train_step(state: PPOState):
            state, roll = (collect_fast if self._fp is not None else collect)(state)
            last_val = self._value(state.ac, state.obs)
            rets, advs = gae(roll, last_val)
            advs = (advs - advs.mean()) / (advs.std() + 1e-6)
            batch = {**roll, "ret": rets, "adv": advs}
            state, metrics = update(state, batch)
            state = state.replace(total_steps=state.total_steps + B * T)
            return state, metrics

        return train_step

    # -- reference API --------------------------------------------------------
    def learn(self, max_env_steps: Optional[int] = None, log_fn=None, **kwargs):
        steps_target = max_env_steps or self.cfg.max_env_steps
        per_iter = self.cfg.rollout_batch_size * self.cfg.rollout_steps
        n_iters = max(steps_target // per_iter, 1)
        if log_fn is None:
            # No per-iteration callback: amortize the dispatch round trip.
            return jax.device_get(self._learn_chunked(n_iters))
        metrics = {}
        for i in range(n_iters):
            self.state, metrics = self._train_step(self.state)
            log_fn(int(jax.device_get(self.state.total_steps)), jax.device_get(metrics))
        return jax.device_get(metrics)

    def select_action(self, obs, info=None):
        obs = jnp.asarray(obs)
        if self.cfg.norm_obs:
            obs, _ = self.state.obs_norm(obs, update=False)
        return np.asarray(self._dist(self.state.ac, obs).mode())

    def _policy(self, obs):
        if self.cfg.norm_obs:
            obs, _ = self.state.obs_norm(obs, update=False)
        return self._dist(self.state.ac, obs).mode()
