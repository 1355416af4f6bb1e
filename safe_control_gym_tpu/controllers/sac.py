"""SAC (soft actor-critic) — fully-jitted, device-resident replay.

TPU-native counterpart of the reference's SAC
(safe_control_gym/controllers/sac/sac.py + sac_utils.py).  Semantics kept:

  * squashed-Gaussian actor: MLP -> (mu, log_std clamped to [-20, 2]),
    reparameterized sample, tanh squash with the stable log-prob correction
    ``logp -= sum(2 (log2 - a - softplus(-2a)))`` (sac_utils.py:173-209);
  * twin Q networks with min-target, target nets with soft update tau
    (sac_utils.py:138-165, 414);
  * optional automatic temperature tuning toward a target entropy
    (-act_dim by default) (sac.py:36-127);
  * warm-up with uniform random actions (sac.py:247-268);
  * truncation-aware transitions: next_obs is the true terminal observation
    and the bootstrap mask stays 1 on time-limit ends (sac_utils buffer
    true_next_obs/true_mask semantics).

One ``train_step`` = train_interval env steps pushed into the HBM ring
buffer + one gradient update, all in a single jitted program.
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
from safe_control_gym_tpu.controllers.buffers import ReplayBuffer
from safe_control_gym_tpu.models.networks import MLP
from safe_control_gym_tpu.parallel import make_vec_env

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Defaults mirror the reference's sac.yaml."""

    hidden_dim: int = 256
    activation: str = "relu"
    gamma: float = 0.99
    tau: float = 0.005
    init_temperature: float = 0.2
    use_entropy_tuning: bool = False
    target_entropy: Optional[float] = None
    train_interval: int = 100
    train_batch_size: int = 64
    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    entropy_lr: float = 1e-3
    max_env_steps: int = 1_000_000
    warm_up_steps: int = 1000
    rollout_batch_size: int = 4
    max_buffer_size: int = 1_000_000
    updates_per_step: int = 1


class SACState(struct.PyTreeNode):
    actor_params: Any
    critic_params: Any  # twin Q in one tree
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    buffer: ReplayBuffer
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    total_steps: jnp.ndarray


class _Actor:
    def __init__(self, obs_dim, act_dim, hidden, act):
        self.net = MLP(2 * act_dim, (hidden, hidden), act=act)
        self.act_dim = act_dim

    def init(self, key, obs):
        return self.net.init(key, obs)

    def dist_params(self, params, obs):
        out = self.net.apply(params, obs)
        mu, log_std = out[..., : self.act_dim], out[..., self.act_dim :]
        return mu, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)

    def sample(self, params, obs, key):
        mu, log_std = self.dist_params(params, obs)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        pre = mu + std * eps
        logp = (-0.5 * ((pre - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
        # Tanh correction (sac_utils.py:200).
        logp -= (2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))).sum(-1)
        return jnp.tanh(pre), logp

    def mode(self, params, obs):
        mu, _ = self.dist_params(params, obs)
        return jnp.tanh(mu)


class _TwinQ:
    def __init__(self, obs_dim, act_dim, hidden, act):
        self.q1 = MLP(1, (hidden, hidden), act=act)
        self.q2 = MLP(1, (hidden, hidden), act=act)

    def init(self, key, obs, act):
        k1, k2 = jax.random.split(key)
        x = jnp.concatenate([obs, act], -1)
        return {"q1": self.q1.init(k1, x), "q2": self.q2.init(k2, x)}

    def apply(self, params, obs, act):
        x = jnp.concatenate([obs, act], -1)
        return self.q1.apply(params["q1"], x)[..., 0], self.q2.apply(params["q2"], x)[..., 0]


class SAC(BaseController):
    def __init__(self, env, seed: int = 0, **kwargs):
        super().__init__(env, seed=seed)
        known = {f.name for f in dataclasses.fields(SACConfig)}
        self.cfg = SACConfig(**{k: v for k, v in kwargs.items() if k in known})
        cfg = self.cfg
        self.vec = make_vec_env(env, cfg.rollout_batch_size)
        obs_dim, act_dim = env.spaces.obs_dim, env.spaces.action_dim
        self.act_dim = act_dim
        # Actions are squashed to [-1, 1] then affinely mapped to the box.
        self.act_lo = np.asarray(env.spaces.action_low, np.float32)
        self.act_hi = np.asarray(env.spaces.action_high, np.float32)
        self.actor = _Actor(obs_dim, act_dim, cfg.hidden_dim, cfg.activation)
        self.critic = _TwinQ(obs_dim, act_dim, cfg.hidden_dim, cfg.activation)
        self.target_entropy = (
            cfg.target_entropy if cfg.target_entropy is not None else -float(act_dim)
        )
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.alpha_tx = optax.adam(cfg.entropy_lr)

        key = jax.random.key(seed)
        ka, kc, kr, kcarry = jax.random.split(key, 4)
        dummy_o = jnp.zeros((1, obs_dim))
        dummy_a = jnp.zeros((1, act_dim))
        actor_params = self.actor.init(ka, dummy_o)
        critic_params = self.critic.init(kc, dummy_o, dummy_a)
        env_state, obs, _ = jax.jit(self.vec.reset)(kr)
        buffer = ReplayBuffer.create(
            cfg.max_buffer_size,
            {"obs": (obs_dim,), "act": (act_dim,), "rew": (), "next_obs": (obs_dim,), "mask": ()},
        )
        self.state = SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(lambda x: x, critic_params),
            log_alpha=jnp.log(jnp.asarray(cfg.init_temperature)),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            buffer=buffer,
            env_state=env_state,
            obs=obs,
            key=kcarry,
            total_steps=jnp.zeros((), jnp.int32),
        )
        self._train_step_fn = self._make_train_step()
        self._train_step = jax.jit(self._train_step_fn)

    def _to_box(self, a):
        return self.act_lo + (a + 1.0) * 0.5 * (self.act_hi - self.act_lo)

    def _make_train_step(self):
        cfg = self.cfg
        B = cfg.rollout_batch_size
        vec = self.vec
        actor, critic = self.actor, self.critic

        def env_steps(state: SACState, n):
            def body(st, _):
                key, k_act, k_warm = jax.random.split(st.key, 3)
                a_pol, _ = actor.sample(st.actor_params, st.obs, k_act)
                a_rand = jax.random.uniform(k_warm, a_pol.shape, a_pol.dtype, -1.0, 1.0)
                a = jnp.where(st.total_steps < cfg.warm_up_steps, a_rand, a_pol)
                env_state, obs, rew, done, info = vec.step(st.env_state, self._to_box(a))
                truncated = info["TimeLimit.truncated"]
                term_obs = info["terminal_observation"]
                # True next obs even across autoreset; mask 0 only on real
                # termination.
                next_obs = jnp.where(done[:, None], term_obs, obs)
                mask = jnp.where(done & ~truncated, 0.0, 1.0)
                buf = st.buffer.push(
                    {"obs": st.obs, "act": a, "rew": rew, "next_obs": next_obs, "mask": mask}
                )
                st = st.replace(
                    env_state=env_state,
                    obs=obs,
                    key=key,
                    buffer=buf,
                    total_steps=st.total_steps + B,
                )
                return st, None

            state, _ = jax.lax.scan(body, state, None, length=n)
            return state

        def update(state: SACState):
            key, k_samp, k_a1, k_a2 = jax.random.split(state.key, 4)
            batch = state.buffer.sample(k_samp, cfg.train_batch_size)
            alpha = jnp.exp(state.log_alpha)

            # Critic loss (sac_utils.py:138-152).
            a_next, logp_next = actor.sample(state.actor_params, batch["next_obs"], k_a1)
            q1_t, q2_t = critic.apply(state.target_critic_params, batch["next_obs"], a_next)
            target_q = batch["rew"] + cfg.gamma * batch["mask"] * (
                jnp.minimum(q1_t, q2_t) - alpha * logp_next
            )
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss_fn(cp):
                q1, q2 = critic.apply(cp, batch["obs"], batch["act"])
                return ((q1 - target_q) ** 2).mean() + ((q2 - target_q) ** 2).mean()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
            c_upd, c_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
            critic_params = optax.apply_updates(state.critic_params, c_upd)

            # Actor loss.
            def actor_loss_fn(ap):
                a, logp = actor.sample(ap, batch["obs"], k_a2)
                q1, q2 = critic.apply(critic_params, batch["obs"], a)
                return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

            (a_loss, logp), a_grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
                state.actor_params
            )
            a_upd, a_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
            actor_params = optax.apply_updates(state.actor_params, a_upd)

            # Temperature (sac.py auto alpha tuning).
            log_alpha, al_opt = state.log_alpha, state.alpha_opt
            if cfg.use_entropy_tuning:
                def alpha_loss_fn(la):
                    return (
                        jnp.exp(la) * jax.lax.stop_gradient(-logp - self.target_entropy)
                    ).mean()

                al_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
                al_upd, al_opt = self.alpha_tx.update(al_grad, state.alpha_opt, log_alpha)
                log_alpha = optax.apply_updates(log_alpha, al_upd)

            # Soft target update (sac_utils.py:414).
            target = jax.tree.map(
                lambda t, s: (1 - cfg.tau) * t + cfg.tau * s,
                state.target_critic_params,
                critic_params,
            )
            state = state.replace(
                actor_params=actor_params,
                critic_params=critic_params,
                target_critic_params=target,
                log_alpha=log_alpha,
                actor_opt=a_opt,
                critic_opt=c_opt,
                alpha_opt=al_opt,
                key=key,
            )
            return state, {"critic_loss": c_loss, "actor_loss": a_loss, "alpha": alpha}

        def train_step(state: SACState):
            state = env_steps(state, cfg.train_interval // B)
            metrics = {}
            for _ in range(cfg.updates_per_step):
                state, metrics = update(state)
            return state, metrics

        return train_step

    def learn(self, max_env_steps: Optional[int] = None, **kwargs):
        steps_target = max_env_steps or self.cfg.max_env_steps
        per_iter = self.cfg.train_interval
        n_iters = max(steps_target // per_iter, 1)
        return jax.device_get(self._learn_chunked(n_iters))

    def select_action(self, obs, info=None):
        a = self.actor.mode(self.state.actor_params, jnp.asarray(obs))
        return np.asarray(self._to_box(a))

    def _policy(self, obs):
        return self._to_box(self.actor.mode(self.state.actor_params, obs))
