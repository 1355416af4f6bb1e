"""DDPG — deterministic off-policy twin of SAC.

TPU-native counterpart of the reference's DDPG
(safe_control_gym/controllers/ddpg/ddpg.py + ddpg_utils.py): deterministic
tanh actor, single Q critic, target actor+critic with soft update tau,
exploration via an OU/Gaussian action-noise process
(make_action_noise_process, ddpg_utils.py:228-239), warm-up random actions,
truncation-aware replay like SAC.
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
from safe_control_gym_tpu.models.random_processes import (
    GaussianNoise,
    OrnsteinUhlenbeckNoise,
    make_action_noise_process,
)
from safe_control_gym_tpu.parallel import make_vec_env


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    """Defaults mirror the reference's ddpg.yaml."""

    hidden_dim: int = 256
    activation: str = "relu"
    gamma: float = 0.99
    tau: float = 0.005
    train_interval: int = 100
    train_batch_size: int = 64
    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    max_env_steps: int = 1_000_000
    warm_up_steps: int = 10_000
    rollout_batch_size: int = 4
    max_buffer_size: int = 1_000_000
    random_process: Optional[dict] = None
    updates_per_step: int = 1


class DDPGState(struct.PyTreeNode):
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    noise: Any
    buffer: ReplayBuffer
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    total_steps: jnp.ndarray


class DDPG(BaseController):
    def __init__(self, env, seed: int = 0, **kwargs):
        super().__init__(env, seed=seed)
        known = {f.name for f in dataclasses.fields(DDPGConfig)}
        self.cfg = DDPGConfig(**{k: v for k, v in kwargs.items() if k in known})
        cfg = self.cfg
        self.vec = make_vec_env(env, cfg.rollout_batch_size)
        obs_dim, act_dim = env.spaces.obs_dim, env.spaces.action_dim
        self.act_lo = np.asarray(env.spaces.action_low, np.float32)
        self.act_hi = np.asarray(env.spaces.action_high, np.float32)
        self.actor = MLP(act_dim, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation, out_act="tanh")
        self.critic = MLP(1, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        noise = make_action_noise_process(
            cfg.random_process or {"func": "ou", "sigma": 0.2},
            (cfg.rollout_batch_size, act_dim),
        )

        key = jax.random.key(seed)
        ka, kc, kr, kcarry = jax.random.split(key, 4)
        dummy_o = jnp.zeros((1, obs_dim))
        dummy_oa = jnp.zeros((1, obs_dim + act_dim))
        actor_params = self.actor.init(ka, dummy_o)
        critic_params = self.critic.init(kc, dummy_oa)
        env_state, obs, _ = jax.jit(self.vec.reset)(kr)
        buffer = ReplayBuffer.create(
            cfg.max_buffer_size,
            {"obs": (obs_dim,), "act": (act_dim,), "rew": (), "next_obs": (obs_dim,), "mask": ()},
        )
        self.state = DDPGState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=jax.tree.map(lambda x: x, actor_params),
            target_critic_params=jax.tree.map(lambda x: x, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            noise=noise,
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

    def _q(self, params, obs, act):
        return self.critic.apply(params, jnp.concatenate([obs, act], -1))[..., 0]

    def _make_train_step(self):
        cfg = self.cfg
        B = cfg.rollout_batch_size
        vec = self.vec

        def env_steps(state: DDPGState, n):
            def body(st, _):
                key, k_noise, k_warm = jax.random.split(st.key, 3)
                a_det = self.actor.apply(st.actor_params, st.obs)
                eps, noise = st.noise.sample(k_noise, a_det.shape)
                a_pol = jnp.clip(a_det + eps, -1.0, 1.0)
                a_rand = jax.random.uniform(k_warm, a_det.shape, a_det.dtype, -1.0, 1.0)
                a = jnp.where(st.total_steps < cfg.warm_up_steps, a_rand, a_pol)
                env_state, obs, rew, done, info = vec.step(st.env_state, self._to_box(a))
                truncated = info["TimeLimit.truncated"]
                next_obs = jnp.where(done[:, None], info["terminal_observation"], obs)
                mask = jnp.where(done & ~truncated, 0.0, 1.0)
                buf = st.buffer.push(
                    {"obs": st.obs, "act": a, "rew": rew, "next_obs": next_obs, "mask": mask}
                )
                st = st.replace(
                    env_state=env_state, obs=obs, key=key, noise=noise,
                    buffer=buf, total_steps=st.total_steps + B,
                )
                return st, None

            state, _ = jax.lax.scan(body, state, None, length=n)
            return state

        def update(state: DDPGState):
            key, k_samp = jax.random.split(state.key)
            batch = state.buffer.sample(k_samp, cfg.train_batch_size)
            a_next = self.actor.apply(state.target_actor_params, batch["next_obs"])
            target_q = batch["rew"] + cfg.gamma * batch["mask"] * self._q(
                state.target_critic_params, batch["next_obs"], a_next
            )
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss_fn(cp):
                q = self._q(cp, batch["obs"], batch["act"])
                return ((q - target_q) ** 2).mean()

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
            c_upd, c_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
            critic_params = optax.apply_updates(state.critic_params, c_upd)

            def actor_loss_fn(ap):
                a = self.actor.apply(ap, batch["obs"])
                return -self._q(critic_params, batch["obs"], a).mean()

            a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
            a_upd, a_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
            actor_params = optax.apply_updates(state.actor_params, a_upd)

            soft = lambda t, s: jax.tree.map(
                lambda a_, b_: (1 - cfg.tau) * a_ + cfg.tau * b_, t, s
            )
            state = state.replace(
                actor_params=actor_params,
                critic_params=critic_params,
                target_actor_params=soft(state.target_actor_params, actor_params),
                target_critic_params=soft(state.target_critic_params, critic_params),
                actor_opt=a_opt,
                critic_opt=c_opt,
                key=key,
            )
            return state, {"critic_loss": c_loss, "actor_loss": a_loss}

        def train_step(state: DDPGState):
            state = env_steps(state, cfg.train_interval // B)
            metrics = {}
            for _ in range(cfg.updates_per_step):
                state, metrics = update(state)
            return state, metrics

        return train_step

    def learn(self, max_env_steps: Optional[int] = None, **kwargs):
        steps_target = max_env_steps or self.cfg.max_env_steps
        n_iters = max(steps_target // self.cfg.train_interval, 1)
        return jax.device_get(self._learn_chunked(n_iters))

    def select_action(self, obs, info=None):
        return np.asarray(self._to_box(self.actor.apply(self.state.actor_params, jnp.asarray(obs))))

    def _policy(self, obs):
        return self._to_box(self.actor.apply(self.state.actor_params, obs))
