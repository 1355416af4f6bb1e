"""RARL: Robust Adversarial Reinforcement Learning.

TPU-native counterpart of the reference's RARL
(safe_control_gym/controllers/rarl/rarl.py): a protagonist PPO agent and an
adversary PPO agent acting through the env's adversary-disturbance channel
(env.set_adversary_control, benchmark_env.py:256-266), trained in
alternating phases (rarl.py:340-460).  The adversary maximizes the negative
task reward.

Where the reference pushes adversary actions through a vec-env RPC
(``env.env_method('set_adversary_control', ...)``), here the adversary
injection is a pure function on the env-state PyTree, so the two-agent
rollout is one jitted scan.
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
from safe_control_gym_tpu.parallel import make_vec_env


@dataclasses.dataclass(frozen=True)
class RARLConfig:
    hidden_dim: int = 64
    activation: str = "tanh"
    gamma: float = 0.99
    use_gae: bool = True
    gae_lambda: float = 0.95
    clip_param: float = 0.2
    target_kl: float = 0.01
    entropy_coef: float = 0.01
    opt_epochs: int = 10
    mini_batch_size: int = 64
    actor_lr: float = 3e-4
    critic_lr: float = 1e-3
    max_env_steps: int = 1_000_000
    rollout_batch_size: int = 4
    rollout_steps: int = 100
    # Alternation cadence (reference rarl.yaml).
    num_adv_iters: int = 1
    num_pro_iters: int = 1
    num_adversaries: int = 1  # >1 => RAP population


class Agent(struct.PyTreeNode):
    actor_params: Any
    critic_params: Any
    logstd: jnp.ndarray
    actor_opt: Any
    critic_opt: Any


class RARLState(struct.PyTreeNode):
    pro: Agent
    adv: Agent  # leaves have a leading population axis when num_adversaries > 1
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    total_steps: jnp.ndarray


class RARL(BaseController):
    def __init__(self, env, seed: int = 0, **kwargs):
        super().__init__(env, seed=seed)
        if env.config.adversary_disturbance is None:
            raise ValueError("RARL requires env adversary_disturbance to be set.")
        known = {f.name for f in dataclasses.fields(RARLConfig)}
        self.cfg = RARLConfig(**{k: v for k, v in kwargs.items() if k in known})
        cfg = self.cfg
        self.vec = make_vec_env(env, cfg.rollout_batch_size)
        self.set_adv = env.extras["set_adversary_control"]
        obs_dim = env.spaces.obs_dim
        act_dim = env.spaces.action_dim
        # Adversary acts in [-1, 1]^dim of its channel (benchmark_env.py:328).
        adv_dim = {
            "action": act_dim,
            "dynamics": int(env.config.quad_type) if hasattr(env.config, "quad_type") else 1,
        }[env.config.adversary_disturbance]
        self.adv_dim = adv_dim
        self.actor = MLP(act_dim, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation, out_gain=0.01)
        self.adv_actor = MLP(adv_dim, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation, out_gain=0.01)
        self.critic = MLP(1, (cfg.hidden_dim, cfg.hidden_dim), act=cfg.activation)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)

        key = jax.random.key(seed)
        ks = jax.random.split(key, 6)
        dummy = jnp.zeros((1, obs_dim))

        def mk_agent(k1, k2, actor_def, adim):
            ap = actor_def.init(k1, dummy)
            cp = self.critic.init(k2, dummy)
            return Agent(
                actor_params=ap,
                critic_params=cp,
                logstd=-0.5 * jnp.ones((adim,)),
                actor_opt=self.actor_tx.init(ap),
                critic_opt=self.critic_tx.init(cp),
            )

        pro = mk_agent(ks[0], ks[1], self.actor, act_dim)
        if cfg.num_adversaries > 1:
            adv_keys = jax.random.split(ks[2], cfg.num_adversaries)
            adv = jax.vmap(lambda k: mk_agent(k, jax.random.fold_in(k, 1), self.adv_actor, adv_dim))(adv_keys)
        else:
            adv = mk_agent(ks[2], ks[3], self.adv_actor, adv_dim)
        env_state, obs, _ = jax.jit(self.vec.reset)(ks[4])
        self.state = RARLState(
            pro=pro, adv=adv, env_state=env_state, obs=obs, key=ks[5],
            total_steps=jnp.zeros((), jnp.int32),
        )
        pro_fn = self._make_phase(update_adversary=False)
        adv_fn = self._make_phase(update_adversary=True)
        # Per-phase entry points (single-phase stepping in tests/analysis).
        self._train_pro = jax.jit(pro_fn)
        self._train_adv = jax.jit(adv_fn)
        # One full protagonist/adversary alternation cycle as a single pure
        # step: learn() then pays one dispatch per cycle (chunkable further
        # via BaseController.train_many) instead of one per phase.
        self._train_step_fn = self._make_cycle(pro_fn, adv_fn)
        self._train_step = jax.jit(self._train_step_fn)

    def _make_cycle(self, pro_fn, adv_fn):
        cfg = self.cfg

        def cycle(state: RARLState):
            metrics = {"kl": jnp.zeros(())}
            for _ in range(cfg.num_pro_iters):
                state, metrics = pro_fn(state)
            for _ in range(cfg.num_adv_iters):
                state, _ = adv_fn(state)
            return state, metrics

        return cycle

    # -- shared PPO machinery ---------------------------------------------------
    def _dist(self, actor_def, agent: Agent, obs):
        mean = actor_def.apply(agent.actor_params, obs)
        return Normal(mean, jnp.exp(agent.logstd))

    def _value(self, agent: Agent, obs):
        return self.critic.apply(agent.critic_params, obs)[..., 0]

    def _pick_adv(self, adv: Agent, key):
        """Sample one adversary from the population (RAP, rap.py:38-470)."""
        if self.cfg.num_adversaries <= 1:
            return adv
        i = jax.random.randint(key, (), 0, self.cfg.num_adversaries)
        return jax.tree.map(lambda x: x[i], adv)

    def _make_phase(self, update_adversary: bool):
        cfg = self.cfg
        B, T = cfg.rollout_batch_size, cfg.rollout_steps
        vec = self.vec

        def collect(state: RARLState, adv_inst: Agent):
            def body(carry, _):
                st = carry
                key, k_p, k_a = jax.random.split(st.key, 3)
                pro_dist = self._dist(self.actor, st.pro, st.obs)
                pro_act = pro_dist.sample(k_p)
                adv_dist = self._dist(self.adv_actor, adv_inst, st.obs)
                adv_act = adv_dist.sample(k_a)
                env_state = jax.vmap(self.set_adv)(st.env_state, adv_act)
                env_state, obs, rew, done, info = vec.step(env_state, pro_act)
                if update_adversary:
                    agent, act, dist = adv_inst, adv_act, adv_dist
                    r = -rew  # adversary maximizes negative task reward
                else:
                    agent, act, dist = st.pro, pro_act, pro_dist
                    r = rew
                v = self._value(agent, st.obs)
                truncated = info["TimeLimit.truncated"]
                tv = jnp.where(
                    truncated, self._value(agent, info["terminal_observation"]), 0.0
                )
                out = {
                    "obs": st.obs, "act": act, "rew": r,
                    "mask": 1.0 - done.astype(r.dtype),
                    "v": v, "logp": dist.log_prob(act), "terminal_v": tv,
                }
                return st.replace(env_state=env_state, obs=obs, key=key), out

            state, roll = jax.lax.scan(body, state, None, length=T)
            return state, roll

        def gae(roll, last_val):
            rews = roll["rew"] + cfg.gamma * roll["terminal_v"]
            vals = jnp.concatenate([roll["v"], last_val[None]], 0)

            def body(carry, xs):
                ret, adv_ = carry
                rew, mask, v, v_next = xs
                ret = rew + cfg.gamma * mask * ret
                td = rew + cfg.gamma * mask * v_next - v
                adv_ = adv_ * cfg.gae_lambda * cfg.gamma * mask + td
                return (ret, adv_), (ret, adv_)

            (_, _), (rets, advs) = jax.lax.scan(
                body, (last_val, jnp.zeros_like(last_val)),
                (rews, roll["mask"], roll["v"], vals[1:]), reverse=True,
            )
            return rets, advs

        actor_def = self.adv_actor if update_adversary else self.actor

        def ppo_update(agent: Agent, batch, key):
            N = B * T
            n_mini = max(N // cfg.mini_batch_size, 1)
            flat = jax.tree.map(lambda x: x.reshape((N,) + x.shape[2:]), batch)

            def minibatch_step(carry, idx):
                ag = carry
                mb = jax.tree.map(lambda x: x[idx], flat)

                def actor_loss_fn(ap, logstd):
                    dist = self._dist(actor_def, ag.replace(actor_params=ap, logstd=logstd), mb["obs"])
                    logp = dist.log_prob(mb["act"])
                    ratio = jnp.exp(logp - mb["logp"])
                    clip_adv = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * mb["adv"]
                    p_loss = -jnp.minimum(ratio * mb["adv"], clip_adv).mean()
                    kl = (mb["logp"] - logp).mean()
                    return p_loss - cfg.entropy_coef * dist.entropy().mean(), kl

                (loss, kl), grads = jax.value_and_grad(actor_loss_fn, argnums=(0, 1), has_aux=True)(
                    ag.actor_params, ag.logstd
                )
                gate = (cfg.target_kl <= 0) | (kl <= 1.5 * cfg.target_kl)
                g = jax.tree.map(lambda x: x * gate.astype(x.dtype), grads)
                upd, aopt = self.actor_tx.update(g[0], ag.actor_opt, ag.actor_params)
                new_ap = optax.apply_updates(ag.actor_params, upd)
                new_logstd = ag.logstd - cfg.actor_lr * g[1]

                def critic_loss_fn(cp):
                    v = self.critic.apply(cp, mb["obs"])[..., 0]
                    return 0.5 * ((v - mb["ret"]) ** 2).mean()

                _, cgrads = jax.value_and_grad(critic_loss_fn)(ag.critic_params)
                cupd, copt = self.critic_tx.update(cgrads, ag.critic_opt, ag.critic_params)
                new_cp = optax.apply_updates(ag.critic_params, cupd)
                return ag.replace(
                    actor_params=new_ap, critic_params=new_cp, logstd=new_logstd,
                    actor_opt=aopt, critic_opt=copt,
                ), kl

            def epoch(ag, k):
                perm = jax.random.permutation(k, N)[: n_mini * cfg.mini_batch_size]
                idxs = perm.reshape(n_mini, cfg.mini_batch_size)
                ag, kls = jax.lax.scan(minibatch_step, ag, idxs)
                return ag, kls.mean()

            keys = jax.random.split(key, cfg.opt_epochs)
            agent, kls = jax.lax.scan(epoch, agent, keys)
            return agent, kls.mean()

        def phase(state: RARLState):
            key, k_pick, k_upd = jax.random.split(state.key, 3)
            state = state.replace(key=key)
            adv_inst = self._pick_adv(state.adv, k_pick)
            state, roll = collect(state, adv_inst)
            agent = adv_inst if update_adversary else state.pro
            last_val = self._value(agent, state.obs)
            rets, advs = gae(roll, last_val)
            advs = (advs - advs.mean()) / (advs.std() + 1e-6)
            batch = {**roll, "ret": rets, "adv": advs}
            new_agent, kl = ppo_update(agent, batch, k_upd)
            if update_adversary:
                if cfg.num_adversaries > 1:
                    i = jax.random.randint(k_pick, (), 0, cfg.num_adversaries)
                    adv_pop = jax.tree.map(
                        lambda pop, new: pop.at[i].set(new), state.adv, new_agent
                    )
                    state = state.replace(adv=adv_pop)
                else:
                    state = state.replace(adv=new_agent)
            else:
                state = state.replace(pro=new_agent)
            state = state.replace(total_steps=state.total_steps + B * T)
            return state, {"kl": kl}

        return phase

    def learn(self, max_env_steps: Optional[int] = None, **kwargs):
        cfg = self.cfg
        steps_target = max_env_steps or cfg.max_env_steps
        per_cycle = (cfg.num_pro_iters + cfg.num_adv_iters) * cfg.rollout_batch_size * cfg.rollout_steps
        n_cycles = max(steps_target // per_cycle, 1)
        return jax.device_get(self._learn_chunked(n_cycles, chunk=4))

    def select_action(self, obs, info=None):
        mean = self.actor.apply(self.state.pro.actor_params, jnp.asarray(obs))
        return np.asarray(mean)

    def _policy(self, obs):
        return self.actor.apply(self.state.pro.actor_params, obs)


class RAP(RARL):
    """RARL with a *population* of adversaries, one sampled per phase
    (reference rap.py:38-470)."""

    def __init__(self, env, seed: int = 0, num_adversaries: int = 3, **kwargs):
        super().__init__(env, seed=seed, num_adversaries=num_adversaries, **kwargs)
