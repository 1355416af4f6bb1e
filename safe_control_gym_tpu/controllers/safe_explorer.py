"""Safe Explorer PPO (Dalal 2018 safety layer).

TPU-native counterpart of the reference's SafeExplorerPPO
(safe_control_gym/controllers/safe_explorer/): per-constraint linear models
c_{t+1} ~ c_t + g_w(s)' a fitted in a pretrain stage from random-action
transitions (safe_ppo.py:281-301, 435-462), then a closed-form action
projection applied inside the policy's act (SafetyLayer.get_safe_action,
safe_explorer_utils.py:141-197):

    lambda_i* = max(0, (g_i' a + c_i + margin_i) / (g_i' g_i))
    a_safe    = a - lambda_{i*} g_{i*}   (most-violating constraint only)

Both the pretraining regression and the projection are pure-JAX; the
projection plugs into PPO's ``action_filter_fn`` hook, so rollout + safety
filtering + learning all fuse into one jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.envs.constraints import build_constraints
from safe_control_gym_tpu.models.networks import MLP


class SafetyLayer:
    """Per-constraint linear sensitivity models g_w(s)."""

    def __init__(self, obs_dim, act_dim, num_constraints, hidden_dim=64, lr=1e-3, seed=0):
        self.num_constraints = num_constraints
        self.act_dim = act_dim
        # One MLP per constraint (reference builds a module list,
        # safe_explorer_utils.py:60-80); fused here as one MLP with
        # (nc * nu) outputs.
        self.net = MLP(num_constraints * act_dim, (hidden_dim, hidden_dim), act="relu")
        self.params = self.net.init(jax.random.key(seed), jnp.zeros((1, obs_dim)))
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)

    def g(self, params, obs):
        out = self.net.apply(params, obs)
        return out.reshape(obs.shape[:-1] + (self.num_constraints, self.act_dim))

    def get_safe_action(self, params, obs, act, c, margin=0.0):
        """Closed-form projection (safe_explorer_utils.py:141-197)."""
        g = self.g(params, obs)  # (..., nc, nu)
        numer = (g * act[..., None, :]).sum(-1) + c + margin  # (..., nc)
        denom = (g * g).sum(-1) + 1e-8
        lam = jnp.maximum(0.0, numer / denom)
        worst = jnp.argmax(lam, axis=-1)
        lam_star = jnp.take_along_axis(lam, worst[..., None], -1)
        g_star = jnp.take_along_axis(g, worst[..., None, None], -2)[..., 0, :]
        return act - lam_star * g_star

    def pretrain(self, vec_env, constraints, steps=200, batch_envs=None, seed=0):
        """Random-action data collection + regression of delta-c on a
        (reference pretrain loop, safe_ppo.py:281-301)."""
        key = jax.random.key(seed)
        state, obs, _ = jax.jit(vec_env.reset)(key)
        B = obs.shape[0]
        act_dim = self.act_dim
        data_obs, data_act, data_dc, data_c = [], [], [], []
        step = jax.jit(vec_env.step)
        prev_c = None
        prev_obs = None
        prev_act = None
        for i in range(steps):
            k = jax.random.fold_in(key, i)
            act = jax.random.uniform(k, (B, act_dim), minval=-1.0, maxval=1.0)
            state, obs2, rew, done, info = step(state, act)
            c = info["constraint_values"]
            if prev_c is not None:
                keep = ~np.asarray(done)  # drop transitions across resets
                data_obs.append(np.asarray(prev_obs))
                data_act.append(np.asarray(prev_act))
                data_dc.append(np.asarray(c - prev_c))
                data_c.append(np.asarray(keep))
            prev_c, prev_obs, prev_act = c, obs, act
            obs = obs2
        X = jnp.asarray(np.concatenate(data_obs))
        A = jnp.asarray(np.concatenate(data_act))
        DC = jnp.asarray(np.concatenate(data_dc))
        W = jnp.asarray(np.concatenate(data_c), jnp.float32)

        @jax.jit
        def train_epoch(params, opt_state):
            def loss_fn(p):
                g = self.g(p, X)  # (N, nc, nu)
                pred = (g * A[:, None, :]).sum(-1)  # (N, nc)
                return (W[:, None] * (pred - DC) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        loss = None
        for _ in range(100):
            self.params, self.opt_state, loss = train_epoch(self.params, self.opt_state)
        return float(loss)


class SafeExplorerPPO(PPO):
    """PPO + pretrained safety-layer projection (reference safe_ppo.py)."""

    def __init__(self, env, seed: int = 0, constraint_margin: float = 0.0,
                 pretrain_steps: int = 200, **kwargs):
        cc = build_constraints(env.config.constraints, env.spaces)
        if cc is None:
            raise ValueError("SafeExplorerPPO requires env constraints.")
        self._cc = cc
        obs_dim, act_dim = env.spaces.obs_dim, env.spaces.action_dim
        self.safety_layer = SafetyLayer(obs_dim, act_dim, cc.num_constraints, seed=seed)
        self.constraint_margin = constraint_margin
        self._pretrain_steps = pretrain_steps
        nx = env.spaces.state_dim

        def filter_fn(obs, act):
            x = obs[..., :nx]
            c = cc.get_values_raw(x, act)
            return self.safety_layer.get_safe_action(
                self.safety_layer.params, obs, act, c, constraint_margin
            )

        super().__init__(env, seed=seed, action_filter_fn=filter_fn, **kwargs)

    def pretrain(self):
        loss = self.safety_layer.pretrain(
            self.vec, self._cc, steps=self._pretrain_steps, seed=self.seed
        )
        # Re-trace the train step so the filter closes over trained params
        # (they are baked in as constants at trace time); the chunked
        # train_many cache scans _train_step_fn, so refresh both and drop
        # any chunks traced against the stale step.
        self._train_step_fn = self._make_train_step()
        self._train_step = jax.jit(self._train_step_fn)
        self._train_many_cache = {}
        return {"pretrain_loss": loss}

    def learn(self, max_env_steps=None, **kwargs):
        self.pretrain()
        return super().learn(max_env_steps=max_env_steps, **kwargs)
