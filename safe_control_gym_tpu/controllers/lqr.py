"""LQR controller.

TPU-native counterpart of the reference's LQR
(safe_control_gym/controllers/lqr/lqr.py): linearize the env's a-priori model
at the goal (jax.jacfwd replaces CasADi df_func), discretize, solve the ARE,
u = -K (x - x0) + u0 (lqr.py:164-202).  For trajectory tracking the reference
re-solves the Riccati equation *per step on the host* (lqr.py:176-181); here
all waypoint gains are solved in one vmapped batch at build time and the
controller is a pure gain-table lookup — jittable inside rollout scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.envs.benchmark import Task
from safe_control_gym_tpu.ops.integrators import discretize_linear_system
from safe_control_gym_tpu.ops.linalg import clqr_gain, dlqr_gain, get_cost_weight_matrix


class LQR(BaseController):
    def __init__(
        self,
        env,
        q_lqr=(1.0,),
        r_lqr=(1.0,),
        discrete_dynamics: bool = True,
        **kwargs,
    ):
        super().__init__(env, **kwargs)
        model = env.symbolic
        self.model = model
        self.Q = jnp.asarray(get_cost_weight_matrix(list(q_lqr), model.nx))
        self.R = jnp.asarray(get_cost_weight_matrix(list(r_lqr), model.nu))
        self.discrete_dynamics = discrete_dynamics
        self.task = Task(env.config.task)
        self.u_0 = jnp.asarray(env.u_goal, jnp.float32)
        self.x_0 = jnp.asarray(env.x_goal, jnp.float32)

        def gain_at(x0, u0):
            A, B = model.df_func(x0, u0)
            Qm, Rm = self.Q.astype(A.dtype), self.R.astype(A.dtype)
            if discrete_dynamics:
                Ad, Bd = discretize_linear_system(A, B, model.dt)
                K, _ = dlqr_gain(Ad, Bd, Qm, Rm)
            else:
                K, _ = clqr_gain(A, B, Qm, Rm)
            return K

        if self.task == Task.STABILIZATION:
            self.gain = jax.jit(gain_at)(self.x_0, self.u_0)
        else:
            # One Riccati solve per waypoint, batched (lqr.py:176-181 resolves
            # serially per step; vmap does the whole table at once).
            self.gain = jax.jit(jax.vmap(lambda x0: gain_at(x0, self.u_0)))(self.x_0)
        self.gain = jnp.asarray(self.gain, jnp.float32)
        self._step_i = 0

    def reset(self):
        self._step_i = 0

    def select_action(self, obs, info=None):
        a = np.asarray(self._policy_at(jnp.asarray(obs), self._step_i))
        self._step_i += 1
        return a

    def _policy_at(self, x, k):
        if self.task == Task.STABILIZATION:
            return -self.gain @ (x - self.x_0) + self.u_0
        k = jnp.clip(k, 0, self.x_0.shape[0] - 1)
        return -self.gain[k] @ (x - self.x_0[k]) + self.u_0

    def _policy(self, obs):
        # Time-invariant view for the shared run() helper (stabilization);
        # tracking eval uses run_tracking below.
        return self._policy_at(obs, 0)

    def run_tracking(self, num_episodes: int = 1, seed: int = 0):
        """Batched tracking eval with the time-indexed gain table."""
        from safe_control_gym_tpu.parallel import make_vec_env

        env = self.env
        B = num_episodes
        vec = make_vec_env(env, B, auto_reset=False)
        state, obs, _ = jax.jit(vec.reset)(jax.random.key(seed))
        T = env.max_episode_steps

        def body(carry, k):
            s, o = carry
            a = jax.vmap(lambda oo: self._policy_at(oo, k))(o)
            s, o, r, d, info = vec.step_no_reset(s, a)
            return (s, o), {"reward": r, "mse": info["mse"]}

        (_, _), traj = jax.lax.scan(body, (state, obs), jnp.arange(T))
        traj = jax.device_get(traj)
        return {
            "ep_returns": traj["reward"].sum(0),
            "rmse": np.sqrt(traj["mse"].mean(0)),
        }
