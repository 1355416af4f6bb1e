"""iLQR controller.

TPU-native counterpart of the reference's iLQR
(safe_control_gym/controllers/lqr/ilqr.py).  Semantics preserved:

  * initial policy = LQR gain at the goal (ilqr.py:472-514);
  * forward rollout with per-step feedback gains + feedforward;
  * backward pass on the RK4-discretized linearization with the
    eigenvalue-clipped, lambda-regularized Quu inverse (ilqr.py:443-452);
  * lambda adaptation: decrease by lamb_factor on cost improvement,
    increase otherwise, terminate at max_lamb or small relative
    improvement (ilqr.py:260-370 outer loop).

Where the reference steps the PyBullet env once per step per iteration and
linearizes with CasADi on the host, here one iLQR *iteration* (forward scan +
reversed backward scan with batched jacfwd linearization) is a single jitted
program, and the lambda loop runs on host over device-resident carries.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.base import BaseController
from safe_control_gym_tpu.envs.benchmark import Task
from safe_control_gym_tpu.ops.integrators import discretize_linear_system
from safe_control_gym_tpu.ops.linalg import dlqr_gain, get_cost_weight_matrix


class iLQR(BaseController):
    def __init__(
        self,
        env,
        q_lqr=(1.0,),
        r_lqr=(1.0,),
        max_iterations: int = 15,
        lamb_factor: float = 10.0,
        lamb_max: float = 1000.0,
        epsilon: float = 0.01,
        **kwargs,
    ):
        super().__init__(env, **kwargs)
        self.model = env.symbolic
        self.task = Task(env.config.task)
        nx, nu = self.model.nx, self.model.nu
        self.Q = jnp.asarray(get_cost_weight_matrix(list(q_lqr), nx))
        self.R = jnp.asarray(get_cost_weight_matrix(list(r_lqr), nu))
        self.max_iterations = max_iterations
        self.lamb_factor = lamb_factor
        self.lamb_max = lamb_max
        self.epsilon = epsilon
        self.T = env.max_episode_steps
        self.u_0 = jnp.asarray(env.u_goal)
        x_goal = jnp.asarray(env.x_goal)
        if self.task == Task.STABILIZATION:
            self.x_ref = jnp.tile(x_goal[None], (self.T, 1))
        else:
            idx = np.clip(np.arange(self.T), 0, x_goal.shape[0] - 1)
            self.x_ref = x_goal[idx]
        # Gains: (T, nu, nx) feedback + (T, nu) feedforward.
        self.gains_fb = None
        self.input_ff = None
        self._step_i = 0

    # -- pure pieces ----------------------------------------------------------
    def _cost(self, xs, us):
        """Total quadratic cost along a trajectory (model.loss summed)."""
        dx = xs[:-1] - self.x_ref
        du = us - self.u_0
        lx = 0.5 * jnp.einsum("ti,ij,tj->", dx, self.Q, dx)
        lu = 0.5 * jnp.einsum("ti,ij,tj->", du, self.R, du)
        dxT = xs[-1] - self.x_ref[-1]
        return lx + lu + 0.5 * dxT @ self.Q @ dxT

    def _forward(self, x0, gains_fb, input_ff):
        fd = self.model.fd_func

        def body(x, ku):
            K, uff = ku
            u = K @ x + uff
            return fd(x, u), (x, u)

        xT, (xs, us) = jax.lax.scan(body, x0, (gains_fb, input_ff))
        xs = jnp.concatenate([xs, xT[None]], 0)
        return xs, us

    def _backward(self, xs, us, lamb):
        """Reversed scan of the reference's update_policy (ilqr.py:372-471)."""
        model, Q, R = self.model, self.Q, self.R
        # Terminal cost-to-go.
        dxT = xs[-1] - self.x_ref[-1]
        Sv0 = Q @ dxT
        Sm0 = Q

        # Batched linearization along the trajectory (one fused call).
        Ac, Bc = jax.vmap(model.df_func)(xs[:-1], us)
        Ad, Bd = jax.vmap(lambda a, b: discretize_linear_system(a, b, model.dt))(Ac, Bc)

        def body(carry, inp):
            Sv, Sm = carry
            x_k, u_k, A, B, x_goal = inp
            Qv = Q @ (x_k - x_goal)
            Rv = R @ (u_k - self.u_0)
            g = Rv + B.T @ Sv
            G = B.T @ (Sm @ A)
            H = R + B.T @ (Sm @ B)
            H = 0.5 * (H + H.T)
            # Eigenvalue clipping + lambda regularization (ilqr.py:443-448).
            w, V = jnp.linalg.eigh(H)
            w = jnp.maximum(w, 0.0) + lamb
            H_inv = (V * (1.0 / w)) @ V.T
            duff = -H_inv @ g
            K = -H_inv @ G
            uff = u_k + duff - K @ x_k
            Sm_n = Q + A.T @ (Sm @ A) + K.T @ (H @ K) + K.T @ G + G.T @ K
            Sv_n = Qv + A.T @ Sv + K.T @ (H @ duff) + K.T @ g + G.T @ duff
            return (Sv_n, Sm_n), (K, uff)

        (_, _), (Ks, uffs) = jax.lax.scan(
            body, (Sv0, Sm0), (xs[:-1], us, Ad, Bd, self.x_ref), reverse=True
        )
        return Ks, uffs

    # -- reference API --------------------------------------------------------
    def learn(self, **kwargs):
        """Run the iLQR iterations (reference run_ilqr, ilqr.py:150-370)."""
        model = self.model
        nx, nu = model.nx, model.nu
        # Initial state: the env's deterministic initial state (nominal).
        state, obs, _ = jax.jit(self.env.reset)(jax.random.key(self.seed))
        x0 = jnp.asarray(state.x[: nx])

        # Iteration 0: LQR gains at the (first) goal (ilqr.py:484-501).
        def lqr_gain(x_g):
            A, B = model.df_func(x_g, self.u_0)
            Ad, Bd = discretize_linear_system(A, B, model.dt)
            K, _ = dlqr_gain(Ad, Bd, self.Q, self.R)
            return K

        K0 = jax.vmap(lqr_gain)(self.x_ref)
        gains_fb = -K0
        input_ff = jnp.einsum("tij,tj->ti", K0, self.x_ref) + self.u_0

        fwd = jax.jit(self._forward)
        bwd = jax.jit(self._backward)
        cost = jax.jit(self._cost)

        xs, us = fwd(x0, gains_fb, input_ff)
        prev_cost = float(cost(xs, us))
        lamb = 1.0
        for ite in range(self.max_iterations):
            Ks, uffs = bwd(xs, us, jnp.asarray(lamb))
            xs_new, us_new = fwd(x0, Ks, uffs)
            new_cost = float(cost(xs_new, us_new))
            if not np.isfinite(new_cost):
                lamb *= self.lamb_factor
                if lamb > self.lamb_max:
                    break
                continue
            if new_cost < prev_cost:
                gains_fb, input_ff = Ks, uffs
                xs, us = xs_new, us_new
                improvement = (prev_cost - new_cost) / max(abs(prev_cost), 1e-12)
                prev_cost = new_cost
                lamb = max(lamb / self.lamb_factor, 1e-6)
                if improvement < self.epsilon:
                    break
            else:
                lamb *= self.lamb_factor
                if lamb > self.lamb_max:
                    break
        self.gains_fb = gains_fb
        self.input_ff = input_ff
        self.final_cost = prev_cost
        return {"cost": prev_cost}

    def select_action(self, obs, info=None):
        if self.gains_fb is None:
            self.learn()
        k = min(self._step_i, self.T - 1)
        a = np.asarray(self.gains_fb[k] @ jnp.asarray(obs)[: self.model.nx] + self.input_ff[k])
        self._step_i += 1
        return a

    def reset(self):
        self._step_i = 0
