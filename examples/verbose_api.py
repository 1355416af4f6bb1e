"""Verbose API walkthrough.

Counterpart of the reference's tests/scripts/verbose_api.py: builds an env
from a full-featured config (constraints + all three disturbance channels +
randomization), runs a couple of steps, and prints the obs/reward/done/info
structure the API returns.

Usage: python examples/verbose_api.py --task {cartpole,quadrotor}
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

COMMON = dict(
    task="traj_tracking",
    cost="quadratic",
    randomized_init=True,
    randomized_inertial_prop=True,
    done_on_violation=True,
    disturbances={
        "observation": ({"disturbance_func": "white_noise", "std": 0.01},),
        "action": ({"disturbance_func": "impulse", "magnitude": 0.01,
                     "step_offset": 2, "duration": 1},),
        "dynamics": ({"disturbance_func": "white_noise", "std": 0.001},),
    },
)


def main(task="cartpole"):
    if task == "cartpole":
        env = make_cartpole(
            CartPoleConfig(
                ctrl_freq=50, pyb_freq=50, episode_len_sec=10,
                constraints=(
                    {"constraint_form": "default_constraint", "constrained_variable": "input"},
                    {"constraint_form": "default_constraint", "constrained_variable": "state"},
                ),
                **COMMON,
            )
        )
    else:
        env = make_quadrotor(
            QuadrotorConfig(
                quad_type=2, ctrl_freq=60, pyb_freq=240, episode_len_sec=10,
                constraints=(
                    {"constraint_form": "default_constraint", "constrained_variable": "input"},
                    {"constraint_form": "default_constraint", "constrained_variable": "state"},
                ),
                **COMMON,
            )
        )
    print(f"== {task} ==")
    print("state_dim:", env.spaces.state_dim, " action_dim:", env.spaces.action_dim,
          " obs_dim:", env.spaces.obs_dim)
    print("action box:", env.spaces.action_low, env.spaces.action_high)
    state, obs, info = jax.jit(env.reset)(jax.random.key(7))
    print("\nreset -> obs:", np.asarray(obs))
    print("reset info keys:", sorted(info))
    print("symbolic model: nx=%d nu=%d dt=%s" % (env.symbolic.nx, env.symbolic.nu, env.symbolic.dt))
    step = jax.jit(env.step)
    for i in range(2):
        action = jnp.asarray(env.u_goal)
        state, obs, reward, done, info = step(state, action)
        print(f"\nstep {i}: reward={float(reward):.4f} done={bool(done)}")
        print("  obs:", np.asarray(obs))
        for k in sorted(info):
            v = np.asarray(info[k])
            print(f"  info[{k}]: shape={v.shape} value={v if v.size <= 12 else v.ravel()[:6]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="cartpole", choices=["cartpole", "quadrotor"])
    a, _ = p.parse_known_args()
    main(a.task)
