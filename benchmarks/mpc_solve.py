"""MPC per-solve latency and batched-solve throughput.

The reference records IPOPT wall time per solve (reference mpc.py:318,
``results_dict['t_wall']`` — typically tens of ms per solve on CPU, one
problem at a time).  The TPU-native MPC is a fixed-iteration AL-iLQR scan:
one solve is a single device program, and ``solve_batch`` runs thousands of
independent MPC instances in lockstep under vmap — a capability with no
reference analogue.

Usage: python benchmarks/mpc_solve.py [--batch 1024] [--horizon 20]
Prints one JSON line per measurement.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.mpc import MPC
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor


def main(batch=1024, horizon=20, iters=8):
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2, ctrl_freq=50, pyb_freq=50, episode_len_sec=5,
            task="stabilization",
            task_info={"stabilization_goal": [0.5, 1.0],
                       "stabilization_goal_tolerance": 0.05},
            cost="quadratic",
            constraints=(
                {"constraint_form": "default_constraint", "constrained_variable": "input"},
            ),
        )
    )
    mpc = MPC(env, horizon=horizon)
    nx = env.symbolic.nx
    key = jax.random.key(0)
    x0s = 0.2 * jax.random.normal(key, (batch, nx), jnp.float32)

    # Single solve latency.
    one = jax.jit(lambda x: mpc.solve_batch(x[None])[0])
    _ = jax.device_get(one(x0s[0]))
    _ = jax.device_get(one(x0s[1]))
    t0 = time.perf_counter()
    for i in range(iters):
        u = one(x0s[i % batch])
    jax.device_get(u)
    single_ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"metric": "mpc_single_solve_ms", "value": round(single_ms, 3),
                      "unit": "ms/solve", "horizon": horizon}))

    # Batched lockstep solves.
    batched = jax.jit(mpc.solve_batch)
    _ = jax.device_get(batched(x0s))
    _ = jax.device_get(batched(x0s))
    t0 = time.perf_counter()
    for _ in range(iters):
        us = batched(x0s)
    jax.device_get(us)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "mpc_batched_solves_per_sec",
                      "value": round(iters * batch / dt, 1),
                      "unit": "solves/s", "batch": batch, "horizon": horizon}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=20)
    a, _ = p.parse_known_args()
    main(a.batch, a.horizon)
