"""Multi-device scaling-efficiency harness.

BASELINE metric: >= 90% scaling efficiency at N >= 2 hosts.  On real
multi-chip hardware this script shards the env batch over all available
devices and reports steps/s at each device count; on a single-chip or CPU
machine it uses the virtual-device override to validate the sharded program
(numbers then measure the virtual mesh, not hardware scaling).

Usage: python benchmarks/scaling.py [--envs-per-device 1024] [--steps 256]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_mesh, make_vec_env, shard_batch
from safe_control_gym_tpu.parallel.rollout import (
    EpisodeStats,
    RolloutCarry,
    rollout,
    sharded_rollout_fn,
)


def build_run(n_devices, envs_per_device, steps):
    B = n_devices * envs_per_device
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=6,
            task="traj_tracking",
            task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                       "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                       "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
            randomized_inertial_prop=True,
        )
    )
    vec = make_vec_env(env, B)
    mesh = make_mesh(n_devices)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    carry = RolloutCarry(
        shard_batch(state, mesh), shard_batch(obs, mesh), (),
        shard_batch(EpisodeStats.create(B), mesh),
    )
    hover = float(env.u_goal[0])
    policy = lambda ps, o: (jnp.full((B, 4), hover, o.dtype), ps)

    @jax.jit
    def run(c):
        c, _ = rollout(vec, policy, c, steps, collect=False)
        return c

    return run, carry, B


def main(envs_per_device=1024, steps=256, iters=4):
    n_total = len(jax.devices())
    results = []
    base = None
    n = 1
    while n <= n_total:
        run, carry, B = build_run(n, envs_per_device, steps)
        # Two warmup calls: the first call's output carry carries the
        # shard_map output shardings, which triggers one retrace on the
        # second call; steady state begins at call three.
        carry = run(carry)
        carry = run(carry)
        jax.block_until_ready(carry.obs)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = run(carry)
        jax.block_until_ready(carry.obs)
        dt = time.perf_counter() - t0
        sps = iters * steps * B / dt
        if base is None:
            base = sps
        eff = sps / (base * n)
        results.append({"devices": n, "envs": B, "steps_per_sec": round(sps, 1),
                        "scaling_efficiency": round(eff, 4)})
        print(json.dumps(results[-1]))
        n *= 2
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--envs-per-device", type=int, default=1024)
    p.add_argument("--steps", type=int, default=256)
    a, _ = p.parse_known_args()
    main(a.envs_per_device, a.steps)
