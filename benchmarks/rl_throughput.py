"""Learner-side throughput: full PPO training steps on device.

Measures the complete train step — policy-forward rollout (scan over the
vectorized env, fused Pallas dynamics), GAE, and minibatch SGD epochs — as
one jitted program.  This is the "learner-side DP" path (SURVEY §2.8): the
reference's equivalent is SubprocVecEnv workers feeding a torch update.

Usage: python benchmarks/rl_throughput.py [--batch 1024] [--steps 64]
Prints one JSON line per config.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax

from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor


def main(batch=1024, steps=64, iters=4, fast=False, reshuffle=True):
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=6,
            task="traj_tracking",
            task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                       "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
                       "num_cycles": 1, "proj_point": [0, 0, 0.5],
                       "proj_normal": [0, 1, 1]},
            cost="rl_reward", normalized_rl_action_space=True,
            randomized_inertial_prop=True,
        )
    )
    ppo = PPO(env, seed=0, rollout_batch_size=batch, rollout_steps=steps,
              opt_epochs=10, mini_batch_size=batch * steps // 4,
              use_fast_rollout=fast, reshuffle_each_epoch=reshuffle)
    state = ppo.state
    # Warmup twice (compile + output-shardings retrace).
    state, _ = ppo._train_step(state)
    jax.device_get(state.total_steps)
    state, _ = ppo._train_step(state)
    jax.device_get(state.total_steps)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = ppo._train_step(state)
    jax.device_get(metrics["policy_loss"])
    dt = time.perf_counter() - t0
    env_steps = iters * batch * steps
    print(json.dumps({
        "metric": "ppo_train_env_steps_per_sec",
        "value": round(env_steps / dt, 1),
        "unit": "env-steps/s (incl. policy fwd + GAE + 10 SGD epochs)",
        "batch": batch,
        "rollout_steps": steps,
        "collector": "fast_policy_kernel" if fast else "scan",
        "reshuffle_each_epoch": reshuffle,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--fast", action="store_true",
                   help="policy-in-kernel Pallas collection")
    p.add_argument("--once-per-step-shuffle", action="store_true",
                   help="one minibatch shuffle per train step (see PPOConfig)")
    a, _ = p.parse_known_args()
    main(a.batch, a.steps, fast=a.fast, reshuffle=not a.once_per_step_shuffle)
