"""RL learning equivalence at CONVERGENCE scale (VERDICT r3 item 5).

The round-3 rl_equivalence smoke (40 iters, marginal improvement on both
paths) proved the fast collector learns, not that it learns a GOOD policy.
This harness trains PPO to convergence-scale step counts on two tasks —
CartPole stabilization (near-max exponential return) and quad-3D figure-8
tracking (reference ppo.yaml task class, reference trains 2.5M steps via
ppo.py:157-191) — once per collector:

  * ``scan``: reference-semantics XLA rollout (vmapped env under lax.scan);
  * ``fast``: policy-in-kernel Pallas collection + VMEM update kernel.

Same seed, same eval protocol (general-engine batched run, fixed eval
seed, mode actions).  The artifact records learning curves, final returns,
tracking RMSE, the fast/scan parity ratio (bar: within 5%), and end-to-end
wall clock, as one JSON line.

Usage (real TPU, ~10-20 min): python benchmarks/rl_convergence.py \
    --out RL_EQUIV_r05.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def build_cartpole():
    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole

    return make_cartpole(CartPoleConfig(
        ctrl_freq=50, pyb_freq=50, episode_len_sec=5.0,
        task="stabilization", cost="rl_reward",
        randomized_init=True, normalized_rl_action_space=True,
    ))


def build_quad2d_stab():
    """The reference's canonical RL quadrotor task: quad_type 2,
    stabilization, 60 Hz, 5 s episodes, exponential reward
    (reference quadrotor.yaml defaults + ppo.yaml 1M-step budget)."""
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

    return make_quadrotor(QuadrotorConfig(
        quad_type=2, ctrl_freq=60, pyb_freq=240, episode_len_sec=5,
        task="stabilization", cost="rl_reward",
        randomized_init=True, normalized_rl_action_space=True,
    ))


def build_quad3d():
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor

    return make_quadrotor(QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=6,
        task="traj_tracking",
        task_info={"trajectory_type": "figure8", "trajectory_plane": "xy",
                   "trajectory_position_offset": [0, 0],
                   "trajectory_scale": 1.0, "num_cycles": 1,
                   "proj_point": [0, 0, 0.5], "proj_normal": [0, 1, 1]},
        cost="rl_reward", normalized_rl_action_space=True,
        randomized_inertial_prop=True,
    ))


def train_one(build_env, fast, total_steps, eval_every_iters, eval_eps,
              eval_steps, seed=0):
    from safe_control_gym_tpu.controllers.ppo import PPO

    env = build_env()
    B, T = 1024, 64
    ppo = PPO(env, seed=seed, rollout_batch_size=B, rollout_steps=T,
              opt_epochs=10, mini_batch_size=B * T // 4, use_gae=True,
              use_fast_rollout=fast, reshuffle_each_epoch=not fast)

    def evaluate():
        r = ppo.run(num_episodes=eval_eps, max_steps=eval_steps, seed=7)
        return (float(np.mean(r["ep_returns"])),
                float(np.sqrt(np.mean(np.asarray(r["mse"])))))

    n_iters = max(int(total_steps) // (B * T), 1)
    chunk = min(eval_every_iters, n_iters)
    run_chunk = ppo.train_many(chunk)
    curve = []
    ret0, rmse0 = evaluate()
    curve.append({"env_steps": 0, "return": round(ret0, 4),
                  "rmse": round(rmse0, 4)})
    t0 = time.perf_counter()
    t_train = 0.0
    done_iters = 0
    state = ppo.state
    while done_iters < n_iters:
        ta = time.perf_counter()
        state, metrics = run_chunk(state)
        jax.device_get(metrics["policy_loss"])
        t_train += time.perf_counter() - ta
        done_iters += chunk
        ppo.state = state
        ret, rmse = evaluate()
        curve.append({"env_steps": done_iters * B * T,
                      "return": round(ret, 4), "rmse": round(rmse, 4)})
        print(json.dumps({"fast": fast, **curve[-1]}), flush=True)
    wall = time.perf_counter() - t0
    final = curve[-1]
    return {
        "collector": "fast" if fast else "scan",
        "env_steps": n_iters * B * T,
        "return_initial": curve[0]["return"],
        "return_final": final["return"],
        "rmse_final": final["rmse"],
        "train_wall_s": round(t_train, 1),
        "wall_s_incl_eval": round(wall, 1),
        "steps_per_sec_train": round(n_iters * B * T / max(t_train, 1e-9), 1),
        "curve": curve,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cartpole-steps", type=float, default=8e6)
    ap.add_argument("--quad-steps", type=float, default=25e6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    tasks = []
    for name, build, steps, eval_steps in (
        ("cartpole_stab", build_cartpole, args.cartpole_steps, 250),
        ("quad2d_stab_reference_task", build_quad2d_stab,
         args.cartpole_steps, 300),
        ("quad3d_figure8", build_quad3d, args.quad_steps, 360),
    ):
        rows = []
        for fast in (False, True):
            rows.append(train_one(build, fast, steps,
                                  eval_every_iters=16, eval_eps=64,
                                  eval_steps=eval_steps))
            print(json.dumps({"task": name, **{k: v for k, v in rows[-1].items() if k != "curve"}}), flush=True)
        scan, fastr = rows
        parity = fastr["return_final"] / scan["return_final"] \
            if scan["return_final"] else float("nan")
        tasks.append({
            "task": name,
            "rows": rows,
            "final_return_parity_fast_over_scan": round(parity, 4),
            "parity_within_5pct": bool(abs(parity - 1.0) <= 0.05
                                       or parity > 1.0),
            "train_speedup_fast_over_scan": round(
                scan["train_wall_s"] / max(fastr["train_wall_s"], 1e-9), 2),
        })
    artifact = {
        "metric": "rl_learning_equivalence_convergence",
        "platform": str(jax.devices()[0].platform),
        "note": ("PPO to convergence-scale step counts, scan vs "
                 "policy-in-kernel collection, same seed/eval protocol; "
                 "parity bar: fast final return within 5% of scan (or "
                 "better). Eval: 64 episodes, mode actions, fixed seed."),
        "tasks": tasks,
    }
    line = json.dumps(artifact)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
