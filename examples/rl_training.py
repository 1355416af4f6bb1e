"""Train PPO on CartPole stabilization end-to-end with the full infra stack.

Demonstrates the reference's experiment workflow (config -> registry make ->
learn with checkpoints/logging -> eval -> plots) on the TPU-native stack:

    python examples/rl_training.py --steps 150000 --out /tmp/ppo_run

Writes metric logs + a learning-curve plot + a final checkpoint under
``--out`` and prints the eval return before/after training.
"""

import argparse
import os

import numpy as np


def main(max_steps=150_000, out_dir="/tmp/ppo_run", seed=0):
    import jax

    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
    from safe_control_gym_tpu.utils.logging import ExperimentLogger
    from safe_control_gym_tpu.utils.plotting import plot_from_logs

    os.makedirs(out_dir, exist_ok=True)
    env = make_cartpole(CartPoleConfig(
        ctrl_freq=50, pyb_freq=50, episode_len_sec=5,
        task="stabilization", cost="rl_reward",
        randomized_init=True,
    ))
    ppo = PPO(env, seed=seed, rollout_batch_size=64, rollout_steps=100,
              opt_epochs=10, mini_batch_size=1600)
    logger = ExperimentLogger(out_dir, log_std_out=False)

    def log_fn(step, metrics):
        logger.add_scalars(
            {k: float(v) for k, v in metrics.items()
             if np.isscalar(v) or getattr(v, "ndim", 1) == 0},
            step, prefix="train",
        )

    before = float(ppo.run(num_episodes=5)["ep_returns"].mean())
    print(f"eval return before training: {before:.1f}")

    ppo.learn(max_env_steps=max_steps, log_fn=log_fn)
    ppo.save(os.path.join(out_dir, "checkpoint"))
    logger.dump_scalars()

    after = float(ppo.run(num_episodes=5)["ep_returns"].mean())
    print(f"eval return after training:  {after:.1f}")
    curve_metric = None
    for name in ("train/mean_return", "train/policy_loss"):
        try:
            plot_from_logs([out_dir], metric=name,
                           out_path=os.path.join(out_dir, "learning_curve.png"))
            curve_metric = name
            break
        except ValueError:
            continue
    if curve_metric:
        print("learning curve:", os.path.join(out_dir, "learning_curve.png"),
              f"({curve_metric})")
    logger.close()
    return before, after


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150_000)
    p.add_argument("--out", default="/tmp/ppo_run")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    main(a.steps, a.out, a.seed)
