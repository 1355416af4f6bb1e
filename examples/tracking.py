"""PID trajectory-tracking example.

Counterpart of the reference's tests/scripts/tracking.py: a 2D quadrotor
tracks a circle reference with the DSL PID controller, printing steps/sec and
realtime speedup (tracking.py:78-80).

Usage: python examples/tracking.py [--max_steps N] [--plot out.png]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.pid import PID
from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.utils.drone_logger import DroneLogger


def main(max_steps=None, plot=None):
    env = make_quadrotor(
        QuadrotorConfig(
            quad_type=2,
            task="traj_tracking",
            cost="rl_reward",
            task_info={
                "trajectory_type": "circle",
                "num_cycles": 1,
                "trajectory_plane": "zx",
                "trajectory_position_offset": [0.5, 0],
                "trajectory_scale": -0.5,
            },
            episode_len_sec=6,
            ctrl_freq=50,
            pyb_freq=50,
            randomized_init=False,
            init_state={"init_x": 0.0, "init_z": 1.0},
        )
    )
    pid = PID(env)
    logger = DroneLogger(logging_freq_hz=env.ctrl_freq)
    state, obs, _ = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    T = max_steps or env.max_episode_steps
    start = time.time()
    total_mse = 0.0
    for i in range(T):
        action = pid.select_action(np.asarray(obs))
        state, obs, reward, done, info = step(state, jnp.asarray(action))
        o = np.asarray(obs)
        logger.log(0, i / env.ctrl_freq,
                   [o[0], 0, o[2], o[1], 0, o[3], 0, o[4], 0, 0, o[5], 0])
        total_mse += float(info["mse"])
        if bool(done):
            break
    elapsed = time.time() - start
    n = i + 1
    print(f"steps/sec: {n / elapsed:.1f}")
    print(f"realtime speedup: {(n / env.ctrl_freq) / elapsed:.2f}x")
    print(f"rmse: {np.sqrt(total_mse / n):.4f}")
    if plot:
        logger.plot(plot)
        print(f"saved plot to {plot}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--plot", type=str, default=None)
    a, _ = p.parse_known_args()
    main(a.max_steps, a.plot)
