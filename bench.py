"""Headline benchmark: env-steps/s/chip, Quadrotor-3D, 4096 envs.

BASELINE config 4: 3D quadrotor, figure-8 trajectory tracking, linear (box)
state constraints + impulse disturbance, domain-randomized inertia — the
full-featured hot path (constraint eval + disturbance injection + reward +
done logic every step), not a stripped-down dynamics microbench.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e7 (the BASELINE.json north-star for one v5p host).
"""

import json
import time

import jax
import jax.numpy as jnp

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

B = 4096
STEPS_PER_CALL = 256
BASELINE_TARGET = 1e7


def build():
    cfg = QuadrotorConfig(
        quad_type=3,
        ctrl_freq=60,
        pyb_freq=240,
        episode_len_sec=6,
        task="traj_tracking",
        task_info={
            "trajectory_type": "figure8",
            "trajectory_plane": "xy",
            "trajectory_position_offset": [0.0, 0.0],
            "trajectory_scale": 1.0,
            "num_cycles": 1,
            "proj_point": [0, 0, 0.5],
            "proj_normal": [0, 1, 1],
        },
        cost="rl_reward",
        randomized_inertial_prop=True,
        randomized_init=True,
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
            {"constraint_form": "default_constraint", "constrained_variable": "input"},
        ),
        disturbances={
            "dynamics": ({"disturbance_func": "impulse", "magnitude": 0.005, "duration": 10, "decay_rate": 0.8},),
        },
        done_on_out_of_bound=True,
    )
    env = make_quadrotor(cfg)
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))

    hover = float(env.u_goal[0])
    policy = lambda ps, o: (jnp.full((B, 4), hover, obs.dtype), ps)

    @jax.jit
    def run(carry):
        carry, _ = rollout(vec, policy, carry, STEPS_PER_CALL, collect=False, unroll=8)
        return carry

    carry = RolloutCarry(state, obs, (), EpisodeStats.create(B, obs.dtype))
    return run, carry


def main():
    run, carry = build()
    # Warmup / compile (twice: first output's shardings retrace once).
    carry = run(carry)
    jax.device_get(carry.obs)
    carry = run(carry)
    jax.device_get(carry.obs)
    # Timed.  device_get is the completion barrier: on tunneled backends
    # block_until_ready can return before remote execution finishes, which
    # overstates throughput; materializing the result cannot.
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = run(carry)
    jax.device_get(carry.obs)
    dt = time.perf_counter() - t0
    steps_per_sec = iters * STEPS_PER_CALL * B / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_quad3d_4096",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
