"""On-device (real TPU) cross-engine equality checks.

The Pallas whole-rollout engines are validated step-equal against the
general engine in interpret mode on every CI run (tests/test_fast_*.py);
this script runs the SAME seeded rollout-with-resets comparison with
``interpret=False`` on the actual TPU backend — Mosaic lowering, core
PRNG path, f32 tiles in real VMEM — and records the result as an
artifact.  Covers all three engines: quad-3D (fast_env), CartPole
(fast_cartpole), planar 1D/2D quads (fast_quad_planar).

The general engine runs on the same device, so this isolates
kernel-vs-XLA divergence (not device-vs-host float differences).

Usage:  python benchmarks/on_device_checks.py [--out ONDEVICE_r03.json]
        (needs the TPU platform; ~1-2 min of compiles on first run)
"""

import argparse
import json
import os
import sys
import time

import jax

if "--interpret" in sys.argv:
    # CPU smoke: must override the container's axon platform pin BEFORE
    # any backend use (the env var alone is not honored in-process).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

B = 1024
STEPS = 25
INTERPRET = False  # --interpret: CPU smoke of the plumbing


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def _compare(env, fast, action, extra_rows=()):
    """Seeded rollout with resets on both engines; returns max rel err."""
    vec = make_vec_env(env, B)
    state, obs, _ = jax.jit(vec.reset)(jax.random.key(0))
    rows0 = fast.reset(seed=0)
    r0 = _rel_err(fast.states(rows0), state.x)

    act = jnp.broadcast_to(jnp.asarray(action, jnp.float32), (B, len(action)))
    rows_out = fast.run(rows0, np.asarray(action, np.float32), seed=0)
    carry = RolloutCarry(state, obs[:, : fast.states(rows0).shape[1]], (),
                         EpisodeStats.create(B))
    carry, _ = jax.jit(
        lambda c: rollout(vec, lambda ps, o: (act, ps), c, STEPS, collect=False)
    )(carry)
    rows_out = jax.device_get(rows_out)
    x_gen = jax.device_get(carry.env_state.x)
    r1 = _rel_err(fast.states(rows_out), x_gen)
    extras = {}
    for name, row_idx, field in extra_rows:
        extras[name] = _rel_err(
            np.asarray(rows_out[row_idx]).reshape(B),
            np.asarray(field(carry.env_state), np.float32).reshape(B))
    return {"reset_rel_err": r0, "rollout_rel_err": r1, **extras}


def check_quad3d():
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
    from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout

    cfg = QuadrotorConfig(
        quad_type=3, ctrl_freq=60, pyb_freq=240, episode_len_sec=0.2,
        task="stabilization",
        task_info={"stabilization_goal": [0, 0, 1],
                   "stabilization_goal_tolerance": 0.05},
        randomized_init=True, randomized_inertial_prop=True,
        done_on_out_of_bound=False,
        disturbances={"dynamics": ({"disturbance_func": "impulse",
                                    "magnitude": 0.02, "duration": 4,
                                    "decay_rate": 0.8},)},
    )
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    fr = FastQuadRollout(env, B, steps_per_call=STEPS, interpret=INTERPRET)
    return _compare(env, fr, [hover] * 4, extra_rows=(
        ("mass_rel_err", 12, lambda s: s.mass),
        ("episode_idx_rel_err", fr.n_rows - 1, lambda s: s.episode_idx),
    ))


def check_cartpole():
    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
    from safe_control_gym_tpu.parallel.fast_cartpole import FastCartPoleRollout

    cfg = CartPoleConfig(
        ctrl_freq=50, pyb_freq=50, episode_len_sec=0.12,
        task="stabilization", randomized_init=True,
        randomized_inertial_prop=True, done_on_out_of_bound=False,
        disturbances={"dynamics": ({"disturbance_func": "impulse",
                                    "magnitude": 0.4, "duration": 4,
                                    "decay_rate": 0.8},)},
    )
    env = make_cartpole(cfg)
    fr = FastCartPoleRollout(env, B, steps_per_call=STEPS, interpret=INTERPRET)
    return _compare(env, fr, [0.0], extra_rows=(
        ("pole_length_rel_err", 4, lambda s: s.pole_length),
        ("episode_idx_rel_err", 17, lambda s: s.episode_idx),
    ))


def check_quad2d():
    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
    from safe_control_gym_tpu.parallel.fast_quad_planar import FastPlanarQuadRollout

    cfg = QuadrotorConfig(
        quad_type=2, ctrl_freq=50, pyb_freq=200, episode_len_sec=0.2,
        task="stabilization",
        task_info={"stabilization_goal": [0, 1],
                   "stabilization_goal_tolerance": 0.05},
        randomized_init=True, randomized_inertial_prop=True,
        done_on_out_of_bound=False,
        disturbances={"dynamics": ({"disturbance_func": "impulse",
                                    "magnitude": 0.02, "duration": 4,
                                    "decay_rate": 0.8},)},
    )
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    fr = FastPlanarQuadRollout(env, B, steps_per_call=STEPS, interpret=INTERPRET)
    L = fr.params["_L"]
    return _compare(env, fr, [hover] * 2, extra_rows=(
        ("mass_rel_err", L["MASS"], lambda s: s.mass),
        ("episode_idx_rel_err", L["EP"], lambda s: s.episode_idx),
    ))


def main(out=None):
    dev = jax.devices()[0]
    record = {
        "metric": "on_device_cross_engine_rel_err",
        "platform": str(dev.platform),
        "device": str(dev.device_kind),
        "batch": B,
        "steps": STEPS,
        "note": ("seeded rollout WITH auto-resets, interpret=False kernels "
                 "vs the jitted general engine on the same device; reset "
                 "draws are bit-exact by construction (ops/ctr_prng.py), "
                 "trajectories agree to f32 accumulation order"),
        "engines": {},
    }
    for name, fn in (("quad3d", check_quad3d), ("cartpole", check_cartpole),
                     ("quad2d", check_quad2d)):
        t0 = time.perf_counter()
        try:
            r = fn()
            r["wall_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:
            r = {"error": str(e)[:300]}
        record["engines"][name] = r
        print(json.dumps({name: r}), flush=True)
    errs = [v["rollout_rel_err"] for v in record["engines"].values()
            if "rollout_rel_err" in v]
    # None (JSON null) when any engine failed — float('inf') would emit the
    # non-standard Infinity token and make the failure artifact unparseable.
    worst = max(errs) if len(errs) == len(record["engines"]) else None
    record["value"] = worst
    record["all_engines_ran"] = len(errs) == len(record["engines"])
    print(json.dumps({"metric": record["metric"], "value": worst}))
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
    return record


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke of the harness plumbing (kernels in "
                        "interpret mode); the artifact run uses the TPU")
    a = p.parse_args()
    if a.interpret:
        INTERPRET = True
    main(out=a.out)
