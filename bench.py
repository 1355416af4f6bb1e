"""Headline benchmark: env-steps/s/chip, Quadrotor-3D, 4096 envs.

BASELINE config 4: 3D quadrotor, figure-8 trajectory tracking, linear (box)
state constraints + impulse disturbance, domain-randomized inertia — the
full-featured hot path (constraint eval + disturbance injection + reward +
done logic every step), not a stripped-down dynamics microbench.

Two engines are measured:
* the general engine (per-step API: vmapped env + fused Pallas substep
  kernel + masked auto-reset under lax.scan), and
* the whole-rollout Pallas engine (parallel/fast_env.py): thousands of env
  steps per single kernel dispatch, validated step-exact against the
  general engine (tests/test_fast_env.py).

Prints ONE JSON line: value = the fast engine (the framework's best
supported path for this config), with the general engine's number in the
same record; vs_baseline is value / 1e7 (the BASELINE.json north-star).
"""

import json
import os
import time

import jax

# The container pins the platform via sitecustomize before env vars are
# read, so JAX_PLATFORMS alone cannot redirect this script.  SCG_PLATFORM
# is an explicit escape hatch (CPU smoke runs of the full bench path);
# unset, the pinned (TPU-tunnel) platform is used.
_PLATFORM_OVERRIDE = os.environ.get("SCG_PLATFORM")
if _PLATFORM_OVERRIDE:
    jax.config.update("jax_platforms", _PLATFORM_OVERRIDE)

import jax.numpy as jnp

from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
from safe_control_gym_tpu.parallel import make_vec_env
from safe_control_gym_tpu.parallel.rollout import EpisodeStats, RolloutCarry, rollout

B = 4096
STEPS_PER_CALL = 256
BASELINE_TARGET = 1e7

# Per-engine device-busy bookkeeping (VERDICT r3 item 8): each bench
# records wall time at TWO call counts; the linear fit t(N) = a + N*b
# separates the per-region overhead ``a`` (dispatch pipeline fill + the
# final device_get round trip — ~7 ms on this tunnel) from the per-call
# device time ``b``.  device_busy_frac = N*b / t(N): the fraction of the
# timed wall in which the device, not the host/tunnel, is the bottleneck.
_BUSY = {}


def _busy_record(name, t1, tn, n):
    b = max((tn - t1) / (n - 1), 1e-12)
    a = max(t1 - b, 0.0)
    _BUSY[name] = {
        "device_busy_frac": round(n * b / (a + n * b), 4),
        "per_call_s": round(b, 6),
        "per_region_overhead_s": round(a, 6),
    }


# bf16 MXU peak by device kind, for the MFU-style utilization estimate of
# the MLP-matmul engines.  The kernels run f32 (accumulation exactness is
# load-bearing for step-equality), so the quoted MFU is vs the bf16 peak —
# a deliberately conservative denominator, stated in the artifact.
_PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12}


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
    build.cfg = cfg
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


def bench_fast():
    import numpy as np

    from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout, supports

    cfg = build.cfg
    if not supports(cfg):
        return None
    env = make_quadrotor(cfg)
    S, iters = 8192, 4
    fr = FastQuadRollout(env, B, steps_per_call=S)
    act = fr.prepare_action(np.full(4, float(env.u_goal[0])))
    seeds = [jnp.asarray([i], jnp.int32) for i in range(iters + 3)]
    jax.block_until_ready(seeds[-1])
    rows = fr.reset(seed=0)
    rows = fr.run(rows, act, seeds[0])
    jax.device_get(rows)
    rows = fr.run(rows, act, seeds[1])
    jax.device_get(rows)
    t0 = time.perf_counter()
    rows = fr.run(rows, act, seeds[2])
    jax.device_get(rows)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        rows = fr.run(rows, act, seeds[3 + i])
    jax.device_get(rows)
    dt = time.perf_counter() - t0
    _busy_record("fast", t1, dt, iters)
    return iters * S * B / dt


def bench_maze():
    """BASELINE config 5: level2-class gate-traversal course — randomized
    gates/obstacles, competition sparse cost, collision done flag, action
    white noise + uniform dynamics force — on the maze-capable whole-rollout
    kernel (in-kernel geometry; see tests/test_fast_maze.py for the
    step-exact validation vs the general engine)."""
    import numpy as np

    from safe_control_gym_tpu.parallel.fast_env import FastQuadRollout, supports

    cfg = QuadrotorConfig(
        quad_type=3, ctrl_freq=30, pyb_freq=60, episode_len_sec=15,
        task="stabilization",
        task_info={"stabilization_goal": [-0.5, 2.9, 0.75],
                   "stabilization_goal_tolerance": 0.15},
        cost="competition",
        gates=(
            [0.5, -2.5, 0, 0, 0, -1.57, 0],
            [2.0, -1.5, 0, 0, 0, 0, 1],
            [0.0, 0.2, 0, 0, 0, 1.57, 1],
            [-0.5, 1.5, 0, 0, 0, 0, 0],
        ),
        obstacles=(
            [1.5, -2.5, 0, 0, 0, 0],
            [0.5, -1.0, 0, 0, 0, 0],
            [1.5, 0.0, 0, 0, 0, 0],
            [-1.0, 0.0, 0, 0, 0, 0],
        ),
        randomized_gates_and_obstacles=True,
        randomized_init=True,
        randomized_inertial_prop=True,
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
        ),
        disturbances={
            "action": ({"disturbance_func": "white_noise", "std": 0.001},),
            "dynamics": ({"disturbance_func": "uniform",
                          "low": [-0.1] * 3, "high": [0.1] * 3},),
        },
        done_on_collision=True,
        done_on_out_of_bound=False,
    )
    if not supports(cfg, allow_maze=True):
        return None
    env = make_quadrotor(cfg)
    S, iters = 8192, 4
    fr = FastQuadRollout(env, B, steps_per_call=S)
    act = fr.prepare_action(np.full(4, float(env.u_goal[0])))
    rows = fr.reset(seed=0)
    rows = fr.run(rows, act, 1)
    jax.device_get(rows)
    rows = fr.run(rows, act, 2)
    jax.device_get(rows)
    t0 = time.perf_counter()
    rows = fr.run(rows, act, 3)
    jax.device_get(rows)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        rows = fr.run(rows, act, 4 + i)
    jax.device_get(rows)
    dt = time.perf_counter() - t0
    _busy_record("maze", t1, dt, iters)
    return iters * S * B / dt


def bench_cartpole():
    """BASELINE config 2: CartPole trajectory tracking with box constraints
    + white-noise action disturbance, on the cartpole whole-rollout kernel
    (parallel/fast_cartpole.py; step-exact vs the general engine in
    tests/test_fast_cartpole.py)."""
    import numpy as np

    from safe_control_gym_tpu.envs.cartpole import CartPoleConfig, make_cartpole
    from safe_control_gym_tpu.parallel.fast_cartpole import (
        FastCartPoleRollout,
        supports,
    )

    cfg = CartPoleConfig(
        ctrl_freq=50, pyb_freq=50, episode_len_sec=10,
        task="traj_tracking",
        randomized_init=True,
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
            {"constraint_form": "default_constraint", "constrained_variable": "input"},
        ),
        disturbances={
            "action": ({"disturbance_func": "white_noise", "std": 0.2},),
        },
        done_on_out_of_bound=True,
    )
    if not supports(cfg):
        return None
    env = make_cartpole(cfg)
    S, iters = 8192, 4
    fr = FastCartPoleRollout(env, B, steps_per_call=S)
    act = fr.prepare_action(np.asarray([0.0]))
    rows = fr.reset(seed=0)
    rows = fr.run(rows, act, 1)
    jax.device_get(rows)
    rows = fr.run(rows, act, 2)
    jax.device_get(rows)
    t0 = time.perf_counter()
    rows = fr.run(rows, act, 3)
    jax.device_get(rows)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        rows = fr.run(rows, act, 4 + i)
    jax.device_get(rows)
    dt = time.perf_counter() - t0
    _busy_record("cartpole", t1, dt, iters)
    return iters * S * B / dt


def bench_quad2d():
    """BASELINE config 3: planar (2D) quadrotor stabilization with
    domain-randomized mass/inertia, on the planar whole-rollout kernel
    (parallel/fast_quad_planar.py; step-exact vs the general engine in
    tests/test_fast_quad_planar.py)."""
    import numpy as np

    from safe_control_gym_tpu.parallel.fast_quad_planar import (
        FastPlanarQuadRollout,
        supports,
    )

    cfg = QuadrotorConfig(
        quad_type=2, ctrl_freq=50, pyb_freq=200, episode_len_sec=10,
        task="stabilization",
        task_info={"stabilization_goal": [0, 1],
                   "stabilization_goal_tolerance": 0.05},
        randomized_init=True, randomized_inertial_prop=True,
        constraints=(
            {"constraint_form": "default_constraint", "constrained_variable": "state"},
        ),
        done_on_out_of_bound=True,
    )
    if not supports(cfg):
        return None
    env = make_quadrotor(cfg)
    hover = float(env.u_goal[0])
    S, iters = 4096, 4
    fr = FastPlanarQuadRollout(env, B, steps_per_call=S)
    act = fr.prepare_action(np.full(2, hover, np.float32))
    rows = fr.reset(seed=0)
    rows = fr.run(rows, act, 1)
    jax.device_get(rows)
    rows = fr.run(rows, act, 2)
    jax.device_get(rows)
    t0 = time.perf_counter()
    rows = fr.run(rows, act, 3)
    jax.device_get(rows)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        rows = fr.run(rows, act, 4 + i)
    jax.device_get(rows)
    dt = time.perf_counter() - t0
    _busy_record("quad2d", t1, dt, iters)
    return iters * S * B / dt


def bench_policy_in_loop():
    """Closed-loop throughput: a REAL policy (PPO actor+critic MLP forward +
    Gaussian sampling) acting in-kernel every step, trajectory recorded to
    HBM — the RL data-collection path (parallel/fast_policy.py), not an
    open-loop constant-action rollout."""
    import dataclasses

    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_env import supports
    from safe_control_gym_tpu.parallel.fast_policy import FastPolicyRollout

    cfg = dataclasses.replace(build.cfg, normalized_rl_action_space=True)
    if not supports(cfg, allow_normalized=True):
        return None
    env = make_quadrotor(cfg)
    T, iters = 512, 2
    fp = FastPolicyRollout(env, B, T)
    ppo = PPO(env, seed=0, rollout_batch_size=B, rollout_steps=T)
    w = fp.pack_weights(ppo.state.ac.actor_params, ppo.state.ac.critic_params,
                        ppo.state.ac.logstd)
    w = jax.tree.map(jnp.asarray, w)
    rows = fp.reset(seed=0)
    rows, traj = fp.run(rows, w, seed=1)
    jax.device_get(rows)
    rows, traj = fp.run(rows, w, seed=2)
    jax.device_get(rows)
    t0 = time.perf_counter()
    rows, traj = fp.run(rows, w, seed=3)
    jax.device_get(rows)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        rows, traj = fp.run(rows, w, seed=4 + i)
    jax.device_get(rows)
    dt = time.perf_counter() - t0
    _busy_record("policy_in_loop", t1, dt, iters)
    sps = iters * T * B / dt
    # MFU-style utilization of the in-kernel dual actor+critic MLP: analytic
    # matmul FLOPs per env-step (2*(obs*2H + 2H*2H + 2H*8), H=64) * steps/s
    # over the chip's bf16 MXU peak (the kernel computes f32 — conservative).
    H2, od = 2 * 64, fp.obs_dim
    flops_step = 2 * (od * H2 + H2 * H2 + H2 * 8)
    _BUSY["policy_in_loop"]["mlp_flops_per_sec"] = round(sps * flops_step, 1)
    return sps


def bench_rl_train():
    """Full PPO TRAINING throughput (VERDICT r2 item 4): policy-in-kernel
    collection + GAE + 10 SGD epochs as one jitted program, B=4096 x T=128
    (the measured sweet spot, docs/PERF.md) — env-steps/s through the
    complete train step, the reference's SubprocVecEnv->torch loop analogue
    (ppo.py:247-293)."""
    import dataclasses

    from safe_control_gym_tpu.controllers.ppo import PPO
    from safe_control_gym_tpu.parallel.fast_env import supports

    cfg = dataclasses.replace(build.cfg, normalized_rl_action_space=True)
    if not supports(cfg, allow_normalized=True):
        return None
    env = make_quadrotor(cfg)
    batch, steps, chunk, iters = B, 128, 4, 2
    ppo = PPO(env, seed=0, rollout_batch_size=batch, rollout_steps=steps,
              opt_epochs=10, mini_batch_size=batch * steps // 4,
              use_fast_rollout=True, reshuffle_each_epoch=False)
    # Jitted multi-step training chunk: one dispatch per `chunk` train
    # steps, the way a real training loop runs on remote devices (the
    # per-dispatch tunnel round trip here is ~5-8 ms — at a 20 ms device
    # step that is a 30% tax the loop structure, not the program, causes).
    run = ppo.train_many(chunk)
    state = ppo.state
    state, _ = run(state)
    jax.device_get(state.total_steps)
    state, _ = run(state)
    jax.device_get(state.total_steps)
    t0 = time.perf_counter()
    state, metrics = run(state)
    jax.device_get(metrics["policy_loss"])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = run(state)
    jax.device_get(metrics["policy_loss"])
    dt = time.perf_counter() - t0
    _busy_record("rl_train", t1, dt, iters)
    sps = iters * chunk * batch * steps / dt
    # Train-step MLP FLOPs per env-step: collection forward (1x) + epochs
    # passes of fwd+bwd (~3x each) over the same per-sample matmul cost.
    H2, od = 2 * 64, ppo._fp.obs_dim
    fwd = 2 * (od * H2 + H2 * H2 + H2 * 8)
    _BUSY["rl_train"]["mlp_flops_per_sec"] = round(sps * fwd * (1 + 3 * 10), 1)
    return sps


def load_prev_bench():
    """Newest committed BENCH_r*.json — the perf regression base (VERDICT r2
    item 8: deltas or variance claims stay unfalsifiable)."""
    import glob
    import os

    root = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not paths:
        return None, None
    try:
        with open(paths[-1]) as f:
            rec = json.load(f)
        # Driver artifacts nest the bench record under "parsed".
        return rec.get("parsed", rec), os.path.basename(paths[-1])
    except (OSError, json.JSONDecodeError):
        return None, None


def regression_deltas(record, prev):
    """Per-engine fractional deltas vs the prior artifact; flags >10%
    regressions (tunnel run-to-run variance is ~5%, docs/PERF.md:39-43, so
    a 10% drop is signal, not noise)."""
    if not prev:
        return None, []
    keys = ("value", "general_engine_value", "policy_in_loop_value",
            "maze_level2_value", "rl_train_value", "cartpole_value",
            "quad2d_value")
    deltas, flagged = {}, []
    for k in keys:
        new_v, old_v = record.get(k), prev.get(k)
        if new_v is None or old_v is None or not old_v:
            continue
        d = new_v / old_v - 1.0
        deltas[k] = round(d, 4)
        if d < -0.10:
            flagged.append(k)
    return deltas, flagged


def probe_backend(timeout_s=150):
    """Return the live platform name, or None if device init hangs.

    The container pins the platform to the tunneled TPU; when the tunnel is
    down, the first jax op blocks forever with no exception to catch.  Probe
    device init in a CHILD process under a hard timeout so a dead tunnel
    degrades to an explicit artifact line instead of the driver's bench pass
    hanging.  The child exits before the parent touches the device, so the
    one-process-per-TPU rule is respected.
    """
    import os
    import subprocess
    import sys

    code = (
        "import os, jax\n"
        "p = os.environ.get('SCG_PLATFORM')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print(jax.devices()[0].platform)"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=os.environ,
        )
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.strip()
    except subprocess.TimeoutExpired:
        pass
    return None


def main():
    platform = probe_backend()
    if platform is None:
        # Dead tunnel: emit a parseable, honest record rather than hanging
        # the driver's bench pass.  value=0 cannot be mistaken for a result.
        print(json.dumps({
            "metric": "env_steps_per_sec_per_chip_quad3d_4096",
            "value": 0,
            "unit": "env-steps/s",
            "vs_baseline": 0.0,
            "error": "device backend unavailable (init timed out; TPU tunnel down?)",
        }))
        return
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
    carry = run(carry)
    jax.device_get(carry.obs)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = run(carry)
    jax.device_get(carry.obs)
    dt = time.perf_counter() - t0
    _busy_record("general", t1, dt, iters)
    general = iters * STEPS_PER_CALL * B / dt

    def _safe(fn):
        """One failing engine bench must not lose the whole artifact: the
        driver records this script's single JSON line, so degrade that
        engine's field to None and keep going."""
        import sys
        import traceback

        try:
            return fn()
        except Exception:
            print(f"bench {fn.__name__} failed:", file=sys.stderr)
            traceback.print_exc()
            return None

    fast = _safe(bench_fast)
    policy_loop = _safe(bench_policy_in_loop)
    maze = _safe(bench_maze)
    rl_train = _safe(bench_rl_train)
    cartpole = _safe(bench_cartpole)
    quad2d = _safe(bench_quad2d)
    headline = fast if fast is not None else general
    record = {
        "metric": "env_steps_per_sec_per_chip_quad3d_4096",
        "value": round(headline, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(headline / BASELINE_TARGET, 4),
        "engine": "fast_rollout" if fast is not None else "general",
        "platform": platform,
        "general_engine_value": round(general, 1),
        # Closed-loop: PPO actor+critic forward + sampling in-kernel
        # each step, full trajectory recorded (the RL collection
        # path) — not open-loop.
        "policy_in_loop_value": (
            round(policy_loop, 1) if policy_loop is not None else None
        ),
        # BASELINE config 5: level2-class randomized maze with
        # in-kernel gate/obstacle geometry + competition cost.
        "maze_level2_value": round(maze, 1) if maze is not None else None,
        # Full PPO train step (collection + GAE + 10 SGD epochs),
        # B=4096 x T=128 — the RL-training bar (>=2e7).
        "rl_train_value": round(rl_train, 1) if rl_train is not None else None,
        # BASELINE config 2: CartPole tracking + box constraints + action
        # white noise on the cartpole whole-rollout kernel.
        "cartpole_value": round(cartpole, 1) if cartpole is not None else None,
        # BASELINE config 3: planar (2D) quad stabilization + DR inertia
        # on the planar whole-rollout kernel — with this row every BASELINE
        # config family is measured on a single-dispatch engine.
        "quad2d_value": round(quad2d, 1) if quad2d is not None else None,
    }
    # Device utilization per engine (VERDICT r3 item 8): busy fraction from
    # the two-point wall fit, plus MFU vs the bf16 MXU peak for the
    # MLP-matmul engines (analytic FLOP counts; kernels compute f32).
    peak = _PEAK_FLOPS.get(str(jax.devices()[0].device_kind))
    for name, d in _BUSY.items():
        fl = d.get("mlp_flops_per_sec")
        if fl is not None and peak:
            d["mfu_vs_bf16_peak"] = round(fl / peak, 6)
    record["device_utilization"] = _BUSY
    if peak:
        record["peak_flops_bf16_assumed"] = peak
    prev, prev_name = load_prev_bench()
    deltas, flagged = regression_deltas(record, prev)
    if deltas is not None:
        record["delta_vs_prev"] = deltas
        record["prev_artifact"] = prev_name
        # >10% drops are flagged; single-chip tunnel variance is ~5%
        # run-to-run, so these need a look before being written off.
        record["regressions_flagged"] = flagged
    print(json.dumps(record))


if __name__ == "__main__":
    main()
