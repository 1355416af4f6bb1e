"""On-device numerical-fidelity artifact (BASELINE fidelity row).

One command, run on the DEFAULT backend (the real TPU under the driver;
CPU when pinned): rolls fixed-seed CartPole and Quadrotor-3D trajectories
through the engine's jitted step and compares them against the independent
NumPy oracle (tests/oracles/numpy_reference.py), in f32 and — where the
backend supports it — f64.  Prints one JSON line and writes
FIDELITY_r<N>.json at the repo root.

Two measures per case:

* ``step_max_ulp`` — TEACHER-FORCED: at every oracle state along the
  trajectory, one engine RK4 step vs one oracle step.  This isolates the
  engine's numerics from dynamical divergence and is the fidelity bar.
* ``traj_max_rel`` — free-running trajectory divergence after N steps;
  reported for context only (the quadrotor's attitude dynamics amplify
  any rounding difference exponentially, so this number measures the
  system's Lyapunov growth, not the engine).

What the numbers mean (reconciling BASELINE.md's "bitwise" wording):
exact bit equality vs NumPy is not attainable on ANY XLA backend — XLA
contracts multiply-adds into FMAs, NumPy does not — so the fidelity bar
is ulp-level per-step agreement (<= 4 ulp in f64 on CPU,
tests/test_dynamics.py; f32-dominated on TPU, whose native matmul/f64
support differs).  BITWISE reproducibility holds within the engine: same
seed => identical trajectories for any batch size or device layout
(tests/test_vector.py, tests/test_sharding.py).

Usage: python benchmarks/fidelity.py [--round 2] [--steps 100]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")

import jax
import jax.numpy as jnp
import numpy as np


def _max_ulp(got, want):
    """Max units-in-last-place difference, elementwise (numpy semantics)."""
    got = np.asarray(got)
    want = np.asarray(want, got.dtype)
    eps = np.spacing(np.maximum(np.abs(got), np.abs(want)))
    return float(np.max(np.abs(got - want) / eps))


def cartpole_case(steps, dtype):
    from oracles import numpy_reference as oracle

    from safe_control_gym_tpu.envs.cartpole import cartpole_fc
    from safe_control_gym_tpu.ops.integrators import rk4_step

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=4) * 0.05
    forces = rng.normal(size=(steps, 1)) * 2.0
    dt = 0.02
    pl_, pm, cm = 1.0, 0.1, 1.0

    fc = lambda a, b: cartpole_fc(a, b, pl_, pm, cm)
    ofc = lambda a, b: oracle.cartpole_fc(a, b, pl_, pm, cm)
    return _run_case(fc, ofc, x0, forces, dt, steps, dtype)


def quad3d_case(steps, dtype):
    from oracles import numpy_reference as oracle

    from safe_control_gym_tpu.envs.quadrotor import MASS, J_DIAG, quad_fc_3d
    from safe_control_gym_tpu.ops.integrators import rk4_step  # noqa: F401

    rng = np.random.default_rng(1)
    x0 = rng.normal(size=12) * 0.05
    hover = MASS * 9.8 / 4.0
    forces = hover * (1.0 + 0.05 * rng.normal(size=(steps, 4)))
    dt = 1.0 / 240.0
    j = np.asarray(J_DIAG)

    fc = lambda a, b: quad_fc_3d(a, b, jnp.asarray(MASS, a.dtype),
                                 jnp.asarray(j, a.dtype), jnp.zeros(3, a.dtype))
    ofc = lambda a, b: oracle.quad3d_fc(a, b, MASS, j)
    return _run_case(fc, ofc, x0, forces, dt, steps, dtype)


def quad2d_case(steps, dtype):
    """Planar quadrotor (BASELINE config 3 family; reference quadrotor.py
    QuadType.TWO_D dynamics)."""
    from oracles import numpy_reference as oracle

    from safe_control_gym_tpu.envs.quadrotor import MASS, J_DIAG, quad_fc_2d

    rng = np.random.default_rng(2)
    x0 = rng.normal(size=6) * 0.05
    hover = MASS * 9.8 / 4.0
    forces = hover * (1.0 + 0.05 * rng.normal(size=(steps, 4)))
    dt = 1.0 / 240.0
    iyy = float(np.asarray(J_DIAG)[1])

    fc = lambda a, b: quad_fc_2d(a, b, jnp.asarray(MASS, a.dtype),
                                 jnp.asarray(iyy, a.dtype),
                                 jnp.zeros((), a.dtype), jnp.zeros((), a.dtype))
    ofc = lambda a, b: oracle.quad2d_fc(a, b, MASS, iyy)
    return _run_case(fc, ofc, x0, forces, dt, steps, dtype)


def _run_case(fc, ofc, x0, forces, dt, steps, dtype):
    """(per-step engine states from oracle states, per-step oracle states,
    free-run engine traj, free-run oracle traj)."""
    from oracles import numpy_reference as oracle

    from safe_control_gym_tpu.ops.integrators import rk4_step

    # Oracle free-running trajectory (f64 ground truth).
    x = x0.astype(np.float64)
    want_traj = []
    for t in range(steps):
        x = oracle.rk4(ofc, x, forces[t].astype(np.float64), dt)
        want_traj.append(x.copy())
    want_traj = np.stack(want_traj)

    # Teacher-forced: one engine step FROM each oracle state (batched).
    starts = np.concatenate([x0[None], want_traj[:-1]], 0)
    step1 = jax.jit(jax.vmap(lambda a, b: rk4_step(fc, a, b, dt)))
    got_steps = np.asarray(step1(jnp.asarray(starts, dtype), jnp.asarray(forces, dtype)))
    want_steps = want_traj.astype(got_steps.dtype)

    # Free-running engine trajectory (divergence context).
    def roll(x0j, fj):
        def body(xc, u):
            xc = rk4_step(fc, xc, u, dt)
            return xc, xc
        _, traj = jax.lax.scan(body, x0j, fj)
        return traj

    got_traj = np.asarray(jax.jit(roll)(jnp.asarray(x0, dtype),
                                        jnp.asarray(forces, dtype)))
    return got_steps, want_steps, got_traj, want_traj.astype(got_traj.dtype)


def main(round_no=2, steps=100):
    platform = jax.devices()[0].platform
    results = {"platform": platform, "steps": steps, "cases": {}}
    for name, fn in (("cartpole", cartpole_case), ("quad2d", quad2d_case),
                     ("quad3d", quad3d_case)):
        gs32, ws32, gt32, wt32 = fn(steps, jnp.float32)
        entry = {
            "f32_step_max_ulp": _max_ulp(gs32, ws32),
            "f32_step_max_rel": float(np.max(np.abs(gs32 - ws32)
                                             / np.maximum(np.abs(ws32), 1e-6))),
            "f32_traj_max_rel": float(np.max(np.abs(gt32 - wt32)
                                             / np.maximum(np.abs(wt32), 1e-6))),
        }
        try:
            with jax.enable_x64():
                gs64, ws64, _, _ = fn(steps, jnp.float64)
            entry["f64_step_max_ulp"] = _max_ulp(gs64, ws64)
        except Exception as e:  # backend without f64
            entry["f64_step_max_ulp"] = None
            entry["f64_note"] = str(e)[:120]
        results["cases"][name] = entry
    line = {
        "metric": "fidelity_vs_numpy_oracle",
        "platform": platform,
        **{f"{k}_{m}": v for k, case in results["cases"].items()
           for m, v in case.items() if v is not None and not isinstance(v, str)},
    }
    print(json.dumps(line))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       f"FIDELITY_r{round_no:02d}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    a, _ = p.parse_known_args()
    main(a.round, a.steps)
