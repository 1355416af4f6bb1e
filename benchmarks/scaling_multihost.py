"""Multi-HOST scaling-efficiency harness (BASELINE: >=90% at N>=2 hosts).

Weak scaling: constant envs-per-host, growing host count.  Each
configuration is a real multi-process cluster — ``jax.distributed`` over
TCP, env shards constructed process-locally, collectives crossing the
process boundary (the DCN path on a pod; Gloo on the CPU validation
backend).  Efficiency(N) = steps_per_sec(N) / (N * steps_per_sec(1)).

On actual pod hardware, run the worker directly on every host instead of
through the local launcher:

    JAX_COORDINATOR_ADDRESS=host0:port JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
    SCG_TEST_MODE=perf python -m safe_control_gym_tpu.parallel._multihost_worker

CPU-cluster numbers validate the program and the harness, not ICI/DCN
bandwidth — they are dominated by dispatch + Gloo latency.  The harness
prints one JSON line per host count plus a summary with the efficiency at
the largest N.

Usage: python benchmarks/scaling_multihost.py [--max-hosts 4]
       [--devices-per-host 2] [--envs-per-host 256] [--steps 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safe_control_gym_tpu.parallel import distributed

WORKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "safe_control_gym_tpu", "parallel", "_multihost_worker.py",
)


def measure(n_hosts, devices_per_host, envs_per_host, steps, port):
    results = distributed.launch_workers(
        WORKER, n_hosts, devices_per_process=devices_per_host, port=port,
        timeout=600.0,
        env_overrides={
            "SCG_TEST_MODE": "perf",
            "SCG_TEST_NUM_ENVS": str(envs_per_host * n_hosts),
            "SCG_TEST_NUM_STEPS": str(steps),
        },
    )
    for rc, out in results:
        if rc != 0:
            raise RuntimeError(f"worker failed (rc={rc}):\n{out[-3000:]}")
    for _, out in results:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_PERF "):
                return json.loads(line[len("MULTIHOST_PERF "):])
    raise RuntimeError("no perf line found")


def main(max_hosts=4, devices_per_host=2, envs_per_host=256, steps=64):
    rows, base = [], None
    n = 1
    while n <= max_hosts:
        r = measure(n, devices_per_host, envs_per_host, steps, port=52500 + n)
        if base is None:
            base = r["steps_per_sec"]
        r["scaling_efficiency"] = round(r["steps_per_sec"] / (base * n), 4)
        rows.append(r)
        print(json.dumps(r), flush=True)
        n *= 2
    print(json.dumps({
        "metric": "multihost_scaling_efficiency",
        "value": rows[-1]["scaling_efficiency"],
        "unit": "fraction",
        "hosts": rows[-1]["processes"],
        "note": "CPU-cluster validation run; pod hardware uses the same worker",
    }), flush=True)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max-hosts", type=int, default=4)
    p.add_argument("--devices-per-host", type=int, default=2)
    p.add_argument("--envs-per-host", type=int, default=256)
    p.add_argument("--steps", type=int, default=64)
    a, _ = p.parse_known_args()
    main(a.max_hosts, a.devices_per_host, a.envs_per_host, a.steps)
