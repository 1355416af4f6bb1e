"""Misc utilities (reference safe_control_gym/utils/utils.py)."""

from __future__ import annotations

import datetime
import json
import os
import random
import subprocess
import sys
import time

import numpy as np
import yaml


def read_file(path: str):
    """Load json/yaml/txt by extension (reference utils.py:41-67)."""
    ext = os.path.splitext(path)[1]
    with open(path) as f:
        if ext == ".json":
            return json.load(f)
        if ext in (".yaml", ".yml"):
            return yaml.safe_load(f)
        return f.read()


def merge_dict(base, override):
    from safe_control_gym_tpu.utils.configuration import merge_dict as _m

    return _m(base, override)


def set_seed(seed: int):
    """Seed host-side RNGs.  Device randomness is keyed (jax.random) — there
    is no global device RNG to seed, which is exactly what makes runs
    bitwise-reproducible (the reference must snapshot python/numpy/torch
    states, utils.py:91-108)."""
    random.seed(seed)
    np.random.seed(seed)


def get_random_state():
    """Host RNG snapshot (reference utils.py:91-99).  Device-side RNG state
    lives in the training-state PyTree's keys and is checkpointed with it."""
    return {"random": random.getstate(), "numpy": np.random.get_state()}


def set_random_state(state: dict):
    random.setstate(state["random"])
    np.random.set_state(state["numpy"])


def set_dir_from_config(config) -> str:
    """Materialize results/{tag}/seed{N}_{timestamp}/ with config + cmd
    provenance (reference utils.py:124-149)."""
    ts = datetime.datetime.now().strftime("%m.%d-%H.%M.%S")
    seed = config.get("seed", 0) if hasattr(config, "get") else 0
    try:
        git_hash = (
            subprocess.check_output(["git", "rev-parse", "--short", "HEAD"], stderr=subprocess.DEVNULL)
            .decode()
            .strip()
        )
    except Exception:
        git_hash = "nogit"
    run_dir = os.path.join(
        config.get("output_dir", "results"), str(config.get("tag", "temp")),
        f"seed{seed}_{ts}_{git_hash}",
    )
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(config), f)
    with open(os.path.join(run_dir, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv))
    config["output_dir"] = run_dir
    return run_dir


class sync:
    """Real-time pacing helper (reference utils.py:223-238)."""

    def __init__(self, start_time: float, timestep: float):
        self.start = start_time
        self.dt = timestep

    def __call__(self, i: int):
        elapsed = time.time() - self.start
        target = i * self.dt
        if target > elapsed:
            time.sleep(target - elapsed)
