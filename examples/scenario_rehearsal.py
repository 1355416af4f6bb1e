"""Fly a sim2real rehearsal scenario and record a video + flight log.

Counterpart of the reference's dev-sim2real workflow (each scenario dir's
``getting_started.py`` run): pick one of the 12 scenarios, fly it through
the 500 Hz firmware-in-the-loop stack, then save an RGB video and tracking
plots.

Usage:
    python examples/scenario_rehearsal.py --scenario ellipse --out /tmp/rehearsal
"""

import argparse
import os

import numpy as np

from safe_control_gym_tpu.competition.competition_utils import Command, dispatch_command
from safe_control_gym_tpu.competition.getting_started import _env_config_from_level
from safe_control_gym_tpu.competition.scenarios import SCENARIOS, ScenarioController
from safe_control_gym_tpu.controllers.firmware import FirmwareWrapper
from safe_control_gym_tpu.envs.quadrotor import make_quadrotor
from safe_control_gym_tpu.utils.rendering import FrameRecorder


def main(scenario="ellipse", out_dir="/tmp/rehearsal", ctrl_freq=30,
         firmware_freq=500, render_every=3, video=True):
    os.makedirs(out_dir, exist_ok=True)
    level = {
        "task": "stabilization",
        "task_info": {"stabilization_goal": [0, 0, 1],
                      "stabilization_goal_tolerance": 0.15},
        "episode_len_sec": 25,
        "done_on_completion": False,
    }
    env_func = lambda: make_quadrotor(
        _env_config_from_level(level, firmware_freq, firmware_freq)
    )
    wrapper = FirmwareWrapper(env_func, firmware_freq, ctrl_freq)
    env = wrapper.env

    ctrl = ScenarioController(scenario, ctrl_freq=ctrl_freq)
    rec = FrameRecorder(env, every=render_every, trajectory=ctrl.reference()) if video else None

    obs, _ = wrapper.reset(seed=0)
    action = np.asarray(env.spaces.action_low, np.float64).copy()
    errs = []
    steps = int((ctrl.scenario.trajectory_length + 9) * ctrl_freq)
    for i in range(steps):
        t = i / ctrl_freq
        command, args = ctrl.cmdFirmware(t, obs)
        if command == Command.FULLSTATE:
            pos = np.array([obs[0], obs[2], obs[4]])
            errs.append(float(np.linalg.norm(pos - np.asarray(args[0]))))
        dispatch_command(wrapper, command, args, t=t)
        obs, reward, done, info, action = wrapper.step(t, action)
        if rec is not None:
            rec.capture(np.asarray(obs))
        if command == Command.FINISHED:
            break
    errs = np.asarray(errs) if errs else np.zeros(1)
    print(f"scenario={scenario}: {len(errs)} tracked setpoints, "
          f"mean err={errs.mean():.3f} m, max={errs.max():.3f} m")
    if rec is not None and rec.frames:
        path = rec.save(os.path.join(out_dir, f"{scenario}.gif"), fps=ctrl_freq // render_every)
        print("video:", path)
    return errs


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="ellipse", choices=sorted(SCENARIOS))
    p.add_argument("--out", default="/tmp/rehearsal")
    p.add_argument("--no-video", action="store_true")
    a = p.parse_args()
    main(a.scenario, a.out, video=not a.no_video)
