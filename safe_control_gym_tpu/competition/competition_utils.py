"""Competition utilities.

TPU-native counterpart of reference competition/competition_utils.py:
the firmware Command enum (:16-36), timing decorators (:250-282), and
trajectory drawing helpers.
"""

from __future__ import annotations

import time
from enum import Enum
from functools import wraps

import numpy as np


class Command(Enum):
    """High-level firmware commands (reference competition_utils.py:16-36)."""

    FINISHED = -1
    NONE = 0
    FULLSTATE = 1
    TAKEOFF = 2
    LAND = 3
    STOP = 4
    GOTO = 5
    NOTIFYSETPOINTSTOP = 6


def timing_step(fn):
    """Accumulate per-step compute time on the instance
    (reference competition_utils.py:250-264)."""

    @wraps(fn)
    def wrapped(self, *args, **kwargs):
        start = time.time()
        out = fn(self, *args, **kwargs)
        elapsed = time.time() - start
        self.interstep_learning_time = getattr(self, "interstep_learning_time", 0.0) + elapsed
        self.interstep_learning_occurrences = getattr(self, "interstep_learning_occurrences", 0) + 1
        return out

    return wrapped


def timing_ep(fn):
    """Accumulate per-episode compute time (reference :266-282)."""

    @wraps(fn)
    def wrapped(self, *args, **kwargs):
        start = time.time()
        out = fn(self, *args, **kwargs)
        self.interepisode_learning_time = time.time() - start
        return out

    return wrapped


def dispatch_command(firmware_wrapper, command: Command, args, t=None):
    """Map a Command to the firmware API (reference getting_started.py:175-190).

    FULLSTATE args may be reference-style ``[pos, vel, acc, yaw, rpy_rates]``
    (the dispatch loop appends the current time, as the reference does at
    getting_started.py:176) or carry an explicit trailing timestep.
    """
    if command == Command.FULLSTATE:
        if len(args) == 5:
            args = (*args, 0.0 if t is None else t)
        firmware_wrapper.sendFullStateCmd(*args)
    elif command == Command.TAKEOFF:
        firmware_wrapper.sendTakeoffCmd(*args)
    elif command == Command.LAND:
        firmware_wrapper.sendLandCmd(*args)
    elif command == Command.STOP:
        firmware_wrapper.sendStopCmd()
    elif command == Command.GOTO:
        firmware_wrapper.sendGotoCmd(*args)
    elif command == Command.NOTIFYSETPOINTSTOP:
        firmware_wrapper.sendNotifySetpointStop()
    elif command in (Command.NONE, Command.FINISHED):
        pass
    else:
        raise ValueError(f"unknown command {command}")


def plot_trajectory_3d(points, out_path: str):
    """Save a 3D plot of a planned trajectory (reference :284-337)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = np.asarray(points)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.plot(points[:, 0], points[:, 1], points[:, 2])
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
