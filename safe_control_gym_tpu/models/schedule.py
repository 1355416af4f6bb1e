"""Parameter schedules.

TPU-native counterpart of safe_control_gym/math_and_models/schedule.py
(ConstantSchedule / LinearSchedule, stateful and checkpointable there).
Functional here: ``value = schedule(step)`` — the step lives in the training
state PyTree, so checkpoint/resume falls out for free.
"""

from __future__ import annotations

import jax.numpy as jnp


class ConstantSchedule:
    def __init__(self, val: float):
        self.val = val

    def __call__(self, step):
        return jnp.asarray(self.val)


class LinearSchedule:
    """Linear interpolation from start to end over ``steps`` steps."""

    def __init__(self, start: float, end: float, steps: int):
        self.start, self.end, self.steps = start, end, max(steps, 1)

    def __call__(self, step):
        frac = jnp.clip(step / self.steps, 0.0, 1.0)
        return self.start + frac * (self.end - self.start)
