"""Interactive live viewer — the reference's PyBullet debug-GUI analogue.

The reference opens a PyBullet GUI window (``p.connect(p.GUI)``, reference
base_aviary.py:150-189), prints episode time onto it
(getting_started.py:148-151), and slows the host loop to wall-clock with
``sync`` (reference competition getting_started.py:245-246,
utils/utils.py ``sync``).  There is no raster engine here, so the live view
is the matplotlib 3D scene from :mod:`safe_control_gym_tpu.utils.rendering`
kept open in an interactive window: the static maze (gates, obstacles,
reference trajectory) is drawn once, and only the drone artists + HUD text
are redrawn per frame, which keeps updates at interactive rates.

Headless fallback: when no display backend can be brought up (the common
case on a TPU host), the viewer degrades to an offline
:class:`~safe_control_gym_tpu.utils.rendering.FrameRecorder`-style buffer —
``update`` stores RGB frames and ``close(save_path=...)`` writes the video.
Every consumer can therefore pass ``gui=True`` unconditionally.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from safe_control_gym_tpu.utils.rendering import (
    _pose_from_state,
    draw_quadrotor_drone,
    draw_quadrotor_scene,
    render_quadrotor,
    save_video,
)

__all__ = ["LiveViewer", "sync"]


def sync(i: int, start_time: float, timestep: float) -> None:
    """Sleep so step ``i`` lands at wall-clock time ``start_time + i*dt``.

    Reference ``safe_control_gym/utils/utils.py sync`` — keeps a GUI episode
    advancing in real time instead of as fast as the host loop runs.
    """
    elapsed = time.time() - start_time
    if elapsed < i * timestep:
        time.sleep(i * timestep - elapsed)


class LiveViewer:
    """Live view of a quadrotor episode.

    Parameters mirror ``FrameRecorder``: pass ``env`` to pull the maze
    (gates/obstacles/reference trajectory) from its config, or pass
    ``gates=/obstacles=/trajectory=/goal=`` explicitly.  ``every`` throttles
    to one redraw per N ``update`` calls (GUI work never touches the jitted
    hot loop; it consumes host copies of the state).

    ``interactive`` forces the mode: ``None`` (default) tries to open a
    window and silently falls back to frame buffering, ``False`` skips the
    window attempt (headless recorder).
    """

    def __init__(self, env=None, every: int = 1, interactive: Optional[bool] = None,
                 arm_scale: float = 4.0, **scene_kwargs):
        self.every = max(int(every), 1)
        self.frames: list = []
        self._count = 0
        self._arm_scale = arm_scale
        self._quad_type = int(scene_kwargs.pop("quad_type", 3))
        self._scene = dict(scene_kwargs)
        if env is not None:
            cfg = env.config
            self._quad_type = int(getattr(cfg, "quad_type", self._quad_type))
            if getattr(cfg, "gates", None):
                self._scene.setdefault("gates", list(cfg.gates))
            if getattr(cfg, "obstacles", None):
                self._scene.setdefault("obstacles", list(cfg.obstacles))
            xg = np.asarray(env.x_goal)
            if xg.ndim == 2 and xg.shape[1] >= 6:
                self._scene.setdefault("trajectory", xg[:, [0, 2, 4]])
            elif xg.ndim == 1 and xg.shape[0] >= 6:
                self._scene.setdefault("goal", xg[[0, 2, 4]])

        self._fig = None
        self._ax = None
        self._hud = None
        self._drone_artists: list = []
        if interactive or interactive is None:
            self._try_open_window(required=bool(interactive))

    # -- window management ------------------------------------------------

    def _try_open_window(self, required: bool = False) -> None:
        try:
            import matplotlib
            import matplotlib.pyplot as plt

            # A display-less host raises on window creation, not on import;
            # probe by actually building the canvas.
            if matplotlib.get_backend().lower() == "agg":
                import os

                if not os.environ.get("DISPLAY") and not required:
                    return  # stay headless without thrashing backends
                matplotlib.use("TkAgg", force=True)
            plt.ion()
            self._fig = plt.figure(figsize=(7.2, 5.4))
            self._ax = self._fig.add_subplot(projection="3d")
            draw_quadrotor_scene(self._ax, **self._scene)
            self._hud = self._ax.text2D(0.02, 0.97, "", transform=self._ax.transAxes)
            self._fig.show()
        except Exception:
            self._fig = self._ax = self._hud = None
            if required:
                raise

    @property
    def interactive(self) -> bool:
        return self._fig is not None

    # -- per-step update --------------------------------------------------

    def update(self, state_x, t: Optional[float] = None,
               reward: Optional[float] = None) -> None:
        """Show (or buffer) one frame for env state vector ``state_x``."""
        if self._count % self.every:
            self._count += 1
            return
        self._count += 1
        pos, rpy = _pose_from_state(np.asarray(state_x), self._quad_type)
        if self._fig is not None:
            import matplotlib.pyplot as plt

            for art in self._drone_artists:
                art.remove()
            self._drone_artists = draw_quadrotor_drone(
                self._ax, pos, rpy, arm_scale=self._arm_scale)
            hud = []
            if t is not None:
                hud.append(f"t = {t:6.2f} s")  # GUI clock, getting_started.py:148
            if reward is not None:
                hud.append(f"r = {reward:+.2f}")
            self._hud.set_text("   ".join(hud))
            self._fig.canvas.draw_idle()
            plt.pause(1e-3)  # flush GUI events without blocking the loop
        else:
            self.frames.append(render_quadrotor(
                np.asarray(state_x), quad_type=self._quad_type,
                arm_scale=self._arm_scale, **self._scene))

    def close(self, save_path: Optional[str] = None, fps: int = 30) -> Optional[str]:
        """Tear down the window; in headless mode optionally write the
        buffered frames to ``save_path`` (GIF/MP4) and return the path."""
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = self._ax = self._hud = None
        if save_path and self.frames:
            return save_video(self.frames, save_path, fps=fps)
        return None
