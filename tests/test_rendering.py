"""Software renderer tests (reference render path: base_aviary.py:324-410)."""

import os

import numpy as np

from safe_control_gym_tpu.utils.rendering import (
    FrameRecorder,
    render_cartpole,
    render_quadrotor,
    save_video,
)


def test_render_quadrotor_frame():
    x = np.zeros(12)
    x[4] = 1.0
    frame = render_quadrotor(
        x,
        gates=[[0.5, -1.0, 0, 0, 0, 0.8, 0]],
        obstacles=[[1.5, 0.0, 0, 0, 0, 0]],
        goal=np.array([2.0, 1.0, 1.0]),
        width=320,
        height=240,
    )
    assert frame.shape == (240, 320, 3) and frame.dtype == np.uint8
    # Scene content actually drawn (not a blank canvas).
    assert int((frame < 250).any(-1).sum()) > 1000


def test_render_quad_types():
    assert render_quadrotor([1.2, 0.0], quad_type=1, width=160, height=120).shape == (120, 160, 3)
    assert render_quadrotor([0.1, 0, 1.0, 0, 0, 0.2], quad_type=2, width=160, height=120).shape == (120, 160, 3)


def test_render_cartpole_frame():
    frame = render_cartpole([0.3, 0.0, 0.4, 0.0], width=320, height=180)
    assert frame.shape == (180, 320, 3)
    assert int((frame < 250).any(-1).sum()) > 200


def test_live_viewer_headless_fallback(tmp_path):
    """LiveViewer on a display-less host buffers frames and writes video
    (interactive path needs a real display; the fallback is the contract —
    reference GUI: base_aviary.py:150-189, sync getting_started.py:245-246)."""
    from safe_control_gym_tpu.utils.viewer import LiveViewer, sync

    v = LiveViewer(interactive=False, every=2,
                   gates=[[0.5, -1.0, 0, 0, 0, 0.8, 0]], goal=np.array([1, 1, 1.0]))
    assert not v.interactive
    for i in range(4):
        x = np.zeros(12)
        x[0], x[4] = 0.2 * i, 1.0
        v.update(x, t=i * 0.04, reward=0.5)
    assert len(v.frames) == 2
    out = v.close(save_path=str(tmp_path / "live.gif"), fps=10)
    assert out and os.path.exists(out) and os.path.getsize(out) > 0

    # sync sleeps toward the wall-clock schedule (and never negatively).
    import time

    t0 = time.time() - 0.01
    sync(2, t0, 0.02)  # target t0+0.04 -> ~30 ms sleep
    assert time.time() - t0 >= 0.04


def test_viewer_env_scene_pickup():
    """LiveViewer pulls maze geometry from an env like FrameRecorder does."""
    import jax

    from safe_control_gym_tpu.envs.quadrotor import QuadrotorConfig, make_quadrotor
    from safe_control_gym_tpu.utils.viewer import LiveViewer

    env = make_quadrotor(QuadrotorConfig(
        quad_type=3, task="traj_tracking",
        gates=[[0.5, -2.5, 0, 0, 0, -1.57, 0]],
        obstacles=[[1.5, -2.5, 0, 0, 0, 0]],
    ))
    v = LiveViewer(env=env, interactive=False)
    assert v._scene.get("gates") and v._scene.get("obstacles")
    v.update(np.zeros(12))
    assert len(v.frames) == 1
    v.close()


def test_video_and_recorder(tmp_path):
    rec = FrameRecorder(every=2, width=160, height=120)
    for i in range(6):
        x = np.zeros(12)
        x[0] = 0.1 * i
        x[4] = 1.0
        rec.capture(x)
    assert len(rec.frames) == 3
    out = rec.save(str(tmp_path / "ep.gif"), fps=5)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # MP4 request degrades gracefully to GIF when ffmpeg is absent.
    out2 = save_video(rec.frames, str(tmp_path / "ep2.mp4"), fps=5)
    assert os.path.exists(out2)
