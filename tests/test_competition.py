"""Competition-layer tests (reference tests/test_competition/test_competition.py
runs one end-to-end episode in the software-PID mode; here we additionally
assert course completion and test the planner and MPCC directly)."""

import os

import jax
import numpy as np
import pytest
import yaml

from safe_control_gym_tpu.competition.planning import (
    CylinderObstacle,
    Limits,
    State,
    plan_time_optimal_trajectory_through_gates,
    pmm_segment,
)

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard


LEVELS = os.path.join(
    os.path.dirname(__file__), "..", "safe_control_gym_tpu", "competition", "levels"
)


def _load_level(n):
    with open(os.path.join(LEVELS, f"level{n}.yaml")) as f:
        return yaml.safe_load(f)["quadrotor_config"]


def test_pmm_segment_reaches_target():
    traj = pmm_segment(
        [0, 0, 1], [0, 0, 0], [2, 1, 1.5], [0.5, 0, 0],
        np.array([-3.0, -3.0, -3.0]), np.array([3.0, 3.0, 3.0]),
    )
    ts, ps, vs = traj.sample(50)
    np.testing.assert_allclose(ps[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(ps[-1], [2, 1, 1.5], atol=1e-3)
    np.testing.assert_allclose(vs[-1], [0.5, 0, 0], atol=1e-2)


def test_planner_through_gates_avoids_obstacles():
    gates = [(np.array([1.0, -1.0, 1.0]), 0.0), (np.array([2.0, 1.0, 1.0]), 1.57)]
    obstacle = CylinderObstacle(np.array([1.5, 0.0, 0]), 0.05, 1.05)
    traj = plan_time_optimal_trajectory_through_gates(
        State(np.array([0.0, 0.0, 1.0]), np.zeros(3)),
        State(np.array([3.0, 1.5, 1.0]), np.zeros(3)),
        gates,
        Limits(np.array([-4.0, -4.0, -4.0]), np.array([4.0, 4.0, 4.0])),
        Limits(np.array([0.5, -0.5, -3.14]), np.array([3.0, 0.5, 3.14])),
        obstacles=[obstacle],
        max_iterations=3,
    )
    ts, ps, _ = traj.sample(200)
    for g, _ in gates:
        assert np.linalg.norm(ps[:, :3] - g, axis=-1).min() < 0.1
    assert obstacle.min_distance(ps[:, :3]) > 0.0


def test_obstacle_uncertainty_plan_clears_discs():
    """Obstacle poses are only known nominally (levels 2/3 randomize them
    ±0.15 with no in-flight sighting channel): the uncertainty-aware planner
    must keep the PLANNED path out of the inflated discs, not merely satisfy
    the DP's hard tracking-margin pruning (planning.plan_with_obstacle_
    uncertainty; reference analogue: MPCC obstacle padding in
    competition/mpcc_controller.py)."""
    from safe_control_gym_tpu.competition.planning import (
        insert_obstacle_detours,
        plan_with_obstacle_uncertainty,
    )

    start = np.array([0.0, 0.0, 1.0])
    goal = np.array([4.0, 0.0, 1.0])
    wps = [(np.array([2.0, 0.0, 1.0]), 0.0)]
    # Both legs pass essentially dead-through an obstacle's nominal center.
    obstacles_xy = np.array([[1.0, 0.05], [3.0, -0.08]])
    r_safe = 0.45

    out = insert_obstacle_detours(start, goal, wps, obstacles_xy, r_safe)
    assert len(out) == len(wps) + 2  # one via per clipped leg
    for via, _ in out:
        d = np.linalg.norm(obstacles_xy - np.asarray(via)[:2], axis=-1).min()
        assert d >= r_safe - 1e-6

    traj = plan_with_obstacle_uncertainty(
        State(start, np.zeros(3)),
        State(goal, np.zeros(3)),
        wps,
        Limits(np.array([-3.0, -3.0, -3.0]), np.array([3.0, 3.0, 3.0])),
        Limits(np.array([0.5, -0.5, -0.5]), np.array([2.0, 0.5, 0.5])),
        obstacles_xy=obstacles_xy,
        r_safe=r_safe,
        obstacles=[
            CylinderObstacle(np.array([o[0], o[1], 0.0]), 0.20, 1.15)
            for o in obstacles_xy
        ],
        max_iterations=2,
        num_cone_samples=2,
    )
    assert traj is not None
    ts, ps, _ = traj.sample(300)
    d = np.linalg.norm(
        ps[:, None, :2] - obstacles_xy[None, :, :], axis=-1
    )
    # The planned path (curved PMM segments, not just chords) clears the
    # uncertainty discs; small residual tolerance matches the re-plan
    # loop's convergence threshold.
    assert d.min() > r_safe - 0.05, d.min()
    # And it still reaches the gate waypoint and the goal.
    assert np.linalg.norm(ps - wps[0][0], axis=-1).min() < 0.1
    np.testing.assert_allclose(ps[-1], goal, atol=1e-2)


def test_level0_sim_only_completes_course():
    """End-to-end level0 episode in the software-PID mode: all 4 gates,
    no collisions, positive competition reward."""
    from safe_control_gym_tpu.competition.getting_started import run

    eps = run(_load_level(0), num_episodes=1, use_firmware=False, ctrl_freq=60)
    ep = eps[0]
    assert ep["collisions"] == 0, ep
    assert ep["gates_passed"] == 4, ep
    assert ep["reward"] > 300, ep


def test_level2_sim_only_randomized_runs():
    """Level 2 adds randomized gates/inertia/disturbances — the episode must
    run end-to-end (completion not guaranteed under randomization).

    Seed pinned to a flyable spawn (re-pinned when the counter-PRNG env seed widened to 32 bits re-rolled the draws, docs/PARITY.md): level 2 randomizes init_y = -2.9 +/- 0.1
    against a hard kill boundary at y = -3 with up to 0.1 rad of random tilt
    (reference level2.yaml:38-78,136-158 has the same geometry), so a
    fraction of seeds legitimately violate within ~10 control steps — that
    spawn-roulette is part of the competition design, not a controller bug.
    """
    from safe_control_gym_tpu.competition.getting_started import run

    level = dict(_load_level(2))
    level["seed"] = 2
    eps = run(level, num_episodes=1, use_firmware=False, ctrl_freq=60)
    assert eps[0]["steps"] > 60, eps


def test_mpcc_solver_progresses():
    from safe_control_gym_tpu.competition.mpcc_controller import MPCCController

    traj = pmm_segment(
        [0, 0, 1], [0, 0, 0], [3, 0, 1], [0, 0, 0],
        np.array([-3.0, -3.0, -3.0]), np.array([3.0, 3.0, 3.0]),
    )
    mpcc = MPCCController(traj, dt=0.04, horizon=15, inner_iters=6)
    obs = np.zeros(12)
    obs[4] = 1.0  # hover at start
    theta, theta_dot = 0.0, 0.0
    for _ in range(10):
        x_next, xs, theta, theta_dot = mpcc.solve(obs, theta, theta_dot)
        obs = x_next[:12]
    assert theta > 0.05, f"no progress: theta={theta}"
    assert np.isfinite(x_next).all()


def test_competition_utils_plot_draw_thrusts(tmp_path):
    """plot_trajectory / draw_trajectory / thrusts surface parity
    (reference competition_utils.py:284-356)."""
    import types

    from safe_control_gym_tpu.competition.competition_utils import (
        draw_trajectory,
        plot_trajectory,
        thrusts,
    )

    t = np.linspace(0, 4, 50)
    rx, ry, rz = np.sin(t), np.cos(t), 1 + 0.1 * t
    wps = np.stack([rx[::10], ry[::10], rz[::10]], -1)
    paths = plot_trajectory(t, wps, rx, ry, rz, out_path=str(tmp_path / "traj.png"))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    info = {"nominal_gates_pos_and_type": [[0.5, -1.0, 0, 0, 0, 0.8, 0]],
            "nominal_obstacles_pos": [[1.5, 0, 0, 0, 0, 0]]}
    frame = draw_trajectory(info, wps, rx, ry, rz, out_path=str(tmp_path / "plan.png"))
    assert frame.shape[-1] == 3 and os.path.exists(tmp_path / "plan.png")

    ctrl = types.SimpleNamespace()
    obs = np.zeros(12)
    obs[4] = 1.0
    f = thrusts(ctrl, 1 / 30, 3.16e-10, obs, np.array([0, 0, 1.2]), np.zeros(3))
    assert f.shape == (4,) and np.all(f > 0)
    assert hasattr(ctrl, "pid_state")  # state carried for the next call


def test_level0_firmware_mpcc_completes_course():
    """End-to-end level0 with the MPCC racing stage through the 500 Hz
    firmware loop: all 4 gates, no collisions (regression for the virtual-
    progress runaway / tangent-at-rest / internal-NaN chain)."""
    from safe_control_gym_tpu.competition.getting_started import run

    eps = run(_load_level(0), num_episodes=1, use_firmware=True,
              use_mpcc=True, ctrl_freq=25)
    ep = eps[0]
    assert ep["collisions"] == 0, ep
    assert ep["gates_passed"] == 4, ep
    assert ep["reward"] > 300, ep


def test_level2_firmware_all_gates_no_collision():
    """Full level2 through the 500 Hz firmware loop with STOCK Mellinger
    gains on the SPLINE stage: all 4 gates, zero collisions.  The noise
    channels (+-0.1 N uniform force, thrust white noise) and randomized gate
    poses are active; the tuned conservative speed profile sheds cross-track
    error before each aperture."""
    from safe_control_gym_tpu.competition.getting_started import run

    level = dict(_load_level(2))
    level["seed"] = 2
    eps = run(level, num_episodes=1, use_firmware=True, use_mpcc=False,
              ctrl_freq=25)
    assert eps[0]["collisions"] == 0, eps
    assert eps[0]["gates_passed"] == 4, eps


def test_level2_firmware_mpcc_races_default_path():
    """Level2 with the DEFAULT stack — MPCC racing stage (use_mpcc defaults
    True, matching the reference where MPCC IS the racing controller,
    edit_this.py:116-138): all 4 gates, zero collisions, and strictly better
    than the spline stage (course COMPLETED with the goal-stabilization
    bonus earned, ~100 fewer steps; the spline run above needs the full
    825-step episode and scores 0).  The round-5 default pace is tuned for
    collision rate over lap time (stage_actions.StageActionMPCC defaults):
    faster settings won ~80 steps but clipped a gate frame on one
    level2 seed each in the 8-seed sweep."""
    from safe_control_gym_tpu.competition.controller import Controller
    from safe_control_gym_tpu.competition.getting_started import run

    import inspect

    assert inspect.signature(Controller.__init__).parameters["use_mpcc"].default is True

    level = dict(_load_level(2))
    level["seed"] = 2
    eps = run(level, num_episodes=1, use_firmware=True, ctrl_freq=25)
    assert eps[0]["collisions"] == 0, eps
    assert eps[0]["gates_passed"] == 4, eps
    assert eps[0]["reward"] >= 300, eps   # spline scores 0 on this seed
    assert eps[0]["steps"] < 800, eps     # completes early; spline never does


def test_multi_episode_risk_flow_level2_reckless_level3_conservative():
    """Four-episode risk-adviser flow end-to-end through getting_started.run
    (reference getting_started.py:142-316 + risk_adviser.py:40-67):

    * level2 (reseed_on_reset=True, static course) with the adviser live
      (forced_conservative off): episodes 1-2 fly CONSERVATIVE, episode 3
      goes RECKLESS and re-plans against the gate poses measured in episode
      1, and the measured-plan flag disables double-applied corrections.
    * level3 (reseed_on_reset=False, poses drift between episodes): the
      drift detector keeps EVERY episode CONSERVATIVE.
    """
    from safe_control_gym_tpu.competition.controller import Controller
    from safe_control_gym_tpu.competition.getting_started import run
    from safe_control_gym_tpu.competition.risk import RiskProfile

    advice_log = []
    plan_measured_log = []

    class AdviserController(Controller):
        def __init__(self, obs, info, **kw):
            kw["forced_conservative"] = False
            super().__init__(obs, info, **kw)
            adviser = self.risk_adviser
            orig = adviser.episode_advice

            def recording_advice():
                profile, hint = orig()
                advice_log.append((profile, len(hint)))
                return profile, hint

            adviser.episode_advice = recording_advice

        def interEpisodeLearn(self, *a, **kw):
            super().interEpisodeLearn(*a, **kw)
            plan_measured_log.append(self._plan_is_measured)

    level = dict(_load_level(2))
    level["seed"] = 2
    eps = run(level, num_episodes=4, use_firmware=True, ctrl_freq=25,
              controller_cls=AdviserController)
    # Course is static across episodes: every episode must complete.
    for e in eps:
        assert e["gates_passed"] == 4, eps
        assert e["collisions"] == 0, eps
    # Advice recorded at the END of episode k decides episode k+1:
    # end-of-ep1 -> ep2 CONSERVATIVE, end-of-ep2 -> ep3 RECKLESS (static
    # scene + measured poses), end-of-ep3 -> ep4 RECKLESS (ep3 completed).
    assert advice_log[0][0] is RiskProfile.CONSERVATIVE
    assert advice_log[1][0] is RiskProfile.RECKLESS and advice_log[1][1] == 4
    assert advice_log[2][0] is RiskProfile.RECKLESS
    # Episode 3 flies the measured re-plan (gate-correction reuse engaged).
    assert plan_measured_log[1] is True, plan_measured_log
    assert plan_measured_log[0] is False, plan_measured_log

    advice_log.clear()
    plan_measured_log.clear()
    level3 = dict(_load_level(3))
    level3["seed"] = 2
    eps3 = run(level3, num_episodes=4, use_firmware=True, ctrl_freq=25,
               controller_cls=AdviserController)
    # Poses drift between episodes: the detector must keep every episode
    # conservative (no replan from stale measurements).
    for profile, _ in advice_log:
        assert profile is RiskProfile.CONSERVATIVE, advice_log
    assert not any(plan_measured_log), plan_measured_log
    # The pinned-seed first episode still completes the course.
    assert eps3[0]["gates_passed"] == 4, eps3


def test_level3_firmware_mpcc_completes():
    """Level3 (gates/obstacles re-randomized BETWEEN episodes,
    reseed_on_reset False) raced end-to-end with the default MPCC stack on a
    pinned seed: course completion through the 500 Hz firmware loop."""
    from safe_control_gym_tpu.competition.getting_started import run

    level = dict(_load_level(3))
    level["seed"] = 2
    eps = run(level, num_episodes=1, use_firmware=True, ctrl_freq=25)
    assert eps[0]["collisions"] == 0, eps
    assert eps[0]["gates_passed"] == 4, eps
