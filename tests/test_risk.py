"""Risk adviser / rate estimator / gate corrector / scenario pack tests.

Scenario battery mirrors the reference's executable self-tests
(reference competition/risk_adviser.py:178-319).
"""

import numpy as np
import pytest

from safe_control_gym_tpu.competition.risk import (
    GateCorrector,
    RateEstimator,
    RiskAdviser,
    RiskProfile,
    gate_data_close,
)
from safe_control_gym_tpu.competition.scenarios import (
    SCENARIOS,
    ScenarioController,
    make_scenario,
)
from safe_control_gym_tpu.competition.competition_utils import Command

pytestmark = pytest.mark.slow  # heavyweight: excluded from the fast CI shard


DELTA = 0.01
G1 = {1: [1, 2, 3, 0, 0, 0, 0], 2: [1, 2, 3, 0, 0, 0, 0], 3: [1, 2, 3, 0, 0, 0, 0]}
G2 = {1: [1, 2, 3, 0, 0, 0, 0], 2: [1, 2 + DELTA, 3, 0, 0, 0, 0], 3: [1, 2, 3, 0, 0, 0, 0]}
G3 = {1: [1, 2, 3, 0, 0, 0, 0], 2: [1, 2, 3, 0, 0, 0, 0], 3: [1, 2, 3 + DELTA, 0, 0, 0, 0]}
G4 = {1: [1, 2, 3, 0, 0, 0, 0], 2: [1, 2, 3, 0, 0, 0, 0], 3: [1, 2, 3, 0, 0, 0, 0]}


def test_gate_data_close():
    gates = [G1, G2, G3, G4]
    # Pairwise truth table from the reference battery (risk_adviser.py:153-171).
    expected = {
        (0, 0): True, (0, 1): False, (0, 2): False, (0, 3): True,
        (1, 1): True, (1, 2): False, (1, 3): False,
        (2, 2): True, (2, 3): False, (3, 3): True,
    }
    for (i, j), want in expected.items():
        assert gate_data_close(gates[i], gates[j]) is want
        assert gate_data_close(gates[j], gates[i]) is want
    assert gate_data_close(G4, {}) is False
    assert gate_data_close({}, {}) is True


def _run_case(episode_results, forced=False):
    adviser = RiskAdviser(forced_conservative_mode=forced)
    advice = []
    for results in episode_results:
        advice.append(adviser.episode_advice())
        adviser.episode_results(*results)
    return zip(*advice)


def test_vanilla_level0():
    profiles, hints = _run_case([(True, G1, G1)] * 4)
    assert list(profiles) == [RiskProfile.CONSERVATIVE, RiskProfile.CONSERVATIVE,
                              RiskProfile.RECKLESS, RiskProfile.RECKLESS]
    assert hints[0] == {} and hints[1] == {}
    assert gate_data_close(hints[2], G1) and gate_data_close(hints[3], G1)


def test_level0_all_crashes():
    profiles, hints = _run_case([(False, G1, G1)] * 4)
    assert list(profiles) == [RiskProfile.CONSERVATIVE, RiskProfile.CONSERVATIVE,
                              RiskProfile.RECKLESS, RiskProfile.CONSERVATIVE]
    assert hints[3] == {}


def test_level2_static_offsets():
    profiles, hints = _run_case([(True, G1, G2)] * 4)
    assert list(profiles) == [RiskProfile.CONSERVATIVE, RiskProfile.CONSERVATIVE,
                              RiskProfile.RECKLESS, RiskProfile.RECKLESS]
    assert gate_data_close(hints[2], G2) and gate_data_close(hints[3], G2)


def test_level2_crash_on_ep3():
    profiles, hints = _run_case(
        [(True, G1, G2), (True, G1, G2), (False, G1, G2), (True, G1, G2)])
    assert list(profiles)[3] == RiskProfile.CONSERVATIVE
    assert hints[3] == {}


def test_level3_randomized_between_episodes():
    profiles, hints = _run_case(
        [(True, G1, G2), (True, G1, G3), (True, G1, G4), (True, G1, G3)])
    assert all(p == RiskProfile.CONSERVATIVE for p in profiles)
    assert all(h == {} for h in hints)


def test_forced_conservative():
    profiles, hints = _run_case([(True, G1, G2)] * 8, forced=True)
    assert all(p == RiskProfile.CONSERVATIVE for p in profiles)
    assert all(h == {} for h in hints)


def test_too_many_episodes_falls_back_conservative():
    profiles, _ = _run_case([(True, G1, G1)] * 6)
    assert list(profiles)[4:] == [RiskProfile.CONSERVATIVE] * 2


def test_rate_estimator_velocity():
    est = RateEstimator(dt=0.1)
    v0, w0 = est.estimate([0.0, 0.0, 1.0], [0.0, 0.0, 0.0])
    assert np.allclose(v0, 0.0)  # first call: no history
    v1, w1 = est.estimate([0.1, -0.2, 1.0], [0.0, 0.0, 0.0])
    assert np.allclose(v1, [1.0, -2.0, 0.0])
    # Body rates ship disabled (reference rate_estimator.py:83).
    assert np.allclose(w1, 0.0)
    est.reset()
    v2, _ = est.estimate([5.0, 5.0, 5.0], [0.0, 0.0, 0.0])
    assert np.allclose(v2, 0.0)


def test_rate_estimator_body_rates_enabled():
    est = RateEstimator(dt=0.02, body_rates_enabled=True)
    est.estimate([0.0, 0.0, 1.0], [0.0, 0.0, 0.0])
    _, w = est.estimate([0.0, 0.0, 1.0], [0.02, 0.0, 0.0])
    # Roll-rate motion shows up on p (IIR-scaled), yaw rate zeroed.
    assert w[0] > 0.0 and abs(w[2]) < 1e-12


def test_gate_corrector_nominal_then_exact():
    gc = GateCorrector(gate_heights={0: 1.0, 1: 0.525})
    snap = gc.update({})  # no gate info at all
    assert snap["next_gate_location_is_fuzzy"] is True
    assert np.allclose(snap["next_gate_correction"], 0.0)
    # First sighting out of range -> nominal pose.
    gc.update({"current_target_gate_id": 0, "current_target_gate_type": 0,
               "current_target_gate_in_range": False,
               "current_target_gate_pos": [1.0, 2.0, 0, 0, 0, 0.5]})
    assert 0 in gc.nominal and 0 not in gc.exact
    # In range -> exact pose; correction = exact - nominal.
    snap = gc.update({"current_target_gate_id": 0, "current_target_gate_type": 0,
                      "current_target_gate_in_range": True,
                      "current_target_gate_pos": [1.1, 2.05, 0, 0, 0, 0.5]})
    assert np.allclose(snap["next_gate_correction"], [0.1, 0.05, 0.0])
    assert snap["next_gate_location_is_fuzzy"] is False
    assert np.allclose(snap["next_gate_location"], [1.0, 2.0, 1.0])
    # Advancing to gate 1 rolls gate 0 into prev.
    snap = gc.update({"current_target_gate_id": 1, "current_target_gate_type": 1,
                      "current_target_gate_in_range": False,
                      "current_target_gate_pos": [3.0, 4.0, 0, 0, 0, 0.0]})
    assert np.allclose(snap["prev_gate_correction"], [0.1, 0.05, 0.0])
    assert np.allclose(snap["next_gate_location"], [3.0, 4.0, 0.525])


ALL_SCENARIOS = sorted(SCENARIOS)


def test_scenario_pack_complete():
    # The reference ships 12 rehearsal scenarios (dev-sim2real/).
    assert len(ALL_SCENARIOS) == 12


@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_scenario_reference_finite_and_bounded(name):
    sc = make_scenario(name)
    rx, ry, rz, rp = sc.generate(30)
    for arr in (rx, ry, rz, rp):
        assert np.all(np.isfinite(arr))
        assert len(arr) > 10
    if sc.command_mode == "full_state":
        assert np.all(np.abs(np.stack([rx, ry])) < 5.0)
        assert np.all(rz > -0.1) and np.all(rz < 3.0)


def test_scenario_controller_staging():
    ctrl = ScenarioController("ellipse", ctrl_freq=30)
    cmd, args = ctrl.cmdFirmware(0.0)
    assert cmd == Command.TAKEOFF
    # During tracking: full-state commands following the reference samples.
    cmd, args = ctrl.cmdFirmware(3.5)
    assert cmd == Command.FULLSTATE
    step = int(3.5 * 30) - 3 * 30
    assert np.allclose(args[0], [ctrl.ref_x[step], ctrl.ref_y[step], ctrl.ref_z[step]])
    # Past the end: land then finish.
    length = ctrl.scenario.trajectory_length
    saw = set()
    for it in range(int((length + 9) * 30)):
        cmd, _ = ctrl.cmdFirmware(it / 30)
        saw.add(cmd)
    assert Command.NOTIFYSETPOINTSTOP in saw
    assert Command.LAND in saw
    assert Command.FINISHED in saw


def test_controller_replans_on_reckless_advice():
    """Episode 3 on a static-offset course: the adviser turns RECKLESS and the
    controller re-plans against the measured gate poses (reference
    ek_controller_impl.py:119-127)."""
    from safe_control_gym_tpu.competition.controller import Controller

    info = {
        "ctrl_freq": 25,
        "ctrl_timestep": 1 / 25,
        "nominal_gates_pos_and_type": [
            [0.5, -1.0, 0, 0, 0, 0.0, 0],
            [1.5, 0.0, 0, 0, 0, 1.2, 1],
        ],
        "nominal_obstacles_pos": [],
        "x_reference": np.asarray([2.0, 0, 1.0, 0, 1.0, 0]),
        "gate_dimensions": {"tall": {"shape": "square", "height": 1.0},
                            "low": {"shape": "square", "height": 0.525}},
    }
    obs0 = np.zeros(12)
    ctrl = Controller(obs0, info, use_firmware=True, forced_conservative=False)
    traj0 = ctrl.flight_traj

    # Simulate two completed episodes whose measured (exact) gate poses are
    # offset from nominal but static between episodes (level-2 conditions).
    nominal = {0: (0.5, -1.0, 1.0, 0, 0, 0.0, 0), 1: (1.5, 0.0, 0.525, 0, 0, 1.2, 1)}
    exact = {0: (0.62, -0.9, 1.0, 0, 0, 0.0, 0), 1: (1.38, 0.08, 0.525, 0, 0, 1.2, 1)}
    for _ in range(2):
        ctrl.gate_corrector.nominal = dict(nominal)
        ctrl.gate_corrector.exact = dict(exact)
        ctrl._last_task_completed = True
        ctrl.interEpisodeLearn()
    # After 2 episodes the adviser advice for episode 3 is RECKLESS with the
    # measured map, and interEpisodeLearn already re-planned against it.
    from safe_control_gym_tpu.competition.risk import RiskProfile

    profile, hint = ctrl.risk_adviser.episode_advice()
    assert profile is RiskProfile.RECKLESS
    assert set(hint) == {0, 1}
    assert ctrl.flight_traj is not traj0
    assert len(ctrl._plan_cache) == 1
    # The re-planned path threads the *measured* gate aperture: it passes
    # near the exact gate-0 center, not the nominal one.
    ts, ps, _ = ctrl.flight_traj.sample(400)
    d_exact = np.linalg.norm(ps[:, :3] - np.array([0.62, -0.9, 1.0]), axis=-1).min()
    assert d_exact < 0.15, d_exact


def test_parametric_scenario_freq_invariant():
    """The flown curve must be identical in *time* regardless of ctrl_freq:
    sample k at freq f corresponds to t = k/f, and positions at equal t match."""
    sc = make_scenario("lissajous")
    r30 = sc.generate(30)
    r60 = sc.generate(60)
    assert abs(len(r60[0]) - 2 * len(r30[0])) <= 2  # float-truncation slack
    k = min(len(r30[0]), len(r60[0]) // 2)
    # Every 30 Hz sample has a 60 Hz twin at the same flight time.
    for a30, a60 in zip(r30[:3], r60[:3]):
        np.testing.assert_allclose(a30[:k], a60[::2][:k], rtol=1e-12)
