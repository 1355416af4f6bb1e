"""IROS-2022 competition layer (reference /root/reference/competition/).

The fork's application layer on top of the benchmark env: gates/obstacles
maze configs, time-optimal planning through gates, MPCC racing controller,
stage sequencing, and the firmware-in-the-loop main loop.
"""

from safe_control_gym_tpu.competition.competition_utils import Command
from safe_control_gym_tpu.competition.planning import (
    plan_time_optimal_trajectory_through_gates,
)
from safe_control_gym_tpu.competition.risk import (
    GateCorrector,
    RateEstimator,
    RiskAdviser,
    RiskProfile,
)
from safe_control_gym_tpu.competition.scenarios import (
    SCENARIOS,
    ScenarioController,
    make_scenario,
)

__all__ = [
    "Command",
    "plan_time_optimal_trajectory_through_gates",
    "GateCorrector",
    "RateEstimator",
    "RiskAdviser",
    "RiskProfile",
    "SCENARIOS",
    "ScenarioController",
    "make_scenario",
]
