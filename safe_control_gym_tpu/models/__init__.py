"""Math & model components (reference safe_control_gym/math_and_models/)."""

from safe_control_gym_tpu.models.dynamics_model import DynamicsModel
from safe_control_gym_tpu.models.normalization import (
    normalize_angle,
    RunningMeanStd,
    MeanStdNormalizer,
    RewardStdNormalizer,
    RescaleNormalizer,
)

__all__ = [
    "DynamicsModel",
    "normalize_angle",
    "RunningMeanStd",
    "MeanStdNormalizer",
    "RewardStdNormalizer",
    "RescaleNormalizer",
]
