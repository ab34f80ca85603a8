from .schedule import DiffusionSchedule, linear_beta_schedule, cosine_beta_schedule
from .spec_transform import SpecTransform, RepetitiveTransform, MultiVarianceTransform
from . import ddpm, reflow

__all__ = [
    "DiffusionSchedule",
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "SpecTransform",
    "RepetitiveTransform",
    "MultiVarianceTransform",
    "ddpm",
    "reflow",
]
