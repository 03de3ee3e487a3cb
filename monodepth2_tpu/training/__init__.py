"""Training subsystem: config, multi-scale loss, jitted train step, state,
checkpoint/resume, and the epoch loop driver.

Reference: src/Monodepth.jl (Params :32-42, TrainCache :44-55, train :70-199)
and src/training.jl (train_loss :21-78). Improvements over the reference,
deliberate (SURVEY.md §5): optimizer state + step + RNG are checkpointed so
training is resumable; metrics include images/sec; everything configurable
without editing source.
"""

from .config import TrainConfig, TrainContext
from .loss import train_loss
from .state import (
    TrainState,
    create_train_state,
    make_scanned_train_step,
    make_train_step,
)

__all__ = [
    "TrainConfig",
    "TrainContext",
    "train_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_scanned_train_step",
]
