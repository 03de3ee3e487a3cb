"""Observability utilities: visualization, depth metrics, profiling.

Reference: src/io_utils.jl (save_disparity/save_warped/get_pb) — plus the
depth-accuracy metrics and profiling hooks the reference lacks (SURVEY.md §5,6).
"""

from .viz import save_disparity, save_warped, colorize_disparity
from .metrics import depth_metrics
from .profiler import StepTimer

__all__ = [
    "save_disparity",
    "save_warped",
    "colorize_disparity",
    "depth_metrics",
    "StepTimer",
]
