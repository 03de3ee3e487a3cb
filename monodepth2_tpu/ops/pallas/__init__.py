"""Pallas TPU kernels for the warp hot loop (BASELINE.json: "grid-sample warp
kernel at HBM roofline")."""

from .grid_sample_kernel import grid_sample_pallas

__all__ = ["grid_sample_pallas"]
