"""Step timing / throughput and jax.profiler trace hooks.

The reference's only instrumentation is @time around the warmup and a
progress bar (src/Monodepth.jl:134-137,196); this adds images/sec and
on-demand XLA traces (SURVEY.md §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


class StepTimer:
    """Rolling-window step timer; images/sec via batch size."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        if not self.times:
            return float("nan")
        return sum(self.times) / len(self.times)

    def images_per_sec(self, batch_size: int) -> float:
        s = self.mean_step_s
        return batch_size / s if s > 0 else float("nan")


def jit_trace_count(fn) -> Optional[int]:
    """Number of compiled traces a jitted callable holds, or None when this
    JAX version exposes no introspection hook.

    Backs the training loop's retrace tripwire (the perf-bug guard analog of
    the reference's CUDA.allowscalar(false), src/Monodepth.jl:30): a growing
    count means input shapes/dtypes vary and every step recompiles.
    tests/test_loop.py pins this against a real jit so a JAX API rename breaks
    a test instead of silently disarming the tripwire.
    """
    get = getattr(fn, "_cache_size", None)
    if get is None:
        return None
    try:
        return int(get())
    except Exception:
        return None


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
