"""Profiling + numerical-sanitizer utilities.

The reference's observability is wall-clock timing in the logger and a
global ``torch.autograd.set_detect_anomaly(True)`` (SURVEY §5.1-5.2;
neddf/logger/base_logger.py:49-64, neddf/scripts/run.py:39). The
TPU-native equivalents:

* ``StepProfiler`` — windowed rays/sec + step-time tracker that can also
  capture a ``jax.profiler`` trace (viewable in Perfetto / TensorBoard's
  profile plugin) for a chosen step window.
* ``enable_nan_debugging`` — flips ``jax_debug_nans`` so any NaN
  produced inside a jitted computation raises at the op that made it
  (the analog of detect_anomaly, but compile-time free when off).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on NaN production inside jitted code (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


class StepProfiler:
    """Tracks rays/sec over a sliding window and optionally captures a
    device trace for steps [trace_start, trace_start + trace_steps).

    Usage:
        prof = StepProfiler(rays_per_step=512, trace_dir="log/profile",
                            trace_start=100, trace_steps=5)
        for step in ...:
            prof.step_begin()
            ... run jitted step ...
            prof.step_end()      # returns rays/sec over the window
    """

    def __init__(
        self,
        rays_per_step: int,
        window: int = 50,
        trace_dir: Optional[str] = None,
        trace_start: int = -1,
        trace_steps: int = 5,
    ) -> None:
        self.rays_per_step = rays_per_step
        self.window = window
        self.trace_dir = trace_dir
        self.trace_start = trace_start
        self.trace_steps = trace_steps
        self._times: list = []
        self._step = 0
        self._tracing = False
        self._t0 = 0.0

    @property
    def step_count(self) -> int:
        return self._step

    def step_begin(self) -> None:
        if (
            self.trace_dir is not None
            and self._step == self.trace_start
            and not self._tracing
        ):
            Path(self.trace_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        self._t0 = time.perf_counter()

    def step_end(self) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        self._step += 1
        if self._tracing and self._step >= self.trace_start + self.trace_steps:
            jax.profiler.stop_trace()
            self._tracing = False
        return self.rays_per_sec()

    def rays_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return self.rays_per_step * len(self._times) / sum(self._times)

    def mean_step_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1e3 * sum(self._times) / len(self._times)

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
