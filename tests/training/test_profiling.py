"""StepProfiler: windowed rays/sec + optional jax.profiler capture
(utils/profiling.py — the TPU-native analog of the reference's
wall-clock logger timings, SURVEY §5.1)."""
import time

import jax.numpy as jnp

from neddf_tpu.utils.profiling import StepProfiler


def test_step_profiler_window_rate(tmp_path):
    prof = StepProfiler(rays_per_step=100, window=4)
    rates = []
    for _ in range(6):
        prof.step_begin()
        time.sleep(0.01)
        rates.append(prof.step_end())
    # ~100 rays / 0.01 s = ~10k rays/s, generously bounded (CI jitter)
    assert 1_000 < rates[-1] < 100_000
    # the window caps the history length
    assert len(prof._times) <= 4


def test_step_profiler_trace_capture(tmp_path):
    trace_dir = tmp_path / "prof"
    prof = StepProfiler(
        rays_per_step=10, trace_dir=str(trace_dir), trace_start=1,
        trace_steps=2,
    )
    for _ in range(5):
        prof.step_begin()
        jnp.square(jnp.arange(8.0)).block_until_ready()
        prof.step_end()
    # a trace was captured for the [1, 3) step window
    assert trace_dir.is_dir()
    assert any(trace_dir.rglob("*"))
