from neddf_tpu.utils.profiling import StepProfiler, enable_nan_debugging

__all__ = ["StepProfiler", "enable_nan_debugging"]
