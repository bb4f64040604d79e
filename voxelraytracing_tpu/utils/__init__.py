"""Profiling, tracing and debug tooling."""

from .profiling import FrameProfiler, device_memory_stats, device_trace, ray_stats

__all__ = ["FrameProfiler", "device_memory_stats", "device_trace", "ray_stats"]
