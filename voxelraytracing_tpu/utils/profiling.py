"""Tracing & profiling utilities.

The reference's observability is an fps counter and a step-count heatmap
(SURVEY §5). The TPU build adds the real tools: `jax.profiler` trace
capture, per-section host timers, device memory stats, and on-device ray
statistics reduced from TraceResults (mean/max march steps, active-lane
fraction — the wasted-lane metric SURVEY §7 calls out for the divergence
risk).
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir="/tmp/voxeltpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class FrameProfiler:
    """Named host-side section timers with rolling averages."""

    def __init__(self, window=120):
        self.window = window
        self.samples = {}

    @contextlib.contextmanager
    def section(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            buf = self.samples.setdefault(name, [])
            buf.append(dt)
            if len(buf) > self.window:
                del buf[: len(buf) - self.window]

    def summary(self):
        return {
            name: {
                "mean_ms": 1e3 * float(np.mean(buf)),
                "last_ms": 1e3 * buf[-1],
                "max_ms": 1e3 * float(np.max(buf)),
            }
            for name, buf in self.samples.items()
            if buf
        }


def ray_stats(trace_result):
    """On-device march statistics from a TraceResult/WavefrontResult."""
    steps = np.asarray(trace_result.steps)
    hit = np.asarray(trace_result.hit)
    return {
        "rays": int(steps.size),
        "hit_fraction": float(hit.mean()),
        "steps_mean": float(steps.mean()),
        "steps_max": int(steps.max()),
        "steps_p99": float(np.percentile(steps, 99)),
        # lane-waste proxy: mean/max step ratio — 1.0 means perfectly
        # uniform work per ray, small values mean divergence
        "step_uniformity": float(steps.mean() / max(int(steps.max()), 1)),
    }


def device_memory_stats():
    """Per-device HBM usage as reported by the runtime (if available)."""
    import jax

    out = []
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out.append(
                {
                    "device": str(dev),
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
            )
        else:
            out.append({"device": str(dev)})
    return out
