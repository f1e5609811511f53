"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock prints around
complete_scan (diff_completion_pipeline.py:200-203). Here: a step timer
with EMA throughput, and context managers around `jax.profiler` traces so
any region can be captured for TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Tracks step wall time and an exponential moving average of
    steps/sec; the bench's north-star metric is denoise steps/sec/chip."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate = None
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self, steps: int = 1) -> float:
        dt = time.perf_counter() - self._t
        r = steps / max(dt, 1e-9)
        self.rate = r if self.rate is None else (
            self.ema * self.rate + (1 - self.ema) * r)
        return dt


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside an active trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


def block_and_time(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
