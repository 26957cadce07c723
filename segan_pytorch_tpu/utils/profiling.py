"""Tracing / profiling (SURVEY §5): the reference only wall-clocks its train step
(model.py:322-324). Here: the same running-mean step timer plus real device profiling via
jax.profiler traces (viewable in TensorBoard / Perfetto) and per-step device memory stats.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax
import numpy as np


class StepTimer:
    """btime / mbtime running stats like the reference log line (model.py:343-348)."""

    def __init__(self, window: int = 200):
        self.times = []
        self.window = window
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else 0.0

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace for TensorBoard's profile plugin / Perfetto."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory usage (bytes), when the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                           if k in s}
        except Exception:
            out[str(d)] = {}
    return out
