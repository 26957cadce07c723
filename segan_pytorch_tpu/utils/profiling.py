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


# Peak dense-compute throughput per chip, FLOP/s, by PJRT device kind. Sources:
# public TPU spec sheets (bf16 MXU peak); CPU entries deliberately absent — MFU is
# only meaningful on accelerators.
_PEAK_FLOPS_BY_KIND = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_flops_per_chip() -> Optional[float]:
    """Best-effort bf16 peak FLOP/s of the current chip (None when unknown/CPU)."""
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for name, peak in _PEAK_FLOPS_BY_KIND.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one call of a jitted function, from XLA's compiled cost analysis.

    Uses the AOT path (lower -> compile hits the jit cache when the function was
    already executed with these shapes), so this is free after the first step."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], step_seconds: float,
        n_chips: int = 1) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]: achieved FLOP/s over chip peak."""
    peak = peak_flops_per_chip()
    if not flops_per_step or not peak or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / (peak * max(n_chips, 1))


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
