"""Tracing / profiling utilities.

The reference has NO profiling beyond wall-clock prints (SURVEY.md §5:
denseunet.py:342 timing prints; the TensorBoard callback exists unused).
This module provides the TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` writing an XPlane
  trace viewable in TensorBoard/Perfetto (device timeline, HBM, MXU util);
* :class:`StepTimer` — cheap host-side step statistics (p50/p95, steps/sec,
  slices/sec/chip) that do NOT force device sync per step;
* :func:`annotate` — named TraceAnnotation scope so jit-external host phases
  (sampling, NIfTI IO, postprocess) show up on the trace alongside device ops.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that appears on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time statistics without per-step device syncs.

    Call :meth:`tick` once per dispatched step; timing buckets are host
    wall-clock between ticks, so the async dispatch queue (and therefore real
    device throughput) is what's measured once the queue saturates.
    """

    def __init__(self, window: int = 200):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self, samples_per_step: int = 1) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        n_dev = max(jax.device_count(), 1)
        return {
            "steps_per_sec": 1.0 / t.mean(),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "samples_per_sec_per_chip": samples_per_step / t.mean() / n_dev,
        }
