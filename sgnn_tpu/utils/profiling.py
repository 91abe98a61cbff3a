"""Profiling hooks: jax.profiler traces + per-step throughput counters.

New scope relative to the reference (SURVEY.md §5.1 — it has only
wall-clock + CUDA-memory bracketing). Usage:

    with trace_region("train_step"):
        state, metrics = train_step(...)

    prof = StepProfiler(edges_per_step=...)
    ...
    prof.tick()            # per step
    prof.summary()         # edges/s, steps/s

Enable full XLA traces (viewable in TensorBoard / xprof) by calling
``start_trace(logdir)`` / ``stop_trace()`` around a few steps, or via the
trainer config key ``profile_dir``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_region(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepProfiler:
    """Lightweight throughput counter: steps/s and edge-updates/s."""

    def __init__(self, edges_per_step: Optional[int] = None):
        self.edges_per_step = edges_per_step
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def summary(self) -> dict:
        dt = time.perf_counter() - self._t0
        out = {
            "steps": self._steps,
            "elapsed_s": dt,
            "steps_per_s": self._steps / dt if dt > 0 else 0.0,
        }
        if self.edges_per_step:
            out["edge_updates_per_s"] = self._steps * self.edges_per_step / dt
        return out

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
