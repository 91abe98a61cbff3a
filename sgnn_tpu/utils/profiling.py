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


def summarize_trace(logdir: str, top: int = 20) -> list[dict]:
    """Offline summary of a jax.profiler trace: per-op device time.

    Parses the newest ``*.xplane.pb`` under ``logdir`` directly (the
    tensorboard profile plugin in this environment cannot convert
    xspaces) and returns op rows sorted by total device time, plus a
    category rollup — the tool that found the layout-copy and
    search-sliver hotspots recorded in BASELINE.md.

    Returns [{name, ms, category}...] with a trailing row per category.
    Requires the tensorflow tsl protos (present wherever tensorboard
    is); raises ImportError otherwise.
    """
    import collections
    import glob
    import os
    import re

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    rows: list[dict] = []
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        agg: dict = collections.Counter()
        cat: dict = collections.Counter()
        steps = 1
        for line in plane.lines:
            if line.name == "Steps":
                steps = max(1, len(line.events))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                ms = ev.duration_ps / 1e9
                agg[name] += ms
                cat[re.split(r"[._\d]", name, 1)[0]] += ms
        for name, ms in agg.most_common(top):
            rows.append({"name": name, "ms_per_step": ms / steps, "category": "op"})
        for name, ms in cat.most_common():
            rows.append({"name": name, "ms_per_step": ms / steps, "category": "rollup"})
    return rows


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
