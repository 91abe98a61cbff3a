"""Wall-time + device-memory bracketing around a region.

TPU-native equivalent of the reference's CUDA ResourceMonitor
(utils/resource_monitor.py:7-50): wall time via time.time, memory via
jax device memory_stats() (bytes_in_use / peak_bytes_in_use when the
backend reports them; CPU reports nothing and reads as 0).
"""

from __future__ import annotations

import time
from typing import Optional

import jax


def _device_memory_mb(peak: bool = False) -> float:
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return 0.0
    key = "peak_bytes_in_use" if peak else "bytes_in_use"
    return stats.get(key, 0) / 1e6


class ResourceMonitor:
    def __init__(self, device: Optional[str] = None):
        del device  # single-process; jax picks the backend
        self._start: Optional[float] = None

    def start(self):
        self._start = time.time()

    def stop(self) -> dict:
        elapsed = time.time() - self._start if self._start is not None else 0.0
        self._start = None
        return {
            "elapsed_time": elapsed,
            "max_memory_mb": _device_memory_mb(peak=True),
        }

    def get_current_memory(self) -> float:
        return _device_memory_mb(peak=False)
