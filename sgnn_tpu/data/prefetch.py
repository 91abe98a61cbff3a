"""Background host->device batch prefetching.

The reference feeds the GPU synchronously (torch DataLoader with
num_workers=0, taylor_impact_data_loader.py:290): every step pays host
batch assembly + H2D transfer on the critical path. Measured here at
reference scale that gap is ~50 ms/step (demo config, batch 16) — as
large as the compute itself.

DevicePrefetcher overlaps both: a daemon thread pulls batches from the
host iterator and stages them on device with jax.device_put (optionally
with a NamedSharding for data-parallel placement), keeping `depth`
batches in flight. jax.device_put is async — the transfer itself
overlaps with the running step — so the train loop's next() returns
device-resident arrays immediately.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


class DevicePrefetcher:
    """Iterator wrapper: background thread + device staging queue.

    Args:
      iterable: yields pytrees of host (numpy) arrays. May be infinite.
      depth: number of device-staged batches to keep in flight.
      sharding: optional jax.sharding.Sharding (e.g. NamedSharding over
        the 'data' axis) applied by device_put; None = default device.

    Use as a context manager or call close() — otherwise the daemon
    thread blocks on the full queue until process exit (harmless but
    untidy).
    """

    def __init__(
        self,
        iterable: Iterable[Any],
        depth: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        put=None,
    ):
        """`put`: optional callable(batch) -> device batch, overriding the
        default jax.device_put (e.g. parallel.data_parallel.shard_batch
        for per-leaf data-axis shardings)."""
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._put = put or (lambda b: jax.device_put(b, sharding))
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator[Any]) -> None:
        try:
            for batch in it:
                staged = self._put(batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except Exception as e:  # surface loader errors to the consumer
            self._q.put(e)
            return
        self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        # drain so the worker unblocks promptly
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
