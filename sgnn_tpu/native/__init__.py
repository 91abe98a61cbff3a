"""Native (C++) host-side runtime components, loaded via ctypes.

`radius_search_host` / `max_degree_host` wrap the cell-list search in
radius_search.cc. The .so builds on demand (python -m sgnn_tpu.native.build
or automatically on first use when g++ is available); callers fall back to
the scipy implementation when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libradius_search.so"
_lib = None
_build_failed = False


def build(verbose: bool = False) -> bool:
    """Compile radius_search.cc -> libradius_search.so. Returns success."""
    global _build_failed
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_DIR / "radius_search.cc"), "-o", str(_SO),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            _build_failed = True
            return False
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if not _SO.exists():
        if _build_failed or not build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.radius_search.restype = ctypes.c_int64
    lib.radius_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.max_degree.restype = ctypes.c_int32
    lib.max_degree.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def radius_search_host(
    positions: np.ndarray,
    radius: float,
    max_neighbors: int,
    include_self: bool = True,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(senders, receivers) int64 arrays, or None if the lib is unavailable.

    Reference semantics: strict < r, per-receiver cap keeping lowest sender
    indices, receiver-sorted output.
    """
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    n, dims = pos.shape
    cap = n * max_neighbors
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    e = lib.radius_search(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, dims, ctypes.c_float(radius), max_neighbors, int(include_self),
        senders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        receivers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return senders[:e].astype(np.int64), receivers[:e].astype(np.int64)


def max_degree_host(
    positions: np.ndarray, radius: float, include_self: bool = True
) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    n, dims = pos.shape
    return int(
        lib.max_degree(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, dims, ctypes.c_float(radius), int(include_self),
        )
    )
