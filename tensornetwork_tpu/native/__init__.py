"""Native (C++) components, bridged with ctypes.

The reference is pure Python (SURVEY.md: no native code anywhere); this
framework keeps the device-side speed path in XLA/Pallas and implements
the *host-side* combinatorial scheduler natively: an exact
optimal-contraction-order solver (DP over connected subsets, netcon
style) that extends exhaustive search from the Python branch-and-bound's
practical limit of ~8 tensors to ~20.

The shared library is compiled from ``pathsolver.cpp`` on first use and
cached next to the source; every consumer falls back to the Python
solvers when no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "pathsolver.cpp")
_LIB = os.path.join(_HERE, "libpathsolver.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.tn_optimal_order.restype = ctypes.c_int
        lib.tn_optimal_order.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def optimal_order_masks(log_adj: np.ndarray
                        ) -> Optional[Tuple[np.ndarray, float]]:
    """Exact optimal contraction order of a log10 adjacency matrix.

    Returns ``(merges, log10_cost)`` where ``merges`` is an (n-1, 2)
    int64 array of (maskA, maskB) bitmask pairs in a valid bottom-up
    order, or ``None`` when the native library is unavailable or the
    network is too large (n > 26)."""
    lib = _load()
    if lib is None:
        return None
    adj = np.ascontiguousarray(log_adj, dtype=np.float64)
    n = adj.shape[0]
    if n > 26:
        return None
    if n == 1:
        return np.zeros((0, 2), np.int64), 0.0
    pairs = np.zeros((n - 1, 2), np.int64)
    cost = ctypes.c_double(0.0)
    rc = lib.tn_optimal_order(
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(cost))
    if rc != 0:
        return None
    return pairs, float(cost.value)


def masks_to_index_pairs(merges: np.ndarray, n: int) -> np.ndarray:
    """Convert (maskA, maskB) merges to the Python solvers' convention:
    a (2, n-1) array of *current-list* index pairs (i < j), where the
    contraction result replaces position ``i`` and position ``j`` is
    deleted."""
    current = [np.int64(1) << i for i in range(n)]
    out = []
    for (ma, mb) in merges:
        i = current.index(ma)
        j = current.index(mb)
        if i > j:
            i, j = j, i
        out.append((i, j))
        current[i] = np.int64(ma | mb)
        del current[j]
    return np.asarray(out, dtype=int).T.reshape(2, -1)
