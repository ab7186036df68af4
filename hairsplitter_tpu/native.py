"""ctypes bindings for the optional native host-runtime library.

Builds `native/libhs_native.so` on first use (g++; see native/Makefile) and
exposes the accelerated host loops. Every entry point has a pure-Python
fallback, so the engine works without a toolchain; set HS_NATIVE=0 to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def get_lib():
    """The loaded native library, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("HS_NATIVE", "1") == "0":
        return None
    so = os.path.join(_native_dir(), "libhs_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.hs_lis_monotonic.restype = ctypes.c_int64
    lib.hs_lis_monotonic.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hs_create_read_graph.restype = None
    lib.hs_create_read_graph.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.hs_chinese_whispers.restype = None
    lib.hs_chinese_whispers.argtypes = [
        ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_uint64,
    ]
    _LIB = lib
    return _LIB


def _ptr(arr, ct):
    return arr.ctypes.data_as(ctypes.POINTER(ct))


def lis_monotonic(q: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, dtype=np.int64)
    out = np.empty(q.size, dtype=np.int64)
    n = lib.hs_lis_monotonic(_ptr(q, ctypes.c_int64), q.size, _ptr(out, ctypes.c_int64))
    return out[:n]


def create_read_graph(sim: np.ndarray, diff: np.ndarray, mask: np.ndarray, error_rate: float):
    lib = get_lib()
    if lib is None:
        return None
    n = mask.size
    sim = np.ascontiguousarray(sim, dtype=np.int32)
    diff = np.ascontiguousarray(diff, dtype=np.int32)
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    adj = np.zeros((n, n), dtype=np.int8)
    lib.hs_create_read_graph(
        _ptr(sim, ctypes.c_int32),
        _ptr(diff, ctypes.c_int32),
        _ptr(m, ctypes.c_uint8),
        n,
        float(error_rate),
        _ptr(adj, ctypes.c_int8),
    )
    return adj


def chinese_whispers(adj: np.ndarray, init: np.ndarray, mask: np.ndarray, n_iters: int = 15, seed: int = 0):
    lib = get_lib()
    if lib is None:
        return None
    n = mask.size
    a = np.ascontiguousarray(adj, dtype=np.int8)
    labels = np.ascontiguousarray(init, dtype=np.int64).copy()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    lib.hs_chinese_whispers(
        _ptr(a, ctypes.c_int8),
        n,
        _ptr(labels, ctypes.c_int64),
        _ptr(m, ctypes.c_uint8),
        n_iters,
        seed,
    )
    return labels
