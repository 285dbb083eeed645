"""Native (C++) host-side components with build-on-import and graceful
fallback.

The device compute path is pure JAX/XLA; this package holds the host-side
native pieces mirroring the reference's native dependency roles -- today a
Jonker-Volgenant LAP solver (the reference's lapx role).  The shared
library is built on demand with the system compiler and cached next to the
sources; environments without a toolchain fall back to the pure-JAX exact
solver.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lapjv.cpp")
_LIB = os.path.join(_DIR, "_lapjv.so")

_lib = None
_build_error: str | None = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
        text=True,
    )


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.lapjv_solve.restype = ctypes.c_double
        lib.lapjv_solve.argtypes = [
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.lapjv_solve_batch.restype = None
        lib.lapjv_solve_batch.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:
        _build_error = str(e)
    return _lib


def lapjv_available() -> bool:
    return _load() is not None


def lapjv(cost: np.ndarray) -> tuple[np.ndarray, float]:
    """Solve a square LAP with the native JV solver.

    Returns (row_to_col (n,), total cost).  Raises RuntimeError when the
    native library cannot be built (callers fall back to
    :func:`eagle_tpu.ops.assignment.solve_lap`).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lapjv unavailable: {_build_error}")
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    assert cost.shape == (n, n)
    out = np.empty(n, dtype=np.int32)
    total = lib.lapjv_solve(n, cost, out)
    return out, float(total)


def lapjv_batch(costs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Solve m independent square LAPs: (m, n, n) -> ((m, n), (m,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lapjv unavailable: {_build_error}")
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    m, n, _ = costs.shape
    out = np.empty((m, n), dtype=np.int32)
    totals = np.empty(m, dtype=np.float64)
    lib.lapjv_solve_batch(m, n, costs, out, totals)
    return out, totals
