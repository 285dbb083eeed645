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


def _compile(src: str, lib: str, *extra: str) -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra, src, "-o", lib],
        check=True,
        capture_output=True,
        text=True,
    )


def _build() -> None:
    _compile(_SRC, _LIB)


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


# ---------------------------------------------------------------------------
# Frame prescale (BGR -> I420 conversion + letterbox), bit-exact cv2 clones
# ---------------------------------------------------------------------------

_PRESCALE_SRC = os.path.join(_DIR, "prescale.cpp")
_PRESCALE_LIB = os.path.join(_DIR, "_prescale.so")

_prescale_lib = None
_prescale_error: str | None = None

_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load_prescale():
    global _prescale_lib, _prescale_error
    if _prescale_lib is not None or _prescale_error is not None:
        return _prescale_lib
    try:
        if not os.path.exists(_PRESCALE_LIB) or os.path.getmtime(
            _PRESCALE_LIB
        ) < os.path.getmtime(_PRESCALE_SRC):
            # -march=native is safe: the .so is rebuilt per machine on
            # source-vs-lib mtime, never shipped
            _compile(_PRESCALE_SRC, _PRESCALE_LIB, "-fopenmp", "-march=native")
        lib = ctypes.CDLL(_PRESCALE_LIB)
        lib.bgr_to_i420.restype = None
        lib.bgr_to_i420.argtypes = [_u8, _u8] + [ctypes.c_int32] * 4
        lib.letterbox_i420.restype = None
        lib.letterbox_i420.argtypes = [_u8, _u8] + [ctypes.c_int32] * 12
        _prescale_lib = lib
    except (OSError, subprocess.CalledProcessError) as e:
        _prescale_error = str(e)
    return _prescale_lib


def prescale_available() -> bool:
    return _load_prescale() is not None


def _default_threads() -> int:
    # thread pools are pure overhead on a single core (measured ~8x slower)
    return min(8, os.cpu_count() or 1)


def bgr_to_i420(frames_bgr: np.ndarray, threads: int | None = None) -> np.ndarray:
    """BGR uint8 (N, H, W, 3) -> packed I420 (N, H*3/2, W), byte-identical
    to cv2.cvtColor(COLOR_BGR2YUV_I420) per frame.  Raises RuntimeError if
    the native library cannot be built (callers fall back to cv2)."""
    lib = _load_prescale()
    if lib is None:
        raise RuntimeError(f"native prescale unavailable: {_prescale_error}")
    frames_bgr = np.ascontiguousarray(frames_bgr, dtype=np.uint8)
    n, h, w, c = frames_bgr.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0
    out = np.empty((n, h * 3 // 2, w), np.uint8)
    lib.bgr_to_i420(frames_bgr, out, n, h, w, threads or _default_threads())
    return out


def letterbox_i420(
    frames_bgr: np.ndarray,
    geom,
    y_pad: int,
    uv_pad: int,
    threads: int | None = None,
) -> np.ndarray:
    """Fused convert + letterbox: BGR uint8 (N, H, W, 3) -> packed I420
    working canvas (N, canvas_h*3/2, canvas_w), byte-identical to
    :func:`eagle_tpu.ops.preprocess.host_letterbox_i420`'s cv2 composition
    under the gate the caller checks (downscale, img_w % 32 == 0 -- see
    prescale.cpp for why the tail rounding needs 16-wide rows)."""
    lib = _load_prescale()
    if lib is None:
        raise RuntimeError(f"native prescale unavailable: {_prescale_error}")
    frames_bgr = np.ascontiguousarray(frames_bgr, dtype=np.uint8)
    n, h, w, c = frames_bgr.shape
    assert c == 3
    out = np.empty((n, geom.canvas_h * 3 // 2, geom.canvas_w), np.uint8)
    lib.letterbox_i420(
        frames_bgr,
        out,
        n,
        h,
        w,
        geom.img_h,
        geom.img_w,
        geom.pad_y,
        geom.pad_x,
        geom.canvas_h,
        geom.canvas_w,
        y_pad,
        uv_pad,
        threads or _default_threads(),
    )
    return out
