"""ctypes binding to the native C++ DP kernels (native/dp_core.cpp).

The CPU execution path: float64 accumulation like the reference Cython
kernel, used when no accelerator is attached and as the numeric parity
oracle for the float32 device kernels.
"""

import ctypes
from functools import lru_cache
from pathlib import Path
from typing import List, Tuple

import numpy as np


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    import sys

    repo_root = Path(__file__).resolve().parents[2]
    sys.path.insert(0, str(repo_root))
    try:
        from native.build import build_library
    finally:
        sys.path.pop(0)

    lib = ctypes.CDLL(str(build_library("dp_core")))
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.sva_dense_dp.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, f64p, i32p
    ]
    lib.sva_banded_dp.argtypes = [
        f32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        f64p, i32p, i32p, i32p,
    ]
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def dense_dp_native(costs: np.ndarray, pen: float) -> Tuple[np.ndarray, np.ndarray]:
    """(n, m) float32 costs -> (csum float64, bp int32), sizes +1."""
    costs = np.ascontiguousarray(costs, dtype=np.float32)
    n, m = costs.shape
    csum = np.empty((n + 1, m + 1), dtype=np.float64)
    bp = np.empty((n + 1, m + 1), dtype=np.int32)
    _lib().sva_dense_dp(
        _ptr(costs, ctypes.c_float), n, m, pen,
        _ptr(csum, ctypes.c_double), _ptr(bp, ctypes.c_int32),
    )
    return csum, bp


def run_banded_dp_native(
    costs: np.ndarray,
    b_offset_in: np.ndarray,
    alignment_types: List[Tuple[int, int]],
    del_penalty: float,
    x_in_size: int,
    y_in_size: int,
):
    """Same contract as ops.dp.run_banded_dp, float64 accumulation."""
    costs = np.ascontiguousarray(costs, dtype=np.float32)
    T, A, B = costs.shape
    b_off = np.ascontiguousarray(b_offset_in, dtype=np.int32)
    xo = np.ascontiguousarray([x for x, _ in alignment_types], dtype=np.int32)
    yo = np.ascontiguousarray([y for _, y in alignment_types], dtype=np.int32)

    csum = np.empty((A + 2, B), dtype=np.float64)
    xp = np.empty((A + 2, B), dtype=np.int32)
    yp = np.empty((A + 2, B), dtype=np.int32)
    b_off_out = np.empty((A + 2,), dtype=np.int32)
    _lib().sva_banded_dp(
        _ptr(costs, ctypes.c_float), _ptr(b_off, ctypes.c_int32),
        T, A, B,
        _ptr(xo, ctypes.c_int32), _ptr(yo, ctypes.c_int32),
        del_penalty, x_in_size, y_in_size,
        _ptr(csum, ctypes.c_double), _ptr(xp, ctypes.c_int32),
        _ptr(yp, ctypes.c_int32), _ptr(b_off_out, ctypes.c_int32),
    )
    return csum, xp, yp, b_off_out
