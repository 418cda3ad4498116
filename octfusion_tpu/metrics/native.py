"""ctypes bindings for the C++ structural-losses library (lazy build).

Counterpart of the reference's pybind11 module
(`/root/reference/metrics/pytorch_structural_losses/pybind/bind.cpp`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _build_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc")


def load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_build_dir(), "libstructural.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _build_dir()], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.nn_distance.argtypes = [f32p, f32p, f32p, i32p, f32p, i32p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.approx_match_cost.argtypes = [f32p, f32p, f32p, f32p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def nn_distance(xyz1: np.ndarray, xyz2: np.ndarray):
    """[B,N,3] x [B,M,3] -> (dist1 [B,N], idx1, dist2 [B,M], idx2)."""
    lib = load()
    xyz1 = np.ascontiguousarray(xyz1, np.float32)
    xyz2 = np.ascontiguousarray(xyz2, np.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d1 = np.empty((b, n), np.float32)
    i1 = np.empty((b, n), np.int32)
    d2 = np.empty((b, m), np.float32)
    i2 = np.empty((b, m), np.int32)
    lib.nn_distance(_fp(xyz1), _fp(xyz2), _fp(d1), _ip(i1), _fp(d2), _ip(i2),
                    b, n, m)
    return d1, i1, d2, i2


def approx_match_cost(xyz1: np.ndarray, xyz2: np.ndarray, rounds: int = 9):
    """[B,N,3] x [B,M,3] -> (match [B,N,M], cost [B])."""
    lib = load()
    xyz1 = np.ascontiguousarray(xyz1, np.float32)
    xyz2 = np.ascontiguousarray(xyz2, np.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    match = np.empty((b, n, m), np.float32)
    cost = np.empty((b,), np.float32)
    lib.approx_match_cost(_fp(xyz1), _fp(xyz2), _fp(match), _fp(cost),
                          b, n, m, rounds)
    return match, cost
