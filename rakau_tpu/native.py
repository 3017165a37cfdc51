"""ctypes bindings for the native host runtime (native/rakau_native.cpp).

Compiled on first use (g++, cached as rakau_tpu/_native.so). Provides the
fast fp64 direct-sum oracle (OpenMP), uint64 Morton encode/decode, and an
indirect radix sort — the compiled analogs of the reference's libmorton /
TBB sort / oracle layers (SURVEY.md C1/C3/C10). Falls back to None if no
toolchain is available; callers degrade to the NumPy paths."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_native.so")
_SRC = os.path.join(os.path.dirname(_HERE), "native", "rakau_native.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.morton_encode.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64)]
    lib.morton_decode.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32)]
    lib.radix_argsort_u64.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.direct_acc_pot.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.native_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def morton_encode(cells: np.ndarray, ndim: int, depth: int) -> np.ndarray:
    lib = load()
    cells = np.ascontiguousarray(cells, dtype=np.uint32)
    n = cells.shape[0]
    out = np.empty(n, dtype=np.uint64)
    lib.morton_encode(n, ndim, depth, _ptr(cells, ctypes.c_uint32),
                      _ptr(out, ctypes.c_uint64))
    return out


def morton_decode(codes: np.ndarray, ndim: int, depth: int) -> np.ndarray:
    lib = load()
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    n = codes.shape[0]
    out = np.empty((n, ndim), dtype=np.uint32)
    lib.morton_decode(n, ndim, depth, _ptr(codes, ctypes.c_uint64),
                      _ptr(out, ctypes.c_uint32))
    return out


def radix_argsort(codes: np.ndarray) -> np.ndarray:
    lib = load()
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    n = codes.shape[0]
    out = np.empty(n, dtype=np.int64)
    lib.radix_argsort_u64(n, _ptr(codes, ctypes.c_uint64),
                          _ptr(out, ctypes.c_int64))
    return out


def direct_acc_pot(pos: np.ndarray, mass: np.ndarray, eps: float = 0.0,
                   G: float = 1.0, targets: Optional[np.ndarray] = None):
    """Fast fp64 oracle; drop-in for direct.direct_acc_pot_np."""
    lib = load()
    if lib is None:
        from .direct import direct_acc_pot_np
        return direct_acc_pot_np(pos, mass, eps=eps, G=G, targets=targets)
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    mass = np.ascontiguousarray(mass, dtype=np.float64)
    n, ndim = pos.shape
    if targets is None:
        tptr = None
        nt = n
    else:
        targets = np.ascontiguousarray(targets, dtype=np.int64)
        tptr = _ptr(targets, ctypes.c_int64)
        nt = len(targets)
    acc = np.empty((nt, ndim), dtype=np.float64)
    pot = np.empty(nt, dtype=np.float64)
    lib.direct_acc_pot(n, ndim, _ptr(pos, ctypes.c_double),
                       _ptr(mass, ctypes.c_double), float(eps), float(G),
                       nt, tptr, _ptr(acc, ctypes.c_double),
                       _ptr(pot, ctypes.c_double))
    return acc, pot
