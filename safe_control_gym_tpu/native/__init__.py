"""ctypes bindings for the native runtime library (scg_native.cpp).

Builds the shared library on first use with g++ (pybind11 is not available
in this image; the C ABI + ctypes keeps the binding surface zero-dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scg_native.cpp")
_LIB = os.path.join(_HERE, "libscg_native.so")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.check_call(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _LIB]
    )


def load():
    """Build (if needed) and load the native library; returns the ctypes CDLL."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        d = ctypes.POINTER(ctypes.c_double)
        lib.scg_cartpole_rollout.argtypes = [d, d, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_double, ctypes.c_double,
                                             ctypes.c_double, ctypes.c_double, d]
        lib.scg_quad3d_rollout.argtypes = [d, d, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_double, ctypes.c_double, d, d]
        lib.scg_thrust_to_forces.argtypes = [d, ctypes.c_int, d]
        lib.scg_logger_create.restype = ctypes.c_void_p
        lib.scg_logger_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.scg_logger_destroy.argtypes = [ctypes.c_void_p]
        lib.scg_logger_append.argtypes = [ctypes.c_void_p, d, ctypes.c_int64]
        lib.scg_logger_count.argtypes = [ctypes.c_void_p]
        lib.scg_logger_count.restype = ctypes.c_int64
        lib.scg_logger_snapshot.argtypes = [ctypes.c_void_p, d]
        lib.scg_logger_snapshot.restype = ctypes.c_int64
        lib.scg_logger_flush_csv.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                             ctypes.c_char_p]
        lib.scg_logger_flush_csv.restype = ctypes.c_int
        _lib = lib
        return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cartpole_rollout(x0, forces, dt, n_sub, pole_length, pole_mass, cart_mass):
    lib = load()
    x0 = np.ascontiguousarray(x0, np.float64)
    forces = np.ascontiguousarray(forces, np.float64).reshape(-1)
    T = forces.shape[0]
    out = np.empty((T + 1, 4), np.float64)
    lib.scg_cartpole_rollout(_ptr(x0), _ptr(forces), T, n_sub, dt,
                             pole_length, pole_mass, cart_mass, _ptr(out))
    return out


def quad3d_rollout(x0, thrusts, dt, n_sub, mass, j_diag):
    lib = load()
    x0 = np.ascontiguousarray(x0, np.float64)
    thrusts = np.ascontiguousarray(thrusts, np.float64)
    j = np.ascontiguousarray(j_diag, np.float64)
    T = thrusts.shape[0]
    out = np.empty((T + 1, 12), np.float64)
    lib.scg_quad3d_rollout(_ptr(x0), _ptr(thrusts), T, n_sub, dt, mass,
                           _ptr(j), _ptr(out))
    return out


class NativeFlightLogger:
    """High-rate telemetry ring buffer (see scg_native.cpp)."""

    def __init__(self, capacity: int, width: int, header: str = ""):
        self._lib = load()
        self._h = ctypes.c_void_p(self._lib.scg_logger_create(capacity, width))
        self.width = width
        self.capacity = capacity
        self.header = header

    def append(self, records):
        rec = np.ascontiguousarray(records, np.float64).reshape(-1, self.width)
        self._lib.scg_logger_append(self._h, _ptr(rec), rec.shape[0])

    @property
    def count(self) -> int:
        return int(self._lib.scg_logger_count(self._h))

    def snapshot(self):
        n = min(self.count, self.capacity)
        out = np.empty((n, self.width), np.float64)
        if n:
            self._lib.scg_logger_snapshot(self._h, _ptr(out))
        return out

    def flush_csv(self, path: str):
        rc = self._lib.scg_logger_flush_csv(
            self._h, path.encode(), self.header.encode()
        )
        if rc != 0:
            raise IOError(f"flush_csv failed: {path}")

    def __del__(self):
        try:
            self._lib.scg_logger_destroy(self._h)
        except Exception:
            pass
