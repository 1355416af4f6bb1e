"""ctypes bindings for the native runtime library (scg_native.cpp).

Builds the shared library on first use with g++ (pybind11 is not available
in this image; the C ABI + ctypes keeps the binding surface zero-dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scg_native.cpp")
_LIB = os.path.join(_HERE, "libscg_native.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build():
    # -march=native is opt-in (SCG_NATIVE_MARCH=1): the produced .so is then
    # not portable across machines sharing the build directory.
    flags = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
    if os.environ.get("SCG_NATIVE_MARCH") == "1":
        flags.insert(2, "-march=native")
    subprocess.check_call(flags + [_SRC, "-o", _LIB])


def available() -> bool:
    """True if the native library is loadable (builds it on first call)."""
    return _try_load() is not None


def _try_load():
    """Build/load the native library; returns None (with a one-time warning)
    when no working C++ toolchain is present — callers fall back to the
    NumPy implementations in ``_fallback`` (same f64 semantics)."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            return _load_locked()
        except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
            _lib_failed = True
            warnings.warn(
                "safe_control_gym_tpu.native: C++ toolchain unavailable "
                f"({type(e).__name__}: {e}); using the NumPy fallback "
                "implementations (slower, same semantics).",
                RuntimeWarning,
                stacklevel=3,
            )
            return None


def load():
    """Build (if needed) and load the native library; returns the ctypes CDLL.

    Raises if the toolchain is unavailable — use ``_try_load``/``available``
    for the soft path."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        return _load_locked()


def _load_locked():
        global _lib
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
    lib = _try_load()
    if lib is None:
        from safe_control_gym_tpu.native import _fallback

        return _fallback.cartpole_rollout(
            x0, forces, dt, n_sub, pole_length, pole_mass, cart_mass
        )
    x0 = np.ascontiguousarray(x0, np.float64)
    forces = np.ascontiguousarray(forces, np.float64).reshape(-1)
    T = forces.shape[0]
    out = np.empty((T + 1, 4), np.float64)
    lib.scg_cartpole_rollout(_ptr(x0), _ptr(forces), T, n_sub, dt,
                             pole_length, pole_mass, cart_mass, _ptr(out))
    return out


def quad3d_rollout(x0, thrusts, dt, n_sub, mass, j_diag):
    lib = _try_load()
    if lib is None:
        from safe_control_gym_tpu.native import _fallback

        return _fallback.quad3d_rollout(x0, thrusts, dt, n_sub, mass, j_diag)
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

    def __new__(cls, capacity: int, width: int, header: str = ""):
        if _try_load() is None:
            from safe_control_gym_tpu.native import _fallback

            return _fallback.PyFlightLogger(capacity, width, header)
        return super().__new__(cls)

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
