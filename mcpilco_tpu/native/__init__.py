"""Native (C++) host-side components, loaded via ctypes.

The reference's only compiled dependency is scipy's LSODA for plant
integration (simulation_class/model.py:61).  Here the equivalent is a small
C++ Dormand-Prince RK45 (ode_rk45.cpp) with the built-in plant dynamics,
compiled on first use with g++ and loaded via ctypes — no pybind11, no build
system beyond one compiler invocation.  Everything degrades gracefully to the
pure-JAX RK4 path when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ode_rk45.cpp")
_LIB = os.path.join(_HERE, "_ode_rk45.so")
_lock = threading.Lock()
_lib = None

SYSTEM_IDS = {"pendulum": 0, "cartpole": 1, "furuta": 2}


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Compile (if needed) and load the native library. Raises on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.mcpilco_integrate.restype = ctypes.c_int
        lib.mcpilco_integrate.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def integrate(system: str, x0, t0: float, t1: float, u, rtol=1e-8, atol=1e-10) -> np.ndarray:
    """Integrate one control interval with zero-order-hold input ``u``."""
    lib = load()
    # the C kernel writes in place: always own a fresh buffer so the
    # caller's array is never mutated
    x = np.array(x0, np.float64, copy=True)
    uu = np.ascontiguousarray(np.asarray(u, np.float64).reshape(-1))
    rc = lib.mcpilco_integrate(
        SYSTEM_IDS[system],
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.size,
        float(t0),
        float(t1),
        uu.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        uu.size,
        float(rtol),
        float(atol),
    )
    if rc != 0:
        raise RuntimeError(f"mcpilco_integrate failed with code {rc}")
    return x
