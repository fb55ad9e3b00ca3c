"""ctypes bindings for the native runtime (csrc/).

The shared library is built on demand with the system C compiler and cached
next to the sources; every entry point has a pure-numpy fallback in its
caller, so the framework works without a toolchain (pybind11 is not
available in this environment — plain ctypes per the build mandate).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_ROOT, "csrc")
_SO = os.path.join(_CSRC, "libfvnative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    src = os.path.join(_CSRC, "fastio.c")
    if not os.path.exists(src):
        return None
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO, "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_CSRC, "fastio.c")
        stale = (os.path.exists(_SO) and os.path.exists(src)
                 and os.path.getmtime(_SO) < os.path.getmtime(src))
        so = _SO if os.path.exists(_SO) and not stale else _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            if _build() is None:
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
        lib.fv_load_floats.restype = ctypes.c_long
        lib.fv_load_floats.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_double),
                                       ctypes.c_long]
        lib.fv_load_ints.restype = ctypes.c_long
        lib.fv_load_ints.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_longlong),
                                     ctypes.c_long]
        lib.fv_save_floats.restype = ctypes.c_int
        lib.fv_save_floats.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_double),
                                       ctypes.c_long, ctypes.c_long]
        _lib = lib
        return _lib


def load_floats_native(path: str, count: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.float64)
    n = lib.fv_load_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        count)
    if n < 0:
        raise IOError(f"native loader failed on {path}")
    if n < count:
        out = out[:n]
    return out


def load_ints_native(path: str, count: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.int64)
    n = lib.fv_load_ints(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        count)
    if n < 0:
        raise IOError(f"native loader failed on {path}")
    if n < count:
        out = out[:n]
    return out


def save_floats_native(path: str, data: np.ndarray, single_line: bool = False) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, dtype=np.float64)
    rows, cols = (0, arr.size) if single_line or arr.ndim == 1 else arr.shape
    rc = lib.fv_save_floats(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, cols)
    return rc == 0
