"""Build + load the native (C++) topology kernels.

The reference gets its native compute from pre-built wheels (gudhi/CGAL,
fpsample — SURVEY §2 L1); flooder_tpu ships the C++ source and compiles it
on first use with the system toolchain. The shared library is cached next
to the sources; a failed build degrades gracefully (callers fall back to
the pure-Python reduction).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).resolve().parent
_SRCS = [_HERE / "src" / "persistence.cpp", _HERE / "src" / "flood_cpu.cpp"]
_SRC = _SRCS[0]  # kept for back-compat with older call sites
_LIB = _HERE / "_flood_native.so"

_lock = threading.Lock()
_cached: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx,
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-march=native",
        *[str(s) for s in _SRCS],
        "-o",
        str(_LIB),
    ]
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
    except Exception:
        return False
    if res.returncode != 0:
        # retry without -march=native (portability)
        cmd.remove("-march=native")
        try:
            res = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
        except Exception:
            return False
    return res.returncode == 0 and _LIB.exists()


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    with _lock:
        if _cached is not None:
            return _cached
        if not _LIB.exists() or any(
            _LIB.stat().st_mtime < s.stat().st_mtime for s in _SRCS
        ):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _failed = True
            return None
        lib.flood_reduce.restype = ctypes.c_int64
        lib.flood_reduce.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        for name, fptr in (
            ("flood_min_dist_f32", ctypes.c_float),
            ("flood_min_dist_f64", ctypes.c_double),
        ):
            try:
                fn = getattr(lib, name)
            except AttributeError:
                # stale .so without the newer symbols: keep the library
                # usable for the symbols it does have (callers feature-
                # test with hasattr)
                continue
            fn.restype = ctypes.c_int64
            p = ctypes.POINTER(fptr)
            fn.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, p, p, p, p, p, ctypes.c_int64, p,
            ]
        _cached = lib
        return lib
