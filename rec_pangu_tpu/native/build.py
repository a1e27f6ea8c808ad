"""On-demand compilation + ctypes loading of the native library."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_SRC_DIR, "seqwin.cpp"),
         os.path.join(_SRC_DIR, "embplan.cpp")]
_OUT = os.path.join(_SRC_DIR, "_seqwin.so")


def _compile() -> Optional[str]:
    newest_src = max(os.path.getmtime(s) for s in _SRCS)
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= newest_src:
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS,
             "-o", _OUT],
            check=True, capture_output=True, timeout=120,
        )
        return _OUT
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.build_windows.argtypes = [
                i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i32p, f32p, i32p, i32p, f32p, ctypes.c_int32,
            ]
            lib.build_windows.restype = None
            i64 = ctypes.c_int64
            lib.build_sort_plan.argtypes = [
                i64p, i64, i64, i64, i64, i64,
                i32p, i32p, i32p, i32p, i64p, i64p,
            ]
            lib.build_sort_plan.restype = ctypes.c_int
            lib.build_cate_windows.argtypes = [
                i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i32p,
            ]
            lib.build_cate_windows.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
