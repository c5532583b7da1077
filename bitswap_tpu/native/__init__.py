"""Native (C++) host runtime: build-on-demand + ctypes bindings.

The reference has no native code (SURVEY.md §2.1); its host-side hot loop —
the per-symbol big-int ANS coder — is pure Python.  Here that loop is C++
(`ans_core.cpp`), compiled once with g++ into a cached shared object and
bound via ctypes (no pybind11 in the image).  `available()` gates callers;
everything degrades to the numpy golden coder (ans/reference.py) when no
toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ans_core.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> str:
    tag = sysconfig.get_platform().replace("-", "_")
    return os.path.join(_HERE, f"_ans_core_{tag}.so")


def _build(so: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-fopenmp", _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        # retry without OpenMP (toolchains lacking libgomp)
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64 = ctypes.c_int64
    lib.bsans_encode.restype = ctypes.c_int
    lib.bsans_encode.argtypes = [u32p, i32p, u64p, u32p, i64, i64, i32p, i64]
    lib.bsans_decode.restype = ctypes.c_int
    lib.bsans_decode.argtypes = [u32p, i32p, u64p, u32p, i64, i64, i32p]
    lib.bsans_encode_lanes.restype = ctypes.c_int
    lib.bsans_encode_lanes.argtypes = [u32p, i32p, u64p, u32p, i64, i64, i64, i32p, i64]
    lib.bsans_decode_lanes.restype = ctypes.c_int
    lib.bsans_decode_lanes.argtypes = [u32p, i32p, u64p, u32p, i64, i64, i64, i32p, i64]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unbuildable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _so_path()
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
            if not _build(so):
                return None
        try:
            _LIB = _bind(ctypes.CDLL(so))
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return load() is not None
