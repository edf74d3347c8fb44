"""Build + ctypes bindings for the native C++ runtime components.

The shared library is compiled on demand from ``csrc/`` with the host
toolchain (g++) and cached next to the sources; environments without a
toolchain fall back to the pure-NumPy paths (every native component here
has one). Bindings use ctypes — no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

__all__ = ["load_chunkloader", "native_available"]

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(so_path: Path) -> bool:
    src = _CSRC / "chunkloader.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(src),
        "-o",
        str(so_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_chunkloader():
    """Return the ctypes-bound chunk loader library, or None if the native
    toolchain/sources are unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so_path = _CSRC / "libxsomchunk.so"
        if not so_path.exists():
            src = _CSRC / "chunkloader.cpp"
            if not (src.exists() and _build(so_path)):
                return None
        elif (_CSRC / "chunkloader.cpp").exists() and (
            (_CSRC / "chunkloader.cpp").stat().st_mtime > so_path.stat().st_mtime
        ):
            _build(so_path)  # refresh stale builds; keep old .so on failure
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError:
            return None
        lib.xs_open.restype = ctypes.c_void_p
        lib.xs_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.xs_acquire.restype = ctypes.POINTER(ctypes.c_float)
        lib.xs_acquire.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.xs_release.argtypes = [ctypes.c_void_p]
        lib.xs_reset.argtypes = [ctypes.c_void_p]
        lib.xs_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_chunkloader() is not None
