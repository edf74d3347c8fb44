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
    """Compile to a process-unique temp name, then atomically rename into
    place: compiling with ``-o so_path`` would TRUNCATE the live library
    while other processes (multi-host streaming over a shared repo FS)
    have it mapped — overwriting their text pages — or while a third
    process is mid-CDLL of the half-written file. ``os.replace`` swaps
    the directory entry; live mappings keep the old inode."""
    src = _CSRC / "chunkloader.cpp"
    if not src.exists():
        return False
    tmp = so_path.with_name(f".{so_path.name}.{os.getpid()}.tmp")
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(src),
        "-o",
        str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
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
        try:  # older cached .so builds may predate the symbol
            lib.xs_error.restype = ctypes.c_char_p
            lib.xs_error.argtypes = [ctypes.c_void_p]
        except AttributeError:
            pass
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_chunkloader() is not None
