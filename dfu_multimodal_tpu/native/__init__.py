"""ctypes bindings for the native C++ fast path (fastio.cpp).

Builds the shared library with g++ on first use (cached next to the source);
falls back cleanly if no compiler is available — callers catch ImportError/
OSError and use the pure-Python path (data/leakage.py).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fastio.cpp"
_SO = _HERE / "_fastio.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.sha256_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int]
        lib.sha256_files.restype = None
        lib.sha256_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
        lib.sha256_bytes.restype = None
        _LIB = lib
        return lib


def sha256_many(paths: Sequence[str], threads: int = 0) -> List[str]:
    """SHA-256 hex digests for many files ('' on IO error)."""
    lib = _load()
    n = len(paths)
    if n == 0:
        return []
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = ctypes.create_string_buffer(n * 65)
    lib.sha256_files(arr, n, out, threads)
    return [out.raw[i * 65:(i + 1) * 65].split(b"\0", 1)[0].decode()
            for i in range(n)]


def sha256_bytes(data: bytes) -> str:
    lib = _load()
    out = ctypes.create_string_buffer(65)
    lib.sha256_bytes(data, len(data), out)
    return out.value.decode()
