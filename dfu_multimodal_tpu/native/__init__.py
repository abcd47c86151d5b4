"""ctypes bindings for the native C++ fast paths (fastio.cpp, decode.cpp).

Builds the shared libraries with g++ on first use (cached next to the
source); falls back cleanly if no compiler (or libjpeg, for the decoder)
is available — callers catch ImportError/OSError and use the pure-Python
path (data/leakage.py, data/loader.py).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fastio.cpp"
_SO = _HERE / "_fastio.so"
_DECODE_SRC = _HERE / "decode.cpp"
_DECODE_SO = _HERE / "_decode.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_DECODE_LIB: Optional[ctypes.CDLL] = None


def _build(src: Path, so: Path, *extra: str) -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(src), "-o", str(so), *extra]
    try:
        proc = subprocess.run(cmd, check=False, capture_output=True)
    except OSError as exc:          # no g++ at all
        raise ImportError(f"native build unavailable: {exc}") from exc
    if proc.returncode != 0:
        # compile/link failures (e.g. missing libjpeg-dev) must surface
        # as the ImportError every fallback path catches — a raw
        # CalledProcessError would crash callers instead of degrading
        # to the pure-Python path the module docstring promises
        raise ImportError(
            f"native build failed ({' '.join(cmd)}): "
            f"{proc.stderr.decode(errors='replace')[-500:]}")


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build(_SRC, _SO)
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


def _load_decode() -> ctypes.CDLL:
    global _DECODE_LIB
    with _LOCK:
        if _DECODE_LIB is not None:
            return _DECODE_LIB
        if (not _DECODE_SO.exists()
                or _DECODE_SO.stat().st_mtime < _DECODE_SRC.stat().st_mtime):
            _build(_DECODE_SRC, _DECODE_SO, "-ljpeg")
        lib = ctypes.CDLL(str(_DECODE_SO))
        lib.decode_jpegs_resized.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.decode_jpegs_resized.restype = None
        _DECODE_LIB = lib
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


def decode_jpegs_resized(paths: Sequence[str], image_size: int,
                         threads: int = 0
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded libjpeg decode + PIL-BILINEAR-exact resize to
    ``(N, S, S, 3)`` uint8.  Returns ``(images, status)``; ``status[i]``
    is 0 on success, nonzero for files the caller must PIL-decode instead
    (non-JPEG, CMYK, corrupt).  Raises ImportError/OSError if g++ or
    libjpeg is unavailable — callers fall back to pure PIL."""
    n = len(paths)
    out = np.zeros((n, image_size, image_size, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    if n == 0:
        return out, status
    lib = _load_decode()
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.decode_jpegs_resized(
        arr, n, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads)
    return out, status
