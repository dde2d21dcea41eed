"""ctypes bindings for the native C++ data-loading library (``native/``).

Builds ``libdmha_native.so`` on first use when a C++ toolchain is available
(`make` in ``native/``); every entry point has a pure-python fallback so the
framework works without it. The native path is the high-throughput host-side
loader: parallel wav decode + window sampling into one contiguous batch
buffer (the reference used libsndfile + DataLoader worker processes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdmha_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_SO_PATH)
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120
        )
    except Exception:
        return False
    return os.path.exists(_SO_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _try_build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.wav_read.restype = ctypes.c_long
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_length.restype = ctypes.c_long
        lib.wav_length.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.wav_read_windows.restype = None
        lib.wav_read_windows.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


_tls = threading.local()


def native_read_wav(path: str, max_seconds: float = 600.0, sample_rate_hint: int = 16000):
    """Decode one wav to mono float32; returns np.ndarray. Raises on failure.
    Signature matches what ``data.dataset.WavSource`` expects."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    max_samples = int(max_seconds * sample_rate_hint)
    # reuse a thread-local scratch buffer instead of a fresh ~40 MB per call
    buf = getattr(_tls, "buf", None)
    if buf is None or buf.shape[0] < max_samples:
        buf = np.empty((max_samples,), np.float32)
        _tls.buf = buf
    sr = ctypes.c_int(0)
    n = lib.wav_read(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        raise IOError(f"native wav decode failed: {path}")
    return buf[:n].copy()


def native_read_windows(
    paths: Sequence[str],
    window_samples: int,
    seeds: Sequence[int],
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel decode + window-sample a whole batch.

    Returns (windows (n, window) float32 zero-padded, lengths (n,) int64;
    length -1 marks a failed read).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    out = np.empty((n, window_samples), np.float32)
    lengths = np.empty((n,), np.int64)
    seeds_arr = np.asarray(list(seeds), np.uint64)
    lib.wav_read_windows(
        blob,
        n,
        window_samples,
        seeds_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    return out, lengths
