"""ctypes bindings for the native data-IO library (native/jmt_dataio.cc).

Builds the .so on first use (make -C native) and falls back to the pure
Python loaders when the toolchain/library is unavailable — the pipeline
never hard-depends on native code, it just gets faster with it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libjmtdataio.so")

_lib = None
_lock = threading.Lock()
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.jmt_decode_jpeg_batch.restype = ctypes.c_int
            lib.jmt_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.jmt_decode_wav_batch.restype = ctypes.c_int
            lib.jmt_decode_wav_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.jmt_decode_wav.restype = ctypes.c_int
            lib.jmt_decode_wav.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _c_paths(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_jpeg_batch(paths: List[str], h: int, w: int,
                      threads: int = 4) -> Optional[np.ndarray]:
    """Returns (n, h, w, 3) uint8 (failed images are zeros — the
    reference's bare-except black-frame behavior), or None if the native
    lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.uint8)
    status = (ctypes.c_int * n)()
    lib.jmt_decode_jpeg_batch(
        _c_paths(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        threads, status)
    return out


def decode_wav_batch(paths: List[str], out_len: int) -> Optional[np.ndarray]:
    """Returns (n, out_len) float32, left-zero-padded per the reference
    convention; missing/corrupt wavs stay zero. None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, out_len), np.float32)
    lib.jmt_decode_wav_batch(
        _c_paths(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len)
    return out


def decode_wav(path: str, out_len: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(out_len, np.float32)
    rc = lib.jmt_decode_wav(path.encode(),
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_float)), out_len)
    return out if rc == 0 else None
