"""Native (C++) host-side audio ingest via ctypes.

Builds wavio.cpp into a shared library on first import (g++ -O3), with
a cached .so next to the source. Falls back gracefully: callers check
`available()` and use the pure-Python path when the toolchain or binary
is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wavio.cpp")
_SO = os.path.join(_HERE, "libwavio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.wavio_decode.restype = ctypes.c_int
        lib.wavio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wavio_bytes_to_f32.restype = ctypes.c_int
        lib.wavio_bytes_to_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wavio_resample_linear.restype = ctypes.c_int
        lib.wavio_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wavio_encode16.restype = ctypes.c_int64
        lib.wavio_encode16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.wavio_free.restype = None
        lib.wavio_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _take_floats(lib, ptr, n: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.wavio_free(ptr)
    return arr


def decode_wav_bytes(data: bytes) -> Tuple[np.ndarray, int, int]:
    """-> (mono float32 PCM, sample_rate, source_channels)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.wavio_decode(
        data, len(data), ctypes.byref(out), ctypes.byref(n),
        ctypes.byref(rate), ctypes.byref(ch),
    )
    if rc != 0:
        raise ValueError(f"wavio_decode failed: {rc}")
    return _take_floats(lib, out, n.value), rate.value, ch.value


_FMT = {"f32le": 0, "f64le": 1, "s16le": 2}


def bytes_to_f32(data: bytes, fmt: str = "f32le") -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wavio_bytes_to_f32(
        data, len(data), _FMT[fmt], ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise ValueError(f"wavio_bytes_to_f32 failed: {rc}")
    return _take_floats(lib, out, n.value)


def resample_linear(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wavio_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        rate_in, rate_out, ctypes.byref(out), ctypes.byref(n),
    )
    if rc != 0:
        raise ValueError(f"wavio_resample_linear failed: {rc}")
    return _take_floats(lib, out, n.value)


def encode_wav16(x: np.ndarray, rate: int) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_uint8)()
    total = lib.wavio_encode16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), rate,
        ctypes.byref(out),
    )
    if total < 0:
        raise ValueError(f"wavio_encode16 failed: {total}")
    data = bytes(np.ctypeslib.as_array(out, shape=(total,)))
    lib.wavio_free(out)
    return data
