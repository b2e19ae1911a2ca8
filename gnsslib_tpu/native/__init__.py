"""Native host-runtime kernels (C++ via ctypes) with NumPy fallbacks.

The reference links native code for its host hot paths — ka9q-fec Viterbi
(SBAS), RTKLIB CRCs, and the front-end drivers' sample-expansion loops.
This package builds the equivalents from gnsslib_native.cpp on first use
(g++, one translation unit) and exposes them behind the same signatures
as the pure-Python versions; everything degrades gracefully to NumPy if
no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gnsslib_native.cpp")
_LIB = os.path.join(_DIR, "libgnsslib_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def ensure_built(force: bool = False) -> bool:
    """Compile the shared library if missing; returns availability."""
    global _lib, _tried
    with _lock:
        if _lib is not None and not force:
            return True
        if _tried and not force:
            return _lib is not None
        _tried = True
        if force or not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                return False
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return False
        lib.v27_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.crc24q.restype = ctypes.c_uint32
        lib.crc24q.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        for name in ("unpack_rtlsdr", "unpack_gn3s_v3_2bit",
                     "unpack_gn3s_v3_4bit", "unpack_stereo_fe1",
                     "unpack_stereo_fe2"):
            getattr(lib, name).argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return True


def available() -> bool:
    return ensure_built()


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def viterbi27_decode(symbols, nbits: int):
    """Native soft Viterbi27 (equal-metric init); falls back to
    nav.viterbi.viterbi27_decode."""
    if not ensure_built():
        from ..nav.viterbi import viterbi27_decode as py
        return py(symbols, nbits)
    sym = np.ascontiguousarray(np.asarray(symbols), dtype=np.uint8)
    nsteps = len(sym) // 2
    out = np.empty(nbits, np.uint8)
    _lib.v27_decode(_u8ptr(sym), nsteps, nbits, _u8ptr(out))
    return out


def crc24q_native(data) -> int:
    if not ensure_built():
        from ..nav.bits import crc24q as py
        return py(data)
    buf = np.frombuffer(bytes(bytearray(data)), dtype=np.uint8)
    return int(_lib.crc24q(_u8ptr(np.ascontiguousarray(buf)), len(buf)))
