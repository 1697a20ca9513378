"""ctypes loader for the native codec core (native/framecodec.cpp).

Compiles the shared library on first use with g++ (cached next to the
source); every entry point has a numpy fallback so the codec works on
machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = Path(__file__).resolve().parents[2] / "native" / "framecodec.cpp"
_SO = _SRC.with_name("libframecodec.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO),
                     str(_SRC)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_SO))
            lib.delta_encode_i16.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_float]
            lib.delta_decode_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_float]
            lib.codec_abi_version.restype = ctypes.c_int
            if lib.codec_abi_version() != 1:
                return None
            _lib = lib
        except Exception as exc:  # no toolchain / sandbox: numpy fallback
            if os.environ.get("SPATIALSIM_DEBUG"):
                print(f"[native] codec build failed: {exc}")
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def delta_encode(cur: np.ndarray, prev: np.ndarray, scale: float
                 ) -> np.ndarray:
    """Quantize (cur - prev) * scale to int16 (round-to-nearest)."""
    cur = np.ascontiguousarray(cur, np.float32)
    prev = np.ascontiguousarray(prev, np.float32)
    lib = _load()
    if lib is None:
        return np.rint((cur - prev) * scale).astype(np.int16)
    out = np.empty(cur.shape, np.int16)
    lib.delta_encode_i16(cur.ctypes.data, prev.ctypes.data,
                         out.ctypes.data, cur.size,
                         ctypes.c_float(scale))
    return out


def delta_decode(delta: np.ndarray, prev: np.ndarray, inv_scale: float
                 ) -> np.ndarray:
    """Reconstruct prev + delta * inv_scale as float32."""
    delta = np.ascontiguousarray(delta, np.int16)
    prev = np.ascontiguousarray(prev, np.float32)
    lib = _load()
    if lib is None:
        return (prev + delta.astype(np.float32) * inv_scale
                ).astype(np.float32)
    out = np.empty(prev.shape, np.float32)
    lib.delta_decode_f32(delta.ctypes.data, prev.ctypes.data,
                         out.ctypes.data, prev.size,
                         ctypes.c_float(inv_scale))
    return out
