"""ctypes binding for the native C++ data-path (EXR decode + decode pool).

The native library (native/: exr.cpp, pool.cpp) replaces the role of the
reference's vendored tinyexr + synchronous in-loop decode (reference:
deps/tinyexr/, src/inputs/CoFusionReader.cpp:45). Builds on demand with the
system toolchain; callers fall back to the OpenCV path when unavailable
(io/datasets/cofusion.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_LOCK = threading.Lock()

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libniceslam_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.exr_decode_file.restype = ctypes.c_int
        lib.exr_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pool_create.restype = ctypes.c_void_p
        lib.pool_create.argtypes = [ctypes.c_int]
        lib.pool_destroy.argtypes = [ctypes.c_void_p]
        lib.pool_submit.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pool_wait.restype = ctypes.c_int
        lib.pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return lib


def available() -> bool:
    return _load() is not None


def read_exr(path: str, channel: str = "") -> np.ndarray:
    """Decode one channel of a scanline EXR into float32 [H, W]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native EXR decoder unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.exr_decode_file(
        path.encode(), channel.encode() or None, None,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"EXR header decode failed ({rc}): {path}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.exr_decode_file(
        path.encode(),
        channel.encode() or None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"EXR decode failed ({rc}): {path}")
    return out


class NativeDecodePool:
    """Asynchronous multi-worker EXR decode: submit paths, collect arrays."""

    def __init__(self, n_workers: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decode pool unavailable")
        self._lib = lib
        self._pool = lib.pool_create(n_workers)
        self._bufs = {}
        self._ticket = 0

    def submit(self, path: str, shape, channel: str = "") -> int:
        h, w = shape
        buf = np.empty((h, w), np.float32)
        self._ticket += 1
        t = self._ticket
        self._bufs[t] = buf
        self._lib.pool_submit(
            self._pool,
            t,
            path.encode(),
            channel.encode() or None,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            w,
            h,
        )
        return t

    def wait(self, ticket: int) -> np.ndarray:
        rc = self._lib.pool_wait(self._pool, ticket)
        buf = self._bufs.pop(ticket)
        if rc != 0:
            raise IOError(f"native decode failed ({rc})")
        return buf

    def close(self):
        if self._pool:
            self._lib.pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
