"""ctypes binding for the native async telemetry ring (native/ringlog.cpp).

Usage:
    log = RingLogger(path, record_dtype, capacity_records=1 << 16)
    log.push(record_struct_array)     # non-blocking; drops when full
    log.close()
    arr = RingLogger.read(path, record_dtype)

The record layout is a NumPy structured dtype; records are raw-memcpy'd so
the on-disk file is directly `np.fromfile`-readable. Falls back to a pure-
Python buffered writer when the native library has not been built (run
`python tools/build_native.py`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_ROOT, "native", "build", "libringlog.so")

_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            import subprocess
            import sys
            subprocess.run(
                [sys.executable, os.path.join(_ROOT, "tools",
                                              "build_native.py")],
                check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rl_create.restype = ctypes.c_void_p
    lib.rl_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                              ctypes.c_uint64]
    lib.rl_push.restype = ctypes.c_int
    lib.rl_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rl_flush.argtypes = [ctypes.c_void_p]
    lib.rl_stats.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_uint64)]
    lib.rl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class RingLogger:
    def __init__(self, path: str, record_dtype: np.dtype,
                 capacity_records: int = 1 << 16):
        self.path = path
        self.dtype = np.dtype(record_dtype)
        self._lib = _load()
        self._handle: Optional[int] = None
        self._fallback = None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if self._lib is not None:
            self._handle = self._lib.rl_create(
                path.encode(), self.dtype.itemsize, capacity_records)
        if not self._handle:
            self._fallback = open(path, "wb")

    @property
    def is_native(self) -> bool:
        return self._handle is not None and self._fallback is None

    def push(self, record) -> bool:
        rec = np.asarray(record)
        if rec.dtype != self.dtype:
            rec = rec.astype(self.dtype)
        rec = np.ascontiguousarray(rec)
        if self._fallback is not None:
            self._fallback.write(rec.tobytes())
            return True
        ok = True
        flat = rec.reshape(-1)
        for r in flat:
            buf = r.tobytes()
            ok &= bool(self._lib.rl_push(
                self._handle, ctypes.c_char_p(buf)))
        return ok

    def stats(self):
        if self._fallback is not None:
            return {"pushed": -1, "dropped": 0, "written": -1,
                    "native": False}
        out = (ctypes.c_uint64 * 3)()
        self._lib.rl_stats(self._handle, out)
        return {"pushed": int(out[0]), "dropped": int(out[1]),
                "written": int(out[2]), "native": True}

    def flush(self):
        if self._fallback is not None:
            self._fallback.flush()
        else:
            self._lib.rl_flush(self._handle)

    def close(self):
        if self._fallback is not None:
            self._fallback.close()
            self._fallback = None
        elif self._handle:
            self._lib.rl_close(self._handle)
            self._handle = None

    @staticmethod
    def read(path: str, record_dtype: np.dtype) -> np.ndarray:
        return np.fromfile(path, dtype=np.dtype(record_dtype))
