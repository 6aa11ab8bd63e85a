"""ctypes bindings for the native C++ runtime (native/ins_native.cpp).

Provides fast VTK base64 encoding and an asynchronous threaded file
writer. Builds lazily with g++ on first use (cached in native/build/);
every consumer falls back to pure Python when the toolchain or library
is unavailable.
"""

from __future__ import annotations

import base64
import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "ins_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libins_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SRC):
                return None
            if not os.path.exists(_LIB) or os.path.getmtime(
                _LIB
            ) < os.path.getmtime(_SRC):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _LIB,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.ins_b64_size.restype = ctypes.c_size_t
            lib.ins_b64_size.argtypes = [ctypes.c_size_t]
            lib.ins_b64_encode_vtk.restype = None
            lib.ins_b64_encode_vtk.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ]
            lib.ins_writer_create.restype = ctypes.c_void_p
            lib.ins_writer_create.argtypes = [ctypes.c_int]
            lib.ins_writer_submit.restype = None
            lib.ins_writer_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.ins_writer_flush.restype = None
            lib.ins_writer_flush.argtypes = [ctypes.c_void_p]
            lib.ins_writer_destroy.restype = None
            lib.ins_writer_destroy.argtypes = [ctypes.c_void_p]
            assert lib.ins_native_version() == 1
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def b64_vtk(arr: np.ndarray) -> str:
    """base64(uint32-length-header || bytes) for VTK DataArrays."""
    raw = np.ascontiguousarray(arr).tobytes()
    lib = _load()
    if lib is None:
        return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()
    out = ctypes.create_string_buffer(lib.ins_b64_size(len(raw)))
    lib.ins_b64_encode_vtk(raw, len(raw), out)
    return out.value.decode()


class AsyncWriter:
    """Threaded background file writer: `submit` never blocks on disk;
    `flush` waits for pending writes. Pure-Python (synchronous) fallback
    when the native library is unavailable."""

    def __init__(self, nthreads=2):
        self._lib = _load()
        self._handle = (
            self._lib.ins_writer_create(nthreads) if self._lib else None
        )

    def submit(self, path: str, data: bytes):
        if self._handle:
            self._lib.ins_writer_submit(
                self._handle, path.encode(), data, len(data)
            )
        else:
            with open(path, "wb") as f:
                f.write(data)

    def flush(self):
        if self._handle:
            self._lib.ins_writer_flush(self._handle)

    def close(self):
        if self._handle:
            self._lib.ins_writer_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
