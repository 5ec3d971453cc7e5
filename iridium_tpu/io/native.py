"""ctypes binding for the native host IO engine (native/hostio.cpp).

Drop-in accelerated replacement for `readers.read_blocks`: a C++ reader
thread converts and prefetches blocks (double buffering) so file IO and
format conversion overlap device compute — the TPU-native equivalent of
the reference's spewer thread + SIMD convert + blocking queue
(main.c:223-284, simd_avx2.c:264-294, blocking_queue.h).

Falls back silently when the shared library has not been built
(native/build.sh).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Tuple

import numpy as np

from . import readers

_FMT = {"ci8": 0, "ci16": 1, "cf32": 2}

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                         "libhostio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hostio_open.restype = ctypes.c_void_p
    lib.hostio_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_long, ctypes.c_int]
    lib.hostio_next.restype = ctypes.c_long
    lib.hostio_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.hostio_release.argtypes = [ctypes.c_void_p]
    lib.hostio_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_blocks(path: str, block_samples: int,
                fmt: str | None = None) -> Iterator[Tuple[np.ndarray, int]]:
    """Same contract as readers.read_blocks, backed by the native engine."""
    lib = _load()
    fmt = (fmt or ("ci8" if path == "-" else readers.detect_format(path)))
    if lib is None or path == "-":
        yield from readers.read_blocks(path, block_samples, fmt)
        return
    h = lib.hostio_open(path.encode(), _FMT[fmt], block_samples, 3)
    if not h:
        raise OSError(f"hostio_open failed for {path}")
    try:
        while True:
            buf = ctypes.POINTER(ctypes.c_float)()
            n = lib.hostio_next(h, ctypes.byref(buf))
            if n < 0:
                raise OSError("hostio read error")
            if n == 0:
                return
            arr = np.ctypeslib.as_array(buf, shape=(2 * block_samples,))
            # Copy out of the engine's recycled buffer: the pipelined
            # driver keeps blocks in flight past the next read, and the
            # CPU jax backend aliases host memory on device_put, so a
            # zero-copy view here is a use-after-release. One memcpy per
            # block (~GB/s) is noise next to the upload itself.
            samples = arr.reshape(block_samples, 2).copy()
            yield samples, int(n)
            lib.hostio_release(h)
            if n < block_samples:
                return
    finally:
        lib.hostio_close(h)
