"""ctypes binding for the native C++ audio batch engine (native/segan_io.cpp).

Auto-builds the shared library on first use when a compiler is available; all call sites
fall back to the pure-Python path when the library can't be built or a wav isn't plain
PCM16 (the native decoder intentionally handles only the reference's data format)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False
# Resolves to <repo>/native in a source checkout; SEGAN_TPU_NATIVE_DIR overrides
# for installs where the package doesn't live next to the native sources.
_NATIVE_DIR = os.environ.get(
    "SEGAN_TPU_NATIVE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))


def _build() -> Optional[str]:
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libsegan_io.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "segan_io.cpp"))
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return so if os.path.exists(so) else None
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.segan_io_create.restype = ctypes.c_void_p
    lib.segan_io_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.segan_io_destroy.argtypes = [ctypes.c_void_p]
    lib.segan_io_gather.restype = ctypes.c_int
    lib.segan_io_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.segan_io_read.restype = ctypes.c_int64
    lib.segan_io_read.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


class NativeAudioEngine:
    """Thread-pooled wav decode + normalize/preemph + slice gather."""

    def __init__(self, threads: int = 0, cache_cap: int = 512):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native segan_io library unavailable")
        self._lib = lib
        self._h = lib.segan_io_create(threads, cache_cap)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.segan_io_destroy(self._h)
        except Exception:
            pass

    def gather(self, paths: Sequence[str], begs: Sequence[int],
               ends: Sequence[int], slice_size: int, preemph: float
               ) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, slice_size), np.float32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_begs = np.ascontiguousarray(begs, np.int64)
        c_ends = np.ascontiguousarray(ends, np.int64)
        failures = self._lib.segan_io_gather(
            self._h, c_paths,
            c_begs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            c_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, slice_size, preemph,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if failures:
            raise IOError(f"native gather: {failures}/{n} decode failures")
        return out

    def read(self, path: str, preemph: float) -> np.ndarray:
        n = self._lib.segan_io_read(self._h, path.encode(), preemph, None, 0)
        if n < 0:
            raise IOError(f"native read failed: {path}")
        out = np.empty((n,), np.float32)
        got = self._lib.segan_io_read(
            self._h, path.encode(), preemph,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        assert got == n
        return out


def available() -> bool:
    return get_lib() is not None
