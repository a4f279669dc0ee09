"""Native runtime components (C++): prefetching RGB-D dataset loader and
timestamp association, loaded via ctypes.

The shared library is built lazily with g++ on first use and cached next to
the sources (or in ``$RGBD_VO_NATIVE_CACHE``); ``available()`` reports
whether the toolchain/libpng are present so callers can fall back to the
Python/OpenCV path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "dataloader.cpp")
_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _lib_path() -> str:
    cache = os.environ.get("RGBD_VO_NATIVE_CACHE", os.path.dirname(__file__))
    return os.path.join(cache, "libvoloader.so")


def _build() -> str:
    out = _lib_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-lpng", "-lz", "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
            lib.vo_loader_open.restype = ctypes.c_void_p
            lib.vo_loader_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.vo_loader_next.restype = ctypes.c_int
            lib.vo_loader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.vo_loader_close.argtypes = [ctypes.c_void_p]
            lib.vo_associate.restype = ctypes.c_int
            lib.vo_associate.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


class NativeLoader:
    """Prefetching decoder for (rgb, depth) PNG pairs, in order.

    Replaces the synchronous per-frame ``cv::imread`` pair of the reference
    main loop (``app/run_vo.cpp:91-92``) with background decode.
    """

    def __init__(self, rgb_paths, depth_paths, width: int, height: int,
                 prefetch: int = 8, workers: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++/libpng missing?)")
        assert len(rgb_paths) == len(depth_paths)
        self._lib = lib
        self._n = len(rgb_paths)
        self._w, self._h = width, height
        enc_r = [p.encode() for p in rgb_paths]
        enc_d = [p.encode() for p in depth_paths]
        arr_r = (ctypes.c_char_p * self._n)(*enc_r)
        arr_d = (ctypes.c_char_p * self._n)(*enc_d)
        self._handle = lib.vo_loader_open(arr_r, arr_d, self._n, prefetch, workers)

    def __iter__(self):
        try:
            while True:
                rgb = np.empty((self._h, self._w, 3), np.uint8)
                depth = np.empty((self._h, self._w), np.uint16)
                idx = self._lib.vo_loader_next(
                    self._handle,
                    rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    self._w, self._h,
                )
                if idx == -1:
                    return
                if idx < 0:
                    raise IOError(f"native loader error code {idx}")
                yield idx, rgb, depth
        finally:
            self.close()

    def close(self):
        if self._handle:
            self._lib.vo_loader_close(self._handle)
            self._handle = None


def native_associate(first, second, offset: float = 0.0, max_difference: float = 0.02):
    """C++ version of the greedy timestamp association; same contract as
    :func:`rgbd_visualodometry_tpu.io.tum.associate`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    t1 = np.ascontiguousarray(list(first), np.float64)
    t2 = np.ascontiguousarray(list(second), np.float64)
    cap = min(len(t1), len(t2))
    out_i = np.empty(cap, np.int32)
    out_j = np.empty(cap, np.int32)
    n = lib.vo_associate(
        t1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(t1),
        t2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(t2),
        offset, max_difference,
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return [(int(out_i[k]), int(out_j[k])) for k in range(n)]
