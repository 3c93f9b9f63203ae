"""ctypes bindings for the native threaded frame prefetcher
(native/dataloader.cpp). Builds the shared library on first use; falls
back to the pure-Python loader (utils.kitti) if no compiler is present.
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
_SRC = os.path.join(_REPO, "native", "dataloader.cpp")
_LIB = os.path.join(_REPO, "native", "libslamloader.so")
_build_lock = threading.Lock()


def build_library(force: bool = False) -> Optional[str]:
    """Compile the loader .so (idempotent). Returns path or None."""
    with _build_lock:
        if os.path.exists(_LIB) and not force:
            return _LIB
        if not os.path.exists(_SRC):
            return None
        cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
               "-lz", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
        return _LIB


def _load() -> Optional[ctypes.CDLL]:
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeFrameLoader:
    """Iterates decoded, canvas-padded float32 frames with background
    decode threads. Raises RuntimeError if the native lib can't build."""

    def __init__(self, paths: List[str], canvas_h: int, canvas_w: int,
                 ring: int = 8, threads: int = 2):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native loader unavailable (no g++/zlib?)")
        self.h, self.w = canvas_h, canvas_w
        self.n = len(paths)
        arr = (ctypes.c_char_p * self.n)(
            *[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._h = self._lib.loader_create(arr, self.n, canvas_h, canvas_w,
                                          ring, threads)
        self._buf = np.empty((canvas_h, canvas_w), np.float32)
        self._closed = False

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._closed:
            raise StopIteration
        idx = self._lib.loader_next(
            self._h, self._buf.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
        if idx == -1:
            self.close()
            raise StopIteration
        if idx == -2:
            raise IOError("native loader: frame decode failed")
        return self._buf.copy()

    def close(self):
        if not self._closed and self._h:
            self._lib.loader_destroy(self._h)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def stereo_frames(left_paths, right_paths, canvas_h, canvas_w,
                  ring: int = 8, threads: int = 2):
    """Yield (left, right) canvas pairs via two native prefetchers."""
    lt = NativeFrameLoader(left_paths, canvas_h, canvas_w, ring, threads)
    rt = NativeFrameLoader(right_paths, canvas_h, canvas_w, ring, threads)
    try:
        for l, r in zip(lt, rt):
            yield l, r
    finally:
        lt.close()
        rt.close()
