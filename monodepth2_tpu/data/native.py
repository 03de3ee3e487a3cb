"""ctypes bindings for the native decode/resize pipeline (native/mdloader.cpp).

Auto-builds the shared library with `make -C native` on first use when a
toolchain is available; every consumer falls back to the PIL path when the
library can't be built, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libmdloader.so")
_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.md_load_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.md_load_resize.restype = ctypes.c_int
        lib.md_load_strip.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.md_load_strip.restype = ctypes.c_int
        lib.md_load_triplet_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.md_load_triplet_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_resize(path: str, width: int, height: int, channels: int) -> np.ndarray:
    """Decode + bilinear-resize one image -> (H, W, C) float32 in [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((height, width, channels), np.float32)
    rc = lib.md_load_resize(
        path.encode(), width, height, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def load_strip(
    path: str, frame_w: int, height: int, n_frames: int = 3, channels: int = 3
) -> np.ndarray:
    """Depth10k strip -> (n_frames, H, frame_w, C) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((n_frames, height, frame_w, channels), np.float32)
    got_h = ctypes.c_int(0)
    rc = lib.md_load_strip(
        path.encode(), frame_w, n_frames, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(got_h),
    )
    if rc != 0:
        raise IOError(f"native strip decode failed ({rc}): {path}")
    if got_h.value != height:
        raise IOError(f"strip height {got_h.value} != expected {height}: {path}")
    return out


def load_triplet_batch(
    paths: Sequence[str], width: int, height: int, channels: int,
    n_threads: int = 2,
) -> np.ndarray:
    """Flat list of n*3 frame paths -> (n, 3, H, W, C) float32, threaded."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths) // 3
    out = np.empty((n, 3, height, width, channels), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.md_load_triplet_batch(
        arr, n, width, height, channels, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        raise IOError(f"native batch decode: {failures} frames failed")
    return out
