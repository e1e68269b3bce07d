"""ctypes binding to the native C++ ffmpeg decoder (native/decode.cpp).

Builds lazily on first use (``make`` in native/); falls back silently if the
toolchain or ffmpeg dev libs are absent — reader.py then uses cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtspo_decode.so"))

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
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO_PATH)
            lib.tspo_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.tspo_probe.restype = ctypes.c_int
            lib.tspo_gather.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_longlong]
            lib.tspo_gather.restype = ctypes.c_longlong
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def info(path: str):
    lib = _load()
    n = ctypes.c_longlong()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.tspo_probe(path.encode(), ctypes.byref(n), ctypes.byref(fps),
                      ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"native probe failed: {path}")
    return int(n.value), float(fps.value), int(w.value), int(h.value)


def gather(path: str, indices: np.ndarray) -> np.ndarray:
    lib = _load()
    nframes, _, w, h = info(path)
    idx = np.clip(np.asarray(indices, np.int64), 0, max(nframes - 1, 0))
    n = len(idx)
    out = np.empty((n, h, w, 3), np.uint8)
    got = lib.tspo_gather(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), out.nbytes)
    if got != n:
        raise IOError(f"native gather failed ({got}): {path}")
    return out
