"""ctypes bindings to the native IO library (build/libsfio.so).

Build with `make -C native`.  Falls back gracefully (callers use PIL) when
the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "build", "libsfio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sf_decode_png.restype = ctypes.c_int
    lib.sf_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.sf_free.argtypes = [ctypes.c_void_p]
    lib.sf_loader_create.restype = ctypes.c_void_p
    lib.sf_loader_get.restype = ctypes.c_int
    lib.sf_write_ply.restype = ctypes.c_long
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str) -> Optional[np.ndarray]:
    """(H, W) or (H, W, 3); uint8 or uint16. None if the lib is unavailable
    or decoding fails (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.sf_decode_png(path.encode(), ctypes.byref(out), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        return None
    n = w.value * h.value * ch.value
    if bd.value == 16:
        buf = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint16)), (n,)).copy()
    else:
        buf = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), (n,)).copy()
    lib.sf_free(out)
    if ch.value == 1:
        return buf.reshape(h.value, w.value)
    return buf.reshape(h.value, w.value, ch.value)


class NativeFrameLoader:
    """Threaded prefetching loader over (rgb, depth) PNG path pairs."""

    def __init__(self, rgb_paths, depth_paths, res_factor=2,
                 depth_to_mm=0.2, queue_depth=8, n_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native sfio library unavailable")
        self._lib = lib
        n = len(rgb_paths)
        RGB = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
        DEP = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
        self._h = lib.sf_loader_create(RGB, DEP, n, res_factor,
                                       ctypes.c_float(depth_to_mm),
                                       queue_depth, n_threads)
        self.n = n
        self.res_factor = res_factor

    def get(self, idx: int, rows: int, cols: int):
        rgb = np.empty((rows, cols, 3), np.float32)
        depth = np.empty((rows, cols), np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.sf_loader_get(
            ctypes.c_void_p(self._h), idx,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"native loader failed on frame {idx}: {rc}")
        assert (h.value, w.value) == (rows, cols), \
            f"frame {idx} decoded {h.value}x{w.value}, expected {rows}x{cols}"
        return rgb, depth

    def close(self):
        if self._h:
            self._lib.sf_loader_destroy(ctypes.c_void_p(self._h))
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_ply_native(path: str, smap, conf_threshold: float) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native sfio library unavailable")
    pos = np.ascontiguousarray(np.asarray(smap.pos), np.float32)
    conf = np.ascontiguousarray(np.asarray(smap.conf), np.float32)
    color = np.ascontiguousarray(np.asarray(smap.color), np.float32)
    normal = np.ascontiguousarray(np.asarray(smap.normal), np.float32)
    radius = np.ascontiguousarray(np.asarray(smap.radius), np.float32)
    valid = np.ascontiguousarray(np.asarray(smap.valid), np.uint8)
    n = pos.shape[0]
    c = ctypes.c_float
    return lib.sf_write_ply(
        path.encode(), n,
        pos.ctypes.data_as(ctypes.POINTER(c)),
        conf.ctypes.data_as(ctypes.POINTER(c)),
        color.ctypes.data_as(ctypes.POINTER(c)),
        normal.ctypes.data_as(ctypes.POINTER(c)),
        radius.ctypes.data_as(ctypes.POINTER(c)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        c(conf_threshold))
