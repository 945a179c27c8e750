"""ctypes bridge to the native C++ host runtime (native/rt_native.cpp).

Auto-builds ``native/librtnative.so`` with make on first use when a
toolchain is present; every entry point has a pure-Python fallback (the
bridge reports unavailable rather than raising), and tests assert the two
implementations agree exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "librtnative.so")

_lib = None


class _ObjResult(ctypes.Structure):
    _fields_ = [("verts", ctypes.POINTER(ctypes.c_float)),
                ("n_verts", ctypes.c_int64),
                ("indices", ctypes.POINTER(ctypes.c_uint32)),
                ("n_idx", ctypes.c_int64)]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        src = os.path.join(_NATIVE_DIR, "rt_native.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rt_parse_obj.restype = ctypes.c_int
    lib.rt_parse_obj.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.POINTER(_ObjResult)]
    lib.rt_free.argtypes = [ctypes.c_void_p]
    lib.rt_bvh_build.restype = ctypes.c_int
    lib.rt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.rt_render_ppm.restype = ctypes.c_int64
    lib.rt_render_ppm.argtypes = [ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_char_p)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_obj(text: str):
    """-> (vertices (V,3) f32, indices (3F,) u32); raises on bridge failure
    (caller falls back)."""
    lib = _load()
    data = text.encode("utf-8")
    res = _ObjResult()
    rc = lib.rt_parse_obj(data, len(data), ctypes.byref(res))
    if rc != 0:
        raise RuntimeError("rt_parse_obj failed")
    try:
        v = np.ctypeslib.as_array(res.verts, (res.n_verts * 3,)).copy() \
            if res.n_verts else np.zeros((0,), np.float32)
        f = np.ctypeslib.as_array(res.indices, (res.n_idx,)).copy() \
            if res.n_idx else np.zeros((0,), np.uint32)
    finally:
        lib.rt_free(res.verts)
        lib.rt_free(res.indices)
    return v.astype(np.float32).reshape(-1, 3), f.astype(np.uint32)


def bvh_build(centroid3: np.ndarray, tri_lo: np.ndarray, tri_hi: np.ndarray):
    """-> (order (m,) i64, bmin (n,3) f32, bmax (n,3) f32)."""
    lib = _load()
    m = len(centroid3)
    n = 1
    while n < max(m, 1):
        n <<= 1
    centroid3 = np.ascontiguousarray(centroid3, np.float32)
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    order = np.zeros(m, np.int64)
    bmin = np.zeros((n, 3), np.float32)
    bmax = np.zeros((n, 3), np.float32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.rt_bvh_build(fp(centroid3), fp(tri_lo), fp(tri_hi), m,
                          order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                          fp(bmin), fp(bmax))
    if rc != 0:
        raise RuntimeError("rt_bvh_build failed")
    return order, bmin, bmax


def render_ppm(image: np.ndarray) -> str:
    lib = _load()
    h, w = image.shape[:2]
    img = np.ascontiguousarray(image, np.float32)
    out = ctypes.c_char_p()
    ln = lib.rt_render_ppm(img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           h, w, ctypes.byref(out))
    if ln < 0:
        raise RuntimeError("rt_render_ppm failed")
    try:
        return ctypes.string_at(out, ln).decode("ascii")
    finally:
        lib.rt_free(out)
