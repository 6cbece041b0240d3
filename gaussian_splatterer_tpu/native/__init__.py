"""Native C++ host runtime: fast file parsers loaded via ctypes.

Built on demand with g++ (``python -m gaussian_splatterer_tpu.native.build``
or automatically on first import when a compiler is available).  Pure-Python
fallbacks live in io/; every native entry point is optional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src", "parsers.cpp")
_LIB = os.path.join(_DIR, f"libgstparsers-{sys.implementation.cache_tag}.so")


def build(force: bool = False) -> str | None:
    """Compile the native library; returns the .so path or None."""
    if not force and os.path.exists(_LIB) and (
        os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB
    except Exception:
        return None


def _load():
    lib_path = build()
    if lib_path is None:
        return None
    lib = ctypes.CDLL(lib_path)
    lib.gst_free.argtypes = [ctypes.c_void_p]
    pf = ctypes.POINTER(ctypes.c_float)
    pi = ctypes.POINTER(ctypes.c_int32)
    ppf = ctypes.POINTER(pf)
    ppi = ctypes.POINTER(pi)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    lib.gst_load_obj.argtypes = [ctypes.c_char_p, ppf, pi64, ppi, pi64, ppf]
    lib.gst_load_obj.restype = ctypes.c_int
    lib.gst_load_gobj.argtypes = [ctypes.c_char_p, ppf, ppf, ppf, ppf, ppf,
                                  pi64, pi64]
    lib.gst_load_gobj.restype = ctypes.c_int
    lib.gst_save_gobj.argtypes = [ctypes.c_char_p, pf, pf, pf, pf, pf,
                                  ctypes.c_int64, ctypes.c_int64]
    lib.gst_save_gobj.restype = ctypes.c_int
    return lib


_lib = _load()


def _take(lib, ptr, shape):
    """Copy a malloc'd C buffer into a numpy array and free it."""
    import numpy as np

    n = 1
    for s in shape:
        n *= s
    dtype = np.float32 if ptr._type_ == ctypes.c_float else np.int32
    if n == 0:
        lib.gst_free(ptr)
        return np.zeros(shape, dtype)
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)
    lib.gst_free(ptr)
    return arr.reshape(shape)


class _ObjNative:
    @staticmethod
    def load_obj(path: str):
        if _lib is None:
            return None
        pf = ctypes.POINTER(ctypes.c_float)
        pi = ctypes.POINTER(ctypes.c_int32)
        verts, tris, uv = pf(), pi(), pf()
        nv, nt = ctypes.c_int64(), ctypes.c_int64()
        rc = _lib.gst_load_obj(
            path.encode(), ctypes.byref(verts), ctypes.byref(nv),
            ctypes.byref(tris), ctypes.byref(nt), ctypes.byref(uv),
        )
        if rc != 0:
            return None
        v = _take(_lib, verts, (nv.value, 3))
        t = _take(_lib, tris, (nt.value, 3))
        u = _take(_lib, uv, (nt.value, 3, 2))
        return v, t, u


class _GobjNative:
    @staticmethod
    def load_gobj(path: str):
        if _lib is None:
            return None
        pf = ctypes.POINTER(ctypes.c_float)
        means, shs, scales, opac, rot = pf(), pf(), pf(), pf(), pf()
        n, shv = ctypes.c_int64(), ctypes.c_int64()
        rc = _lib.gst_load_gobj(
            path.encode(), ctypes.byref(means), ctypes.byref(shs),
            ctypes.byref(scales), ctypes.byref(opac), ctypes.byref(rot),
            ctypes.byref(n), ctypes.byref(shv),
        )
        if rc != 0:
            return None
        count, k3 = n.value, shv.value
        return (
            _take(_lib, means, (count, 3)),
            _take(_lib, shs, (count, max(k3, 1) // 3 if k3 else 0, 3))
            if k3
            else _take(_lib, shs, (count, 0, 3)),
            _take(_lib, scales, (count, 3)),
            _take(_lib, opac, (count,)),
            _take(_lib, rot, (count, 4)),
        )

    @staticmethod
    def save_gobj(path: str, means, shs, scales, opacities, rotations) -> bool:
        if _lib is None:
            return False
        import numpy as np

        n = means.shape[0]
        k3 = int(np.prod(shs.shape[1:]))
        c = np.ascontiguousarray

        def p(a):
            return c(a.astype(np.float32)).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            )

        means, shs, scales, opacities, rotations = (
            c(means.astype(np.float32)), c(shs.astype(np.float32).reshape(n, k3)),
            c(scales.astype(np.float32)), c(opacities.astype(np.float32)),
            c(rotations.astype(np.float32)),
        )
        rc = _lib.gst_save_gobj(
            path.encode(),
            means.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            shs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            opacities.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rotations.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, k3,
        )
        return rc == 0


obj_native = _ObjNative if _lib is not None else None
gobj_native = _GobjNative if _lib is not None else None
