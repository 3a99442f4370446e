"""ctypes bindings to the native runtime (native/libelevenrt.so).

The host-side hot loops — SAH BVH build and OBJ parsing — have C++
implementations (native/elevenrt.cpp) mirroring the reference's C++ layer.
Python falls back to the vectorized numpy paths when the library is not
built; results are bit-compatible (tests enforce it).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def load_library():
    """Build-if-needed and dlopen the native runtime.  Returns None when
    unavailable (pure-Python fallbacks take over)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "elevenrt_build", os.path.join(root, "native", "build.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        path = mod.build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.er_build_bvh.restype = ctypes.c_int
        lib.er_build_bvh.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                     f32p, f32p, i32p, i32p, i32p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def build_bvh_native(tri_verts: np.ndarray, depth: int) -> dict | None:
    """C++ SAH build; same outputs as ops.bvh.build_bvh.  None if the
    native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    T = tri_verts.shape[0]
    NN = (1 << (depth + 1)) - 1
    verts = np.ascontiguousarray(tri_verts, np.float32)
    node_bmin = np.zeros((NN, 3), np.float32)
    node_bmax = np.zeros((NN, 3), np.float32)
    node_from = np.zeros(NN, np.int32)
    node_to = np.zeros(NN, np.int32)
    perm = np.zeros(max(T, 1), np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    max_leaf = lib.er_build_bvh(
        verts.ctypes.data_as(f32p), T, depth,
        node_bmin.ctypes.data_as(f32p), node_bmax.ctypes.data_as(f32p),
        node_from.ctypes.data_as(i32p), node_to.ctypes.data_as(i32p),
        perm.ctypes.data_as(i32p))
    return dict(node_bmin=node_bmin, node_bmax=node_bmax,
                node_from=node_from, node_to=node_to,
                perm=perm[:T], depth=depth, max_leaf=max(int(max_leaf), 1))
