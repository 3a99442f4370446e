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


class ObjCounts(ctypes.Structure):
    _fields_ = [("n_pos", ctypes.c_int64), ("n_nrm", ctypes.c_int64),
                ("n_uv", ctypes.c_int64), ("n_tri", ctypes.c_int64),
                ("n_shape", ctypes.c_int64)]


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
        lib.er_obj_count.restype = ctypes.c_int
        lib.er_obj_count.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.POINTER(ObjCounts)]
        lib.er_obj_fill.restype = ctypes.c_int
        lib.er_obj_fill.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    f32p, f32p, f32p, i32p, i32p,
                                    ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int64]
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


def parse_obj_native(text: str | bytes):
    """C++ two-pass OBJ tokenizer (er_obj_count / er_obj_fill).

    Returns (tri_pos [T,3,3], tri_nrm [T,3,3] (NaN rows where the face
    had no normal index), tri_uv [T,3,2], tri_shape [T] i32,
    tri_mat [T] i32, mat_names list[str], shape_names list[str]) or None
    when the native library is unavailable.

    Note: unlike the Python parser, shapes are keyed by NAME (two 'o'
    blocks with the same name merge into one shape).
    """
    lib = load_library()
    if lib is None:
        return None
    raw = text.encode("utf-8", "replace") if isinstance(text, str) else text
    counts = ObjCounts()
    lib.er_obj_count(raw, len(raw), ctypes.byref(counts))
    T = int(counts.n_tri)
    tri_pos = np.zeros((max(T, 1), 9), np.float32)
    tri_nrm = np.zeros((max(T, 1), 9), np.float32)
    tri_uv = np.zeros((max(T, 1), 6), np.float32)
    tri_shape = np.zeros(max(T, 1), np.int32)
    tri_mat = np.zeros(max(T, 1), np.int32)
    mat_pool = ctypes.create_string_buffer(1 << 16)
    shape_pool = ctypes.create_string_buffer(1 << 16)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = lib.er_obj_fill(raw, len(raw),
                        tri_pos.ctypes.data_as(f32p),
                        tri_nrm.ctypes.data_as(f32p),
                        tri_uv.ctypes.data_as(f32p),
                        tri_shape.ctypes.data_as(i32p),
                        tri_mat.ctypes.data_as(i32p),
                        mat_pool, len(mat_pool),
                        shape_pool, len(shape_pool))
    T = int(n)

    def pool_names(buf, n_names):
        # Entries are NUL-separated in order; empty names are valid (the
        # default shape), so take exactly n_names split pieces.
        pieces = buf.raw.split(b"\x00")
        return [p.decode("utf-8", "replace") for p in pieces[:n_names]]

    n_mats = int(tri_mat[:T].max()) + 1 if T and tri_mat[:T].max() >= 0 else 0
    n_shapes = int(tri_shape[:T].max()) + 1 if T else 0
    return (tri_pos[:T].reshape(T, 3, 3), tri_nrm[:T].reshape(T, 3, 3),
            tri_uv[:T].reshape(T, 3, 2), tri_shape[:T], tri_mat[:T],
            pool_names(mat_pool, n_mats), pool_names(shape_pool, n_shapes))
