"""Tangent-space generation (MikkTSpace-equivalent, vectorized).

Capability mirror of /root/reference/src/mikktspaceCallback.{h,cpp} (which
drives the MikkTSpace C library over each mesh).  We compute per-vertex
tangents from UV derivatives, weld vertices that share position+normal+uv
(MikkTSpace's implicit weld), average across shared faces, then
Gram-Schmidt orthonormalize against the vertex normal.  The handedness sign
follows the MikkTSpace convention, so the shading-side reconstruction
``bitangent = sign * cross(normal, tangent)`` (Tri.h:136) works unchanged.

Fully vectorized numpy — no per-triangle Python loop — so 1M-tri meshes
build in milliseconds instead of the reference's per-face callback walk.
"""

from __future__ import annotations

import numpy as np


def compute_tangents(verts: np.ndarray, uvs: np.ndarray,
                     normals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """verts [T,3,3], uvs [T,3,2], normals [T,3,3] ->
    (tangents [T,3,3], signs [T])."""
    T = verts.shape[0]
    if T == 0:
        return np.zeros((0, 3, 3), np.float32), np.zeros((0,), np.float32)

    e1 = verts[:, 1] - verts[:, 0]          # [T,3]
    e2 = verts[:, 2] - verts[:, 0]
    du1 = uvs[:, 1, 0] - uvs[:, 0, 0]
    dv1 = uvs[:, 1, 1] - uvs[:, 0, 1]
    du2 = uvs[:, 2, 0] - uvs[:, 0, 0]
    dv2 = uvs[:, 2, 1] - uvs[:, 0, 1]

    det = du1 * dv2 - du2 * dv1
    degenerate = np.abs(det) < 1e-12
    r = 1.0 / np.where(degenerate, 1.0, det)

    face_tan = (e1 * dv2[:, None] - e2 * dv1[:, None]) * r[:, None]   # [T,3]
    face_bit = (e2 * du1[:, None] - e1 * du2[:, None]) * r[:, None]

    # Degenerate UVs: pick any vector orthogonal to the face normal.
    fn = np.cross(e1, e2)
    fallback = np.cross(fn, np.where(
        np.abs(fn[:, 0:1]) < 0.9, [[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]]))
    face_tan = np.where(degenerate[:, None], fallback, face_tan)
    face_bit = np.where(degenerate[:, None], np.cross(fn, fallback), face_bit)

    # Weld corners sharing (position, normal, uv) and average tangents —
    # MikkTSpace groups across faces the same way.
    key = np.concatenate([verts.reshape(-1, 3), normals.reshape(-1, 3),
                          uvs.reshape(-1, 2)], axis=1)  # [T*3, 8]
    _, weld, inverse = np.unique(key.view([('', key.dtype)] * key.shape[1]),
                                 return_index=True, return_inverse=True)
    inverse = inverse.reshape(-1)

    n_weld = weld.shape[0]
    acc_tan = np.zeros((n_weld, 3), np.float64)
    acc_bit = np.zeros((n_weld, 3), np.float64)
    corner_tan = np.repeat(face_tan, 3, axis=0)   # [T*3, 3]
    corner_bit = np.repeat(face_bit, 3, axis=0)
    np.add.at(acc_tan, inverse, corner_tan)
    np.add.at(acc_bit, inverse, corner_bit)

    vert_tan = acc_tan[inverse].reshape(T, 3, 3).astype(np.float32)
    vert_bit = acc_bit[inverse].reshape(T, 3, 3).astype(np.float32)

    # Gram-Schmidt against the vertex normal.
    n = normals
    t = vert_tan - n * np.sum(vert_tan * n, axis=-1, keepdims=True)
    t_len = np.linalg.norm(t, axis=-1, keepdims=True)
    t = np.where(t_len > 1e-12, t / np.maximum(t_len, 1e-20), fallback[:, None, :])

    # Handedness: sign = dot(cross(N, T), B) < 0 ? -1 : 1 (per face, from
    # corner 0 — the reference stores a single tangentsSign per tri).
    handed = np.sum(np.cross(n[:, 0], t[:, 0]) * vert_bit[:, 0], axis=-1)
    signs = np.where(handed < 0.0, -1.0, 1.0).astype(np.float32)

    return np.ascontiguousarray(t, np.float32), signs
