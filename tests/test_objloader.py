"""OBJ/MTL loader tests, incl. Python-vs-native tokenizer equivalence."""

import numpy as np
import pytest

from elevenrender_tpu.ops.native import load_library, parse_obj_native
from elevenrender_tpu.scene.objloader import load_objs, parse_mtl

from scenes import CORNELL_OBJ

QUAD_OBJ = """
o quad
usemtl m1
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
"""


def test_quad_fan_triangulation():
    meshes, _ = load_objs(QUAD_OBJ)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.tri_count == 2  # quad -> 2 tris
    assert m.name == "quad"
    assert m.mat_names == ["m1", "m1"]
    # Z negation: file z=0 stays 0, normals (0,0,1) -> (0,0,-1).
    np.testing.assert_allclose(m.normals[0, 0], [0, 0, -1])


def test_negative_indices():
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
"""
    meshes, _ = load_objs(obj)
    assert meshes[0].tri_count == 1
    np.testing.assert_allclose(meshes[0].verts[0, 1], [1, 0, 0])


def test_missing_normals_get_geometric():
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    meshes, _ = load_objs(obj)
    n = meshes[0].normals
    assert np.isfinite(n).all()
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_mtl_parsing():
    mats = parse_mtl("""
newmtl wood
Kd 0.6 0.4 0.2
Ks 0.3 0.3 0.3
Ke 0 0 0
Ni 1.45
d 0.9
map_Kd wood.png
newmtl metal
Kd 0.9 0.9 0.9
""")
    assert [m.name for m in mats] == ["wood", "metal"]
    np.testing.assert_allclose(mats[0].albedo, [0.6, 0.4, 0.2])
    assert mats[0].specular == pytest.approx(0.3)
    assert mats[0].eta == pytest.approx(1.45)
    assert mats[0].opacity == pytest.approx(0.9)
    assert mats[0].albedo_map == "wood.png"


@pytest.mark.skipif(load_library() is None, reason="native lib not built")
def test_native_tokenizer_matches_python():
    out = parse_obj_native(CORNELL_OBJ)
    assert out is not None
    tri_pos, tri_nrm, tri_uv, tri_shape, tri_mat, mat_names, shape_names = out

    meshes, _ = load_objs(CORNELL_OBJ)
    py_pos = np.concatenate([m.verts for m in meshes])
    py_nrm = np.concatenate([m.normals for m in meshes])
    py_names = [n for m in meshes for n in m.mat_names]

    assert tri_pos.shape == py_pos.shape
    np.testing.assert_allclose(tri_pos, py_pos, rtol=1e-6)
    # Normalized native normals match Python's.
    nn = tri_nrm / np.linalg.norm(tri_nrm, axis=-1, keepdims=True)
    np.testing.assert_allclose(nn, py_nrm, rtol=1e-5, atol=1e-6)
    native_names = [mat_names[m] for m in tri_mat]
    assert native_names == py_names
    assert shape_names == [m.name for m in meshes]
