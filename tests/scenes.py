"""Shared test scenes (BASELINE.json configs in miniature)."""

from __future__ import annotations

import numpy as np

from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.material import Material
from elevenrender_tpu.scene.objloader import load_objs
from elevenrender_tpu.scene.scene import Scene
from elevenrender_tpu.scene.texture import Texture

# A Cornell-style box: floor/ceiling/back/left/right walls + a tall block,
# plus an emissive quad under the ceiling.  OBJ text (Z will be negated by
# the loader, matching the reference convention).
CORNELL_OBJ = """
o floor
usemtl white
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
vn 0 1 0
f 1//1 2//1 3//1
f 1//1 3//1 4//1
o ceiling
usemtl white
v -1 2 -1
v  1 2 -1
v  1 2  1
v -1 2  1
vn 0 -1 0
f 5//2 7//2 6//2
f 5//2 8//2 7//2
o back
usemtl white
v -1 0 -1
v  1 0 -1
v  1 2 -1
v -1 2 -1
vn 0 0 1
f 9//3 10//3 11//3
f 9//3 11//3 12//3
o left
usemtl red
v -1 0 -1
v -1 0  1
v -1 2  1
v -1 2 -1
vn 1 0 0
f 13//4 14//4 15//4
f 13//4 15//4 16//4
o right
usemtl green
v 1 0 -1
v 1 0  1
v 1 2  1
v 1 2 -1
vn -1 0 0
f 17//5 19//5 18//5
f 17//5 20//5 19//5
o lamp
usemtl lamp
v -0.4 1.98 -0.4
v  0.4 1.98 -0.4
v  0.4 1.98  0.4
v -0.4 1.98  0.4
vn 0 -1 0
f 21//6 23//6 22//6
f 21//6 24//6 23//6
"""


def heightfield_mesh(grid: int = 128, seed: int = 0):
    """A grid x grid noisy heightfield -> 2*(grid-1)^2 triangles, as flat
    MeshData (for large-scene BVH/bench tests)."""
    import numpy as _np
    from elevenrender_tpu.scene.objloader import MeshData
    from elevenrender_tpu.scene.tangents import compute_tangents

    rng = _np.random.default_rng(seed)
    xs = _np.linspace(-2, 2, grid, dtype=_np.float32)
    zs = _np.linspace(-2, 2, grid, dtype=_np.float32)
    xx, zz = _np.meshgrid(xs, zs, indexing="ij")
    yy = (0.25 * _np.sin(3 * xx) * _np.cos(3 * zz)
          + 0.05 * rng.standard_normal((grid, grid))).astype(_np.float32)
    P = _np.stack([xx, yy, zz], axis=-1)          # [G,G,3]

    i0 = P[:-1, :-1]
    i1 = P[1:, :-1]
    i2 = P[1:, 1:]
    i3 = P[:-1, 1:]
    t1 = _np.stack([i0, i1, i2], axis=2).reshape(-1, 3, 3)
    t2 = _np.stack([i0, i2, i3], axis=2).reshape(-1, 3, 3)
    verts = _np.concatenate([t1, t2]).astype(_np.float32)
    T = verts.shape[0]

    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    fn = _np.cross(e2, e1)
    fn /= _np.maximum(_np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    normals = _np.repeat(fn[:, None, :], 3, axis=1).astype(_np.float32)
    uvs = _np.zeros((T, 3, 2), _np.float32)
    uvs[:, :, 0] = (verts[:, :, 0] + 2) / 4
    uvs[:, :, 1] = (verts[:, :, 2] + 2) / 4
    tangents, signs = compute_tangents(verts, uvs, normals)
    return MeshData(name="heightfield", verts=verts, normals=normals,
                    uvs=uvs, tangents=tangents, tangent_signs=signs,
                    mat_names=["terrain"] * T)


def heightfield_scene(grid: int = 128, res: int = 256, spp: int = 16,
                      compat: bool = False, bvh_depth=None):
    """Large-scene config (BASELINE config 5-shaped): ~2*grid^2 tris +
    HDRI sky + glossy Disney terrain."""
    scene = Scene()
    scene.add_mesh(heightfield_mesh(grid))
    mat = Material(name="terrain",
                   albedo=np.array([0.55, 0.45, 0.35], np.float32),
                   roughness=0.6, metallic=0.1)
    mat.compute_aniso_alphas()
    scene.add_material(mat)

    sky = np.zeros((16, 32, 3), np.float32)
    sky[:8] = [0.6, 0.7, 0.9]
    sky[8:] = [0.2, 0.2, 0.2]
    sky[3, 8] = [50.0, 45.0, 40.0]  # sun
    scene.add_hdri(HDRI(Texture("sky", sky)))

    scene.camera.position = np.array([0.0, 1.5, -4.0], np.float32)
    scene.camera.rotation = np.array([15.0, 0.0, 0.0], np.float32)
    scene.x_res = res
    scene.y_res = res
    config, ir = scene.build(bvh_depth=bvh_depth)
    config = config.replace(sample_target=spp, compat=compat)
    return scene, config, ir


def textured_heightfield_scene(grid: int = 708, res: int = 1024,
                               spp: int = 16, compat: bool = False,
                               bvh_depth=None):
    """BASELINE config-5-shaped hard scene: ~2*(grid-1)^2 tris (708 ->
    1M), checker albedo (bilinear) + flat normal map (nearest) so atlas
    fetches and tangent-space normal mapping are in the compiled path,
    HDRI sky + sun, and one point light so the merged any-hit shadow
    launch (HDRI + light halves, t_max-limited) is exercised too."""
    from elevenrender_tpu.scene.scene import PointLight

    scene = Scene()
    scene.add_mesh(heightfield_mesh(grid))

    checker = np.zeros((64, 64, 3), np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    checker[..., 0] = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    checker[..., 1] = 0.5
    checker[..., 2] = 0.3
    nmap = np.full((32, 32, 3), 0.5, np.float32)
    nmap[..., 2] = 1.0
    scene.add_texture(Texture("checker", checker, Texture.FILTER_BILINEAR))
    scene.add_texture(Texture("nmap", nmap, Texture.FILTER_NONE))

    mat = Material(name="terrain", roughness=0.6, metallic=0.1)
    mat.albedo_map = "checker"
    mat.normal_map = "nmap"
    mat.compute_aniso_alphas()
    scene.add_material(mat)
    scene.pair_textures()

    sky = np.zeros((16, 32, 3), np.float32)
    sky[:8] = [0.6, 0.7, 0.9]
    sky[8:] = [0.2, 0.2, 0.2]
    sky[3, 8] = [50.0, 45.0, 40.0]  # sun
    scene.add_hdri(HDRI(Texture("sky", sky)))
    scene.add_point_light(PointLight(
        position=np.array([1.5, 3.0, -1.0], np.float32),
        radiance=np.array([6.0, 5.5, 5.0], np.float32)))

    scene.camera.position = np.array([0.0, 1.5, -4.0], np.float32)
    scene.camera.rotation = np.array([15.0, 0.0, 0.0], np.float32)
    scene.x_res = res
    scene.y_res = res
    config, ir = scene.build(bvh_depth=bvh_depth)
    config = config.replace(sample_target=spp, compat=compat)
    return scene, config, ir


def cornell_scene(res: int = 64, compat: bool = True, spp: int = 4,
                  bvh_depth=None, glossy: bool = False):
    """``glossy``: make the white walls a rough-specular metal — the
    high-variance glossy-noise scene for denoiser evaluation (the lamp's
    reflection sprays fireflies across every wall at low spp)."""
    scene = Scene()
    meshes, _ = load_objs(CORNELL_OBJ)
    scene.add_meshes(meshes)

    if glossy:
        white = Material(name="white",
                         albedo=np.array([0.73, 0.73, 0.73], np.float32),
                         roughness=0.2, metallic=0.7)
    else:
        white = Material(name="white", albedo=np.array([0.73, 0.73, 0.73], np.float32))
    red = Material(name="red", albedo=np.array([0.65, 0.05, 0.05], np.float32))
    green = Material(name="green", albedo=np.array([0.12, 0.45, 0.15], np.float32))
    lamp = Material(name="lamp", albedo=np.array([0.0, 0.0, 0.0], np.float32),
                    emission=np.array([15.0, 15.0, 15.0], np.float32))
    for m in (white, red, green, lamp):
        m.compute_aniso_alphas()
        scene.add_material(m)

    # Dark environment so the lamp dominates.
    scene.add_hdri(HDRI(Texture.from_color([0.05, 0.05, 0.05])))

    scene.camera.position = np.array([0.0, 1.0, -3.5], np.float32)
    scene.camera.rotation = np.zeros(3, np.float32)
    scene.x_res = res
    scene.y_res = res

    config, ir = scene.build(bvh_depth=bvh_depth)
    config = config.replace(sample_target=spp, compat=compat)
    return scene, config, ir
