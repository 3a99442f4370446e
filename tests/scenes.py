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


def cornell_scene(res: int = 64, compat: bool = True, spp: int = 4,
                  bvh_depth=None):
    scene = Scene()
    meshes, _ = load_objs(CORNELL_OBJ)
    scene.add_meshes(meshes)

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
