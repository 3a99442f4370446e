"""BASELINE config 3 in miniature: textures + normal maps + point lights."""

import numpy as np

from elevenrender_tpu.render.renderer import Renderer
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.material import Material
from elevenrender_tpu.scene.objloader import load_objs
from elevenrender_tpu.scene.scene import PointLight, Scene
from elevenrender_tpu.scene.texture import Texture

PLANE_OBJ = """
o plane
usemtl mat
v -2 0 -2
v  2 0 -2
v  2 0  2
v -2 0  2
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/4/1
"""


def checkerboard(n=8):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    img[..., 0] = ((xx + yy) % 2).astype(np.float32)
    img[..., 1] = 1.0 - img[..., 0]
    img[..., 2] = 0.2
    return img


def flat_normal_map(n=4):
    img = np.zeros((n, n, 3), np.float32)
    img[..., 0] = 0.5
    img[..., 1] = 0.5
    img[..., 2] = 1.0  # (0,0,1) tangent space = unperturbed
    return img


def build_scene(res=32):
    scene = Scene()
    meshes, _ = load_objs(PLANE_OBJ)
    scene.add_meshes(meshes)

    albedo_tex = Texture("checker", checkerboard(), Texture.FILTER_BILINEAR)
    normal_tex = Texture("nmap", flat_normal_map())
    scene.add_texture(albedo_tex)
    scene.add_texture(normal_tex)

    mat = Material(name="mat", roughness=0.8)
    mat.albedo_map = "checker"
    mat.normal_map = "nmap"
    scene.add_material(mat)
    scene.pair_textures()

    scene.add_point_light(PointLight(
        position=np.array([0.0, 3.0, 0.0], np.float32),
        radiance=np.array([30.0, 30.0, 30.0], np.float32)))

    scene.add_hdri(HDRI(Texture.from_color([0.02, 0.02, 0.02])))

    scene.camera.position = np.array([0.0, 2.0, -3.0], np.float32)
    scene.camera.rotation = np.array([35.0, 0.0, 0.0], np.float32)
    scene.x_res = res
    scene.y_res = res
    return scene


def test_textured_scene_with_point_light():
    scene = build_scene(res=32)
    assert scene.materials[0].albedo_texture_id == 0
    assert scene.materials[0].normal_texture_id == 1

    config, ir = scene.build()
    config = config.replace(compat=False, sample_target=4, max_bounces=2)
    assert config.n_lights == 1

    r = Renderer(config, ir)
    r.step(4)
    img = r.get_pass("beauty").reshape(32, 32, 4)
    assert np.isfinite(img).all()
    rgb = img[..., :3]
    assert rgb.max() > 0.05  # point light visible
    # Checker should produce both red- and green-dominant pixels.
    lit = rgb[rgb.sum(-1) > 0.02]
    assert (lit[:, 0] > lit[:, 1]).any() and (lit[:, 1] > lit[:, 0]).any()


def test_point_light_inverse_square():
    """Moving the light 2x farther dims the lit plane ~4x."""
    scene = build_scene(res=16)
    config, ir = scene.build()
    config = config.replace(compat=False, sample_target=8, max_bounces=1)
    r1 = Renderer(config, ir)
    r1.step(8)
    a = r1.get_pass("beauty").reshape(16, 16, 4)[..., :3]

    scene2 = build_scene(res=16)
    scene2.point_lights[0].position = np.array([0.0, 6.0, 0.0], np.float32)
    config2, ir2 = scene2.build()
    config2 = config2.replace(compat=False, sample_target=8, max_bounces=1)
    r2 = Renderer(config2, ir2)
    r2.step(8)
    b = r2.get_pass("beauty").reshape(16, 16, 4)[..., :3]

    am, bm = a.mean(), b.mean()
    assert am > 0 and bm > 0
    # Distance from the plane's lit area roughly doubles: expect ~3-5x.
    ratio = am / bm
    assert 2.0 < ratio < 8.0, ratio


def test_config5_scene_helper_renders():
    """The config-5-shaped scene builder (tests/scenes.py
    textured_heightfield_scene — the bench/production-render scene) in
    miniature: textures + normal map + point light + HDRI through the
    native integrator produce finite, lit output, and the bench's
    auto-chunking helper answers for it."""
    from scenes import textured_heightfield_scene
    from elevenrender_tpu.render.integrator import (
        init_state, recommended_samples_per_dispatch, render_samples_jit)

    scene, config, ir = textured_heightfield_scene(grid=24, res=32)
    assert config.n_lights == 1
    assert config.tex_slots_used[0] and config.tex_slots_used[4]
    state = render_samples_jit(config, ir, init_state(config), 2)
    img = np.asarray(state["passes"][0, :, :3])
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # Tiny scene: full default chunking; the 1M-tri production scene
    # gets 1 sample/dispatch (exercised on hardware, docs/PERF.md).
    assert recommended_samples_per_dispatch(config, ir) == 8
