"""Golden-image regression: fixed-seed renders must stay stable.

The compat integrator replicates the reference megakernel's observable
semantics (RNG streams, quirks); these goldens pin the whole pipeline —
any unintended change to RNG order, sampling, BVH, Disney, textures,
normal mapping, opacity, bokeh, or accumulation shifts an image and
fails here.  Coverage (one golden per feature bundle):

  cornell_16x16_compat   geometry + emission + dark env, compat quirks
  cornell_16x16_native   same scene through the native path (real MIS,
                         jittered env NEE, no-accumulation-offset)
  featured_16x16_compat  bilinear checker albedo + perturbing normal map
                         + stochastic opacity + bokeh camera, compat
  featured_16x16_native  same + point-light NEE (native only; the
                         reference's pointLight() is dead code)

Regenerate deliberately with:
    python tests/test_golden.py regen
"""

import os

import numpy as np
import pytest

from elevenrender_tpu.render.renderer import Renderer
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.material import Material
from elevenrender_tpu.scene.objloader import load_objs
from elevenrender_tpu.scene.scene import PointLight, Scene
from elevenrender_tpu.scene.texture import Texture

from scenes import cornell_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# A textured ground plane with a floating half-transparent canopy quad.
FEATURED_OBJ = """
o ground
usemtl ground
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
o canopy
usemtl canopy
v -1 1.2 -1
v  1 1.2 -1
v  1 1.2  1
v -1 1.2  1
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 5/5/2 6/6/2 7/7/2
f 5/5/2 7/7/2 8/8/2
"""


def _checker(n=8):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    img[..., 0] = ((xx + yy) % 2).astype(np.float32)
    img[..., 1] = 1.0 - img[..., 0]
    img[..., 2] = 0.2
    return img


def _bump_normal_map(n=8):
    """A normal map that actually perturbs: alternating tilted normals
    (+-0.4 in tangent x), encoded as color = (normal + 1) / 2."""
    yy, xx = np.mgrid[0:n, 0:n]
    tx = (((xx + yy) % 2) * 0.8 - 0.4).astype(np.float32)
    tz = np.sqrt(np.maximum(1.0 - tx**2, 0.0))
    normal = np.stack([tx, np.zeros_like(tx), tz], -1)
    return ((normal + 1.0) / 2.0).astype(np.float32)


def featured_scene(res=16, compat=True, spp=3):
    """Textures + normal map + opacity + bokeh (+ point light in native):
    the feature bundle the single Cornell golden never covered."""
    scene = Scene()
    meshes, _ = load_objs(FEATURED_OBJ)
    scene.add_meshes(meshes)

    scene.add_texture(Texture("checker", _checker(), Texture.FILTER_BILINEAR))
    scene.add_texture(Texture("bump", _bump_normal_map()))

    ground = Material(name="ground", roughness=0.7)
    ground.albedo_map = "checker"
    ground.normal_map = "bump"
    canopy = Material(name="canopy",
                      albedo=np.array([0.9, 0.6, 0.2], np.float32),
                      roughness=0.4, opacity=0.5)
    for m in (ground, canopy):
        m.compute_aniso_alphas()
        scene.add_material(m)
    scene.pair_textures()

    if not compat:
        scene.add_point_light(PointLight(
            position=np.array([1.5, 3.0, -1.0], np.float32),
            radiance=np.array([25.0, 22.0, 18.0], np.float32)))

    sky = np.zeros((4, 8, 3), np.float32)
    sky[:2] = [0.4, 0.5, 0.7]
    sky[2:] = [0.15, 0.12, 0.10]
    scene.add_hdri(HDRI(Texture("sky", sky)))

    scene.camera.position = np.array([0.0, 1.6, -3.2], np.float32)
    scene.camera.rotation = np.array([20.0, 0.0, 0.0], np.float32)
    scene.camera.aperture = 0.15
    scene.camera.focus_distance = 3.5
    scene.camera.bokeh = True
    scene.x_res = res
    scene.y_res = res

    config, ir = scene.build()
    config = config.replace(compat=compat, sample_target=spp, bokeh=True)
    return config, ir


def _render(config, ir, res, spp):
    r = Renderer(config, ir)
    r.step(spp)
    return r.get_pass("beauty").reshape(res, res, 4)


def render_case(name):
    res, spp = 16, 3
    if name == "cornell_16x16_compat":
        _, config, ir = cornell_scene(res=res, spp=spp)
    elif name == "cornell_16x16_native":
        _, config, ir = cornell_scene(res=res, spp=spp, compat=False)
    elif name == "featured_16x16_compat":
        config, ir = featured_scene(res=res, spp=spp, compat=True)
    elif name == "featured_16x16_native":
        config, ir = featured_scene(res=res, spp=spp, compat=False)
    else:
        raise KeyError(name)
    return _render(config, ir, res, spp)


CASES = ["cornell_16x16_compat", "cornell_16x16_native",
         "featured_16x16_compat", "featured_16x16_native"]


@pytest.mark.parametrize("name", CASES)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    assert os.path.exists(path), \
        f"golden missing — run: python tests/test_golden.py regen"
    img = render_case(name)
    ref = np.load(path)
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


def test_featured_golden_exercises_features():
    """The featured golden is only worth its bytes if the features fire:
    both checker colors visible, normal map actually perturbs shading."""
    img = render_case("featured_16x16_native")[..., :3]
    assert np.isfinite(img).all()
    lit = img[img.sum(-1) > 0.02]
    assert (lit[:, 0] > lit[:, 1]).any() and (lit[:, 1] > lit[:, 0]).any()


if __name__ == "__main__":
    import sys

    import jax
    os.environ["JAX_PLATFORMS"] = "cpu"  # not axon (see conftest.py)
    jax.config.update("jax_platforms", "cpu")
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in CASES:
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"),
                    render_case(name))
            print("golden written:", name)
