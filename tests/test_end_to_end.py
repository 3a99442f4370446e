"""End-to-end: Cornell box renders a sensible image (BASELINE config 1)."""

import numpy as np

from elevenrender_tpu.render.renderer import Renderer

from scenes import cornell_scene


def test_cornell_renders():
    scene, config, ir = cornell_scene(res=48, spp=4)
    r = Renderer(config, ir)
    r.step(4)
    img = r.get_pass("beauty").reshape(config.y_res, config.x_res, 4)

    assert np.isfinite(img).all()
    # Lamp should make the image clearly non-black; walls bounded by clamp.
    assert img[:, :, :3].max() > 0.5
    assert img[:, :, :3].max() <= 10.0
    # Left/right thirds should pick up red/green wall tint somewhere.
    mid = config.y_res // 2
    left = img[mid, : config.x_res // 3, :3].mean(axis=0)
    right = img[mid, -config.x_res // 3:, :3].mean(axis=0)
    assert left[0] != right[0] or left[1] != right[1]

    info = r.get_render_info()
    assert info["samples"] == 4

    # Normal AOV: center pixel sees the back wall, normal ~ (0,0,-1).
    # Compat accumulation converges to sum/(N+1) => ~4/5 of the true value.
    nrm = r.get_pass("normal").reshape(config.y_res, config.x_res, 4)
    c = nrm[config.y_res // 2, config.x_res // 2, :3]
    assert abs(c[2]) > 0.7


def test_packed_attr_gather_matches():
    """The [T,40] packed attribute path renders identically to the
    per-array fallback.  packed_attrs defaults True since r5, so the
    UNPACKED side must be requested explicitly — cornell_scene's default
    build would otherwise make this packed-vs-packed."""
    scene, config, ir = cornell_scene(res=16, spp=2)
    config, ir = scene.build(packed_attrs=False)
    config = config.replace(sample_target=2, compat=True, max_bounces=2)
    assert "packed" not in ir["tris"]
    r1 = Renderer(config, ir)
    r1.step(2)

    config2, ir2 = scene.build(packed_attrs=True)
    config2 = config2.replace(sample_target=2, compat=True, max_bounces=2)
    assert "packed" in ir2["tris"]
    r2 = Renderer(config2, ir2)
    r2.step(2)
    np.testing.assert_allclose(r1.get_pass("beauty"), r2.get_pass("beauty"),
                               rtol=1e-6)


def test_brute_force_matches_bvh():
    scene, config, ir = cornell_scene(res=16, spp=2)
    config = config.replace(max_bounces=2)
    r1 = Renderer(config, ir)
    r1.step(2)
    r2 = Renderer(config.replace(use_bvh=False), ir)
    r2.step(2)
    a = r1.get_pass("beauty")
    b = r2.get_pass("beauty")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
