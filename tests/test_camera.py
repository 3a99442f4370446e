"""Camera ray generation: projection, Euler rotation, AA jitter, bokeh."""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.ops.camera import camera_ray
from elevenrender_tpu.ops.sampling import uniform_circle_sampling


def base_cam(**kw):
    cam = {
        "position": jnp.zeros(3),
        "rotation": jnp.zeros(3),
        "focal_length": jnp.float32(0.035),
        "sensor_width": jnp.float32(0.036),
        "sensor_height": jnp.float32(0.024),
        "aperture": jnp.float32(2.8),
        "focus_distance": jnp.float32(1e6),
        "bokeh": False,
    }
    cam.update(kw)
    return cam


def rays(cam, res=8, **rnds):
    idx = jnp.arange(res * res, dtype=jnp.int32)
    x = idx % res
    y = idx // res
    half = jnp.full((res * res,), 0.5)
    r = [rnds.get(f"r{i}", half) for i in range(1, 6)]
    return camera_ray(cam, res, res, x, y, *r)


def test_center_ray_points_forward():
    o, d = rays(base_cam())
    # With r=0.5 jitter is zero at pixel centers; the middle of the image
    # looks along +z (kernel.cpp:374-390 geometry).
    center = 8 * 4 + 4
    assert d[center, 2] > 0.99
    np.testing.assert_allclose(np.asarray(o[center]), 0.0, atol=1e-7)
    # Unit directions (Ray ctor normalizes, Ray.h:13-17).
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-5)


def test_corner_rays_diverge():
    o, d = rays(base_cam())
    d = np.asarray(d).reshape(8, 8, 3)
    # x increases to the right, y increases upward (sensor plane).
    assert d[0, 0, 0] < 0 and d[0, 7, 0] > 0
    assert d[0, 0, 1] < 0 and d[7, 0, 1] > 0


def test_euler_rotation_z180_flips_xy():
    o, d = rays(base_cam(rotation=jnp.array([0.0, 0.0, 180.0])))
    o2, d2 = rays(base_cam())
    d = np.asarray(d)
    d2 = np.asarray(d2)
    np.testing.assert_allclose(d[:, 0], -d2[:, 0], atol=1e-5)
    np.testing.assert_allclose(d[:, 1], -d2[:, 1], atol=1e-5)
    np.testing.assert_allclose(d[:, 2], d2[:, 2], atol=1e-5)


def test_rotation_y90_looks_along_x():
    o, d = rays(base_cam(rotation=jnp.array([0.0, 90.0, 0.0])))
    center = 8 * 4 + 4
    d = np.asarray(d)
    # Y-rotation: x' = x cos + z sin -> +z maps to +x (kernel.cpp:420-423).
    assert d[center, 0] > 0.99


def test_aa_jitter_moves_rays():
    lo = jnp.full((64,), 0.01)
    hi = jnp.full((64,), 0.99)
    _, d1 = rays(base_cam(), r1=lo, r2=lo)
    _, d2 = rays(base_cam(), r1=hi, r2=hi)
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-4


def test_bokeh_spreads_origins():
    cam = base_cam(bokeh=True, focus_distance=jnp.float32(2.0))
    rng = np.random.default_rng(0)
    r3 = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    r4 = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    r5 = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    o, d = rays(cam, r3=r3, r4=r4, r5=r5)
    o = np.asarray(o)
    # Origins sample the iris disk (kernel.cpp:433-471): radius bounded by
    # diameter/2 = focal/aperture/2.
    radius = np.linalg.norm(o[:, :2], axis=-1)
    assert radius.max() > 1e-4
    assert radius.max() <= 0.035 / 2.8 / 2 + 1e-6


def test_circle_sampling_in_unit_disk():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(0, 1, 500).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, 500).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, 500).astype(np.float32))
    x, y = uniform_circle_sampling(u, v, w)
    r = np.hypot(np.asarray(x), np.asarray(y))
    assert (r <= 1.0 + 1e-6).all()
