"""Texture atlas sampling + HDRI CDF/pdf/binary-search parity tests."""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.ops.hdri import (binary_search, binary_search_host,
                                       env_pdf, pack_hdri, sample_env)
from elevenrender_tpu.ops.texture import (fetch_texel, pack_atlas,
                                          reverse_spherical_mapping,
                                          sample_bilinear, sample_nearest,
                                          spherical_mapping)
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.texture import Texture


def checker(w, h, c=3):
    img = np.zeros((h, w, c), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = ((xx + yy) % 2).astype(np.float32)
    if c > 1:
        img[..., 1] = 0.5
    return img


def test_atlas_fetch_multi_texture():
    t1 = Texture("a", checker(4, 4))
    t2 = Texture("b", np.full((2, 2, 1), 0.25, np.float32))
    atlas = pack_atlas([t1, t2])
    v = np.asarray(fetch_texel(atlas, jnp.int32(0), jnp.int32(1), jnp.int32(0)))
    np.testing.assert_allclose(v, [1.0, 0.5, 0.0])
    # 1-channel texture broadcasts to grey (Texture.cpp:185-187).
    v2 = np.asarray(fetch_texel(atlas, jnp.int32(1), jnp.int32(0), jnp.int32(0)))
    np.testing.assert_allclose(v2, [0.25, 0.25, 0.25])


def test_fetch_wrap_semantics():
    t = Texture("a", checker(4, 4))
    atlas = pack_atlas([t])
    # C-style: x %= w then abs (Texture.cpp:176-180): x=5 -> 1; x=-3 -> 3.
    v_five = np.asarray(fetch_texel(atlas, jnp.int32(0), jnp.int32(5), jnp.int32(0)))
    v_one = np.asarray(fetch_texel(atlas, jnp.int32(0), jnp.int32(1), jnp.int32(0)))
    np.testing.assert_allclose(v_five, v_one)
    v_m3 = np.asarray(fetch_texel(atlas, jnp.int32(0), jnp.int32(-3), jnp.int32(0)))
    v_3 = np.asarray(fetch_texel(atlas, jnp.int32(0), jnp.int32(3), jnp.int32(0)))
    np.testing.assert_allclose(v_m3, v_3)


def test_bilinear_interpolation():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 1] = 1.0
    atlas = pack_atlas([Texture("a", img)])
    # Sample midway between texel 0 and 1 on x: floor(1.0)=1 ... use exact
    # reference arithmetic: u*w=1.0 -> t1x=1, a=0 -> value at (1,0) = 1.
    v = np.asarray(sample_bilinear(atlas, jnp.int32(0), jnp.float32(0.5),
                                   jnp.float32(0.0)))
    np.testing.assert_allclose(v, [1.0, 1.0, 1.0])
    v2 = np.asarray(sample_bilinear(atlas, jnp.int32(0), jnp.float32(0.25),
                                    jnp.float32(0.0)))
    np.testing.assert_allclose(v2, [0.5, 0.5, 0.5], atol=1e-6)


def test_spherical_roundtrip():
    """reverseSphericalMapping(sphericalMapping(-d)) == d (unit dirs)."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(100, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = spherical_mapping(jnp.asarray(-d))
    back = np.asarray(reverse_spherical_mapping(u, v))
    np.testing.assert_allclose(back, -d, atol=2e-3)


def test_hdri_cdf_and_pdf():
    img = np.zeros((4, 8, 3), np.float32)
    img[1, 3] = [2.0, 1.0, 1.0]   # bright texel
    img[2, 6] = [1.0, 0.0, 0.0]
    h = HDRI(Texture("env", img))
    assert h.radiance_sum == 5.0
    assert abs(h.cdf[-1] - 1.0) < 1e-5
    # pdf at the bright texel (HDRI.cpp:101-107 oracle).
    x, y = 3, 1
    theta = (y / 4) * np.pi
    oracle = (4.0 / 5.0) * 8 * 4 / (2 * np.pi * np.sin(theta))
    env = pack_hdri(h)
    got = float(env_pdf(env, jnp.int32(x), jnp.int32(y)))
    np.testing.assert_allclose(got, oracle, rtol=1e-5)


def test_binary_search_parity():
    """Vectorized search == scalar oracle of the reference's quirky loop."""
    rng = np.random.default_rng(1)
    lum = rng.uniform(0, 1, 64)
    cdf = np.concatenate([[0], np.cumsum(lum / lum.sum())]).astype(np.float32)
    values = rng.uniform(0, 1, 200).astype(np.float32)
    got = np.asarray(binary_search(jnp.asarray(cdf), jnp.asarray(values), 64))
    oracle = np.array([binary_search_host(cdf, float(v), 64) for v in values])
    np.testing.assert_array_equal(got, oracle)


def test_sample_env_importance():
    """Sampling frequency concentrates on the bright texel.

    Compat mode replicates the reference's one-off binary search
    (HDRI.cpp:85-98 returns `to`, one texel PAST the CDF step), so the
    mass lands on flat index 22 = (6,2); the exact native inversion lands
    on (5,2)."""
    from elevenrender_tpu.ops.hdri import sample_env_exact
    img = np.full((4, 8, 3), 0.01, np.float32)
    img[2, 5] = [10.0, 10.0, 10.0]
    h = HDRI(Texture("env", img))
    env = pack_hdri(h)
    r = jnp.linspace(0.001, 0.999, 999)
    xs, ys = sample_env(env, r)
    frac_quirk = float(np.mean((np.asarray(xs) == 6) & (np.asarray(ys) == 2)))
    assert frac_quirk > 0.9  # one-past the bright texel (reference quirk)
    xe, ye = sample_env_exact(env, r)
    frac_exact = float(np.mean((np.asarray(xe) == 5) & (np.asarray(ye) == 2)))
    assert frac_exact > 0.9


def test_texture_ops():
    t = Texture("a", checker(4, 2))
    orig = t.data.copy()
    t.mirror_x()
    np.testing.assert_allclose(t.data, orig[:, ::-1])
    t.mirror_x()
    t.pixel_shift(0.5, 0)
    np.testing.assert_allclose(t.data, np.roll(orig, 2, axis=1))
