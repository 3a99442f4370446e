"""PNG + Radiance HDR IO round trips."""

import numpy as np

from elevenrender_tpu.utils.image import (read_hdr, read_png, write_hdr,
                                          write_png)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (13, 17, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_allclose(back, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_png_rgba(tmp_path):
    img = np.zeros((4, 4, 4), np.float32)
    img[..., 0] = 0.5
    img[..., 3] = 1.0
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    assert back.shape == (4, 4, 4)
    np.testing.assert_allclose(back[..., 0], 0.5, atol=0.01)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 1, (8, 12, 3)) ** 2 * 50.0).astype(np.float32)
    img[0, 0] = 0.0  # zero pixel
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE precision: quantization is relative to the pixel's MAX
    # component (shared 8-bit mantissa), so bound by maxc/256 per pixel.
    bound = img.max(axis=-1, keepdims=True) / 128.0 * 1.01 + 1e-4
    assert (np.abs(back - img) <= bound).all()
