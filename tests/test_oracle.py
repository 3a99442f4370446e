"""Wavefront-vs-scalar-oracle parity (VERDICT r1 item 5).

The compat-mode wavefront integrator must match `oracle.render_pixel` — a
pure-numpy scalar program with plain Python control flow (the OPPOSITE
program shape) implementing the same megakernel spec
(kernel.cpp:477-646) — per pixel, per sample.  Agreement validates the
wavefront's lane masking, masked RNG stream bookkeeping, NEE quirks, and
progressive accumulation against an independent expression of the spec.

Tolerance: the wavefront runs under XLA (fusion may reassociate the odd
float op); 1e-4 relative catches any structural divergence — a wrong RNG
draw or a different hit changes values at the 1e-1 level.
"""

import numpy as np

from scenes import cornell_scene
from oracle import ir_to_numpy, render_pixel
from test_golden import featured_scene

from elevenrender_tpu.render.integrator import BEAUTY, init_state, render_sample


def _wavefront_samples(config, ir, res, n_samples):
    state = init_state(config)
    per_sample = []
    for _ in range(n_samples):
        state = render_sample(config, ir, state)
        per_sample.append(
            np.asarray(state["passes"][BEAUTY, :, :3]).reshape(res, res, 3))
    return np.stack(per_sample, axis=0)  # [S, H, W, 3]


def _check_pixels(config, ir, wave, pixels, n_samples):
    ir_np = ir_to_numpy(ir)
    for (px, py) in pixels:
        got = wave[:, py, px]                     # [S, 3]
        want = render_pixel(ir_np, config, px, py, n_samples)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5,
            err_msg=f"pixel ({px},{py}) diverges from scalar oracle")


def test_wavefront_matches_scalar_oracle():
    res = 16
    n_samples = 3
    scene, config, ir = cornell_scene(res=res, spp=n_samples)
    assert config.compat

    wave = _wavefront_samples(config, ir, res, n_samples)
    # 12 pixels spread over the image: corners-ish, walls, lamp, block.
    pixels = [(1, 1), (14, 1), (1, 14), (14, 14), (8, 8), (8, 3),
              (3, 8), (12, 8), (8, 12), (5, 5), (10, 4), (4, 10)]
    _check_pixels(config, ir, wave, pixels, n_samples)


def test_wavefront_matches_oracle_featured():
    """The featured path (VERDICT r2 item 6): bilinear checker albedo,
    perturbing nearest normal map, stochastic opacity (the canopy), and
    thin-lens bokeh, in compat mode — previously pinned only by
    self-generated goldens.  10 pixels: ground through canopy, canopy
    edge, direct ground, sky."""
    res = 16
    n_samples = 3
    config, ir = featured_scene(res=res, spp=n_samples, compat=True)
    assert config.compat and config.bokeh
    assert config.tex_slots_used[0] and config.tex_slots_used[4]

    wave = _wavefront_samples(config, ir, res, n_samples)
    pixels = [(8, 8), (8, 12), (4, 9), (12, 9), (2, 14), (13, 14),
              (8, 2), (3, 4), (12, 5), (7, 10)]
    _check_pixels(config, ir, wave, pixels, n_samples)
