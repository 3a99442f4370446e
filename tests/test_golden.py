"""Golden-image regression: fixed-seed compat render must stay stable.

The compat integrator replicates the reference megakernel's observable
semantics (RNG streams, quirks); this pins the whole pipeline — any
unintended change to RNG order, sampling, BVH, Disney, or accumulation
shifts the image and fails here.  Regenerate deliberately with:
    python tests/test_golden.py regen
"""

import os

import numpy as np

from elevenrender_tpu.render.renderer import Renderer

from scenes import cornell_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_16x16_compat.npy")


def render():
    scene, config, ir = cornell_scene(res=16, spp=3)
    r = Renderer(config, ir)
    r.step(3)
    return r.get_pass("beauty").reshape(16, 16, 4)


def test_compat_golden():
    img = render()
    assert os.path.exists(GOLDEN), "golden missing — run: python tests/test_golden.py regen"
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, render())
        print("golden written:", GOLDEN)
