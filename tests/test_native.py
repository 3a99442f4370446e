"""Native C++ BVH builder: results match the numpy builder exactly."""

import numpy as np
import pytest

from elevenrender_tpu.ops.bvh import build_bvh
from elevenrender_tpu.ops.native import build_bvh_native, load_library

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native library not built")


def random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, (n, 1, 3))
    return (centers + rng.normal(0, 0.4, (n, 3, 3))).astype(np.float32)


def test_native_matches_numpy():
    for seed, n in ((0, 37), (1, 300), (2, 1000)):
        tris = random_tris(n, seed)
        ref = build_bvh(tris, use_native=False)
        nat = build_bvh_native(tris, ref["depth"])
        assert nat["max_leaf"] == ref["max_leaf"]
        np.testing.assert_array_equal(nat["perm"], ref["perm"])
        np.testing.assert_array_equal(nat["node_from"], ref["node_from"])
        np.testing.assert_array_equal(nat["node_to"], ref["node_to"])
        np.testing.assert_allclose(nat["node_bmin"], ref["node_bmin"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(nat["node_bmax"], ref["node_bmax"],
                                   rtol=1e-6, atol=1e-6)


def test_native_large_scene_speed():
    tris = random_tris(200_000, seed=3)
    import time
    t0 = time.time()
    out = build_bvh_native(tris, 14)
    dt = time.time() - t0
    assert sorted(out["perm"].tolist()) == list(range(200_000))
    assert dt < 30.0, dt  # generous bound; typical ~1s
