"""BVH build + traversal vs brute force on random scenes."""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.ops.bvh import (aabb_hit, brute_force, build_bvh,
                                      preorder_indices, traverse)


def random_tris(n, seed=0, spread=5.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    offsets = rng.normal(0, 0.4, (n, 3, 3))
    return (centers + offsets).astype(np.float32)


def random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_preorder_layout():
    """Children computable as idx+1 / idx+2^(D-d) (BVH.cpp:122-130)."""
    D = 4
    pre = preorder_indices(D)
    for d in range(D):
        for p in range(1 << d):
            parent = pre[d][p]
            assert pre[d + 1][2 * p] == parent + 1
            assert pre[d + 1][2 * p + 1] == parent + (1 << (D - d))
    # All indices unique and within bounds.
    allidx = np.concatenate(pre)
    assert len(np.unique(allidx)) == (1 << (D + 1)) - 1
    assert allidx.max() == (1 << (D + 1)) - 2


def test_build_partitions_all_tris():
    tris = random_tris(500)
    bvh = build_bvh(tris)
    assert sorted(bvh["perm"].tolist()) == list(range(500))
    D = bvh["depth"]
    pre = preorder_indices(D)[D]
    froms = bvh["node_from"][pre]
    tos = bvh["node_to"][pre]
    # Leaves tile [0, T) contiguously.
    assert froms[0] == 0 and tos[-1] == 500
    assert (froms[1:] == tos[:-1]).all()
    # Leaf bounds contain their tris.
    perm = bvh["perm"]
    for leaf in range(len(pre)):
        f, t = froms[leaf], tos[leaf]
        if f == t:
            continue
        v = tris[perm[f:t]]
        assert (v.reshape(-1, 3) >= bvh["node_bmin"][pre[leaf]] - 1e-4).all()
        assert (v.reshape(-1, 3) <= bvh["node_bmax"][pre[leaf]] + 1e-4).all()


def test_aabb_hit():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    inv = 1.0 / d
    assert bool(aabb_hit(o, inv, jnp.array([[-1.0, -1, -1]]),
                         jnp.array([[1.0, 1, 1]]))[0])
    # Box behind the ray.
    assert not bool(aabb_hit(o, inv, jnp.array([[-1.0, -1, -10]]),
                             jnp.array([[1.0, 1, -8]]))[0])
    # Off-axis box.
    assert not bool(aabb_hit(o, inv, jnp.array([[5.0, 5, -1]]),
                             jnp.array([[6.0, 6, 1]]))[0])


def test_traverse_matches_brute_force():
    tris = random_tris(300, seed=3)
    bvh = build_bvh(tris)
    sorted_tris = jnp.asarray(tris[bvh["perm"]])
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    o, d = random_rays(256)
    bi, bt = brute_force(sorted_tris, o, d)
    ti, tt = traverse(dev, sorted_tris, o, d, depth=bvh["depth"],
                      max_leaf=bvh["max_leaf"])
    hit_b = np.asarray(bi) >= 0
    hit_t = np.asarray(ti) >= 0
    np.testing.assert_array_equal(hit_b, hit_t)
    # Same nearest distance everywhere (tri id may differ on exact ties).
    np.testing.assert_allclose(np.asarray(tt)[hit_t], np.asarray(bt)[hit_b],
                               rtol=1e-5)


def test_packet_matches_per_ray():
    from elevenrender_tpu.ops.bvh import traverse_packet
    tris = random_tris(400, seed=11)
    bvh = build_bvh(tris)
    sorted_tris = jnp.asarray(tris[bvh["perm"]])
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    o, d = random_rays(500, seed=13)  # not a multiple of tile: tests padding
    ri, rt = traverse(dev, sorted_tris, o, d, depth=bvh["depth"],
                      max_leaf=bvh["max_leaf"])
    for tile in (64, 128):
        pi, pt = traverse_packet(dev, sorted_tris, o, d, depth=bvh["depth"],
                                 max_leaf=bvh["max_leaf"], tile=tile)
        hit = np.asarray(ri) >= 0
        np.testing.assert_array_equal(hit, np.asarray(pi) >= 0)
        np.testing.assert_allclose(np.asarray(pt)[hit], np.asarray(rt)[hit],
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_traverse_empty_and_single():
    empty = np.zeros((0, 3, 3), np.float32)
    bvh = build_bvh(empty)
    o, d = random_rays(8)
    ti, _ = traverse({k: jnp.asarray(bvh[k]) for k in
                      ("node_bmin", "node_bmax", "node_from", "node_to")},
                     jnp.asarray(empty), o, d, depth=bvh["depth"],
                     max_leaf=bvh["max_leaf"])
    assert (np.asarray(ti) == -1).all()

    one = random_tris(1, seed=5)
    bvh1 = build_bvh(one)
    sorted1 = jnp.asarray(one[bvh1["perm"]])
    dev1 = {k: jnp.asarray(bvh1[k]) for k in
            ("node_bmin", "node_bmax", "node_from", "node_to")}
    bi, bt = brute_force(sorted1, o, d)
    ti, tt = traverse(dev1, sorted1, o, d, depth=bvh1["depth"],
                      max_leaf=bvh1["max_leaf"])
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ti))


def test_fixed_depth_build():
    """Reference-style fixed depth larger than needed still works."""
    tris = random_tris(50, seed=7)
    bvh = build_bvh(tris, depth=8)
    assert bvh["depth"] == 8
    sorted_tris = jnp.asarray(tris[bvh["perm"]])
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    o, d = random_rays(64, seed=9)
    bi, bt = brute_force(sorted_tris, o, d)
    ti, tt = traverse(dev, sorted_tris, o, d, depth=8,
                      max_leaf=bvh["max_leaf"])
    np.testing.assert_array_equal(np.asarray(bi) >= 0, np.asarray(ti) >= 0)
    hit = np.asarray(ti) >= 0
    np.testing.assert_allclose(np.asarray(tt)[hit], np.asarray(bt)[hit],
                               rtol=1e-5)


def test_counting_order_is_valid_stable_bucket_sort():
    """counting_order (ops/sort.py — the O(n) alternative to argsort for
    per-bounce packet grouping): must return a valid permutation whose
    top-key-bits sequence is non-decreasing, STABLE within buckets, with
    inverse[order[i]] == i; padding path (n not a chunk multiple)
    included."""
    import jax.numpy as jnp
    import numpy as np
    from elevenrender_tpu.ops.sort import counting_order

    rng = np.random.default_rng(0)
    for n in (2048, 5000, 100_001):
        key = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        order, inverse = counting_order(key, bits=8, chunk=2048)
        order, inverse = np.asarray(order), np.asarray(inverse)
        # Valid permutation + exact inverse.
        assert sorted(order.tolist()) == list(range(n))
        np.testing.assert_array_equal(inverse[order], np.arange(n))
        kb = (np.asarray(key) >> 24).astype(np.int64)
        kb_sorted = kb[order]
        assert (np.diff(kb_sorted) >= 0).all()
        # Stability: within each bucket, original indices ascend.
        for b in np.unique(kb_sorted[:50]):
            idxs = order[kb_sorted == b]
            assert (np.diff(idxs) > 0).all()
        # Same bucket histogram as a reference sort.
        np.testing.assert_array_equal(np.bincount(kb, minlength=256),
                                      np.bincount(kb_sorted, minlength=256))


def test_sort_impl_does_not_change_render():
    """The sort is internal (permutation is inverted after the trace):
    switching sort_impl must not change the rendered image (up to
    equal-t shared-edge ties — none on this scene/seed)."""
    import numpy as np
    from scenes import cornell_scene
    from elevenrender_tpu.render.integrator import (init_state,
                                                    render_samples_jit)

    scene, config, ir = cornell_scene(res=24, spp=2)
    config = config.replace(compat=False, trace_mode="packet",
                            max_bounces=3)
    a = np.asarray(render_samples_jit(config, ir, init_state(config), 2)
                   ["passes"])
    cfg_c = config.replace(sort_impl="counting")
    b = np.asarray(render_samples_jit(cfg_c, ir, init_state(cfg_c), 2)
                   ["passes"])
    np.testing.assert_array_equal(a, b)


def test_shadow_sort_does_not_change_render():
    """config.shadow_sort swaps the shadow launch's permutation from the
    shared alive-keyed one to a dedicated gate-keyed sort — permutations
    are inverted after the trace, so the image must be unchanged (up to
    equal-t ties — none on this scene/seed).  Covers both the merged
    point-light launch and the env-only branch."""
    import numpy as np
    from scenes import cornell_scene
    from elevenrender_tpu.render.integrator import (init_state,
                                                    render_samples_jit)
    from elevenrender_tpu.scene.scene import PointLight

    scene, config, ir = cornell_scene(res=24, spp=2)
    config = config.replace(compat=False, trace_mode="packet",
                            max_bounces=3)
    for n_lights in (0, 1):
        cfg = config.replace(n_lights=n_lights)
        ir2 = dict(ir)
        if n_lights:
            import jax.numpy as jnp
            ir2["lights"] = {
                "pos": jnp.asarray([[0.0, 1.5, -1.0]], jnp.float32),
                "rad": jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)}
        # Baselines must differ explicitly: shadow_sort defaults True
        # since r5, so an implicit baseline would compare the same
        # config to itself.
        cfg_off = cfg.replace(shadow_sort=False)
        a = np.asarray(render_samples_jit(cfg_off, ir2, init_state(cfg_off),
                                          2)["passes"])
        cfg_s = cfg.replace(shadow_sort=True)
        b = np.asarray(render_samples_jit(cfg_s, ir2, init_state(cfg_s), 2)
                       ["passes"])
        np.testing.assert_array_equal(a, b)


def test_packed_sort_io_does_not_change_render():
    """packed_sort_io moves the same payloads through one wide-row
    gather (tri ids as exact float32 VALUES — bitcasting was measured
    corrupted by subnormal flush + NaN canonicalization); the image must
    be bit-identical with the knob off."""
    import numpy as np
    import jax.numpy as jnp
    from scenes import cornell_scene
    from elevenrender_tpu.render.integrator import (init_state,
                                                    render_samples_jit)

    scene, config, ir = cornell_scene(res=16, spp=2)
    ir2 = dict(ir)
    ir2["lights"] = {"pos": jnp.asarray([[0.0, 1.5, -1.0]], jnp.float32),
                     "rad": jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)}
    for mode in ("packet", "pallas"):
        cfg_off = config.replace(compat=False, trace_mode=mode,
                                 max_bounces=3, n_lights=1, pallas_sub=8,
                                 packed_sort_io=False)
        a = np.asarray(render_samples_jit(cfg_off, ir2, init_state(cfg_off),
                                          2)["passes"])
        cfg_on = cfg_off.replace(packed_sort_io=True)
        b = np.asarray(render_samples_jit(cfg_on, ir2, init_state(cfg_on),
                                          2)["passes"])
        np.testing.assert_array_equal(a, b, err_msg=mode)
