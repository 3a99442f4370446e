"""Pallas packet-traversal kernel vs the reference per-ray walk
(interpret mode on CPU; the driver exercises the compiled path on TPU)."""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.ops.bvh import build_bvh, traverse
from elevenrender_tpu.ops.bvh_pallas import (TILE, pack_bvh_for_pallas,
                                             traverse_pallas)


def random_scene(n_tris, n_rays, seed=0):
    rng = np.random.default_rng(seed)
    tris = (rng.uniform(-5, 5, (n_tris, 1, 3))
            + rng.normal(0, 0.4, (n_tris, 3, 3))).astype(np.float32)
    o = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return tris, jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_per_ray():
    tris, o, d = random_scene(300, 1500, seed=0)  # non-multiple of TILE
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    ri, rt = traverse(dev, jnp.asarray(st), o, d, depth=bvh["depth"],
                      max_leaf=bvh["max_leaf"])
    pi, pt = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                             max_leaf=bvh["max_leaf"], interpret=True)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    hit = np.asarray(ri) >= 0
    np.testing.assert_allclose(np.asarray(pt)[hit], np.asarray(rt)[hit],
                               rtol=1e-6)


def test_pallas_exact_tile_boundary():
    tris, o, d = random_scene(64, TILE * 2, seed=4)
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    ri, _ = traverse(dev, jnp.asarray(st), o, d, depth=bvh["depth"],
                     max_leaf=bvh["max_leaf"])
    pi, _ = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                            max_leaf=bvh["max_leaf"], interpret=True)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


def test_pallas_tile_widths_agree():
    """Widening the tile (sub) changes visit grouping only, never results
    — gate for the pallas_sub config knob (default 32, docs/PERF.md)."""
    tris, o, d = random_scene(500, 3000, seed=7)
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    ref = None
    for sub in (8, 32, 64):
        pi, pt = traverse_pallas(nodes, leaf, tris9, o, d,
                                 depth=bvh["depth"],
                                 max_leaf=bvh["max_leaf"], interpret=True,
                                 sub=sub)
        if ref is None:
            ref = (np.asarray(pi), np.asarray(pt))
        else:
            np.testing.assert_array_equal(np.asarray(pi), ref[0])
            np.testing.assert_array_equal(np.asarray(pt), ref[1])


def test_pallas_stream_matches_per_ray():
    """HBM-streaming variant (tris DMA'd per leaf parent) must agree with
    the per-ray reference walk — the correctness gate for >VMEM scenes
    (BASELINE config 5, ~1M tris; cf. BVH.cpp:63-120 arbitrary-T)."""
    tris, o, d = random_scene(3000, 2000, seed=2)
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    ri, rt = traverse(dev, jnp.asarray(st), o, d, depth=bvh["depth"],
                      max_leaf=bvh["max_leaf"])
    pi, pt = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                             max_leaf=bvh["max_leaf"], interpret=True,
                             stream=True)
    vi, vt = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                             max_leaf=bvh["max_leaf"], interpret=True,
                             stream=False)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    hit = np.asarray(ri) >= 0
    # vs the per-ray walk: same tris, t to float ordering noise (the
    # packed kernel evaluates Moller-Trumbore with a different op order).
    np.testing.assert_allclose(np.asarray(pt)[hit], np.asarray(rt)[hit],
                               rtol=1e-5, atol=1e-6)
    # vs the VMEM-resident kernel: BIT-identical — the DMA path changes
    # only where the tri rows are read from.
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(vi))
    np.testing.assert_array_equal(np.asarray(pt), np.asarray(vt))


def test_wide_matches_per_ray():
    """8-wide collapse (experiments/bvh_wide.py, demoted r4) vs the per-ray reference walk,
    VMEM and HBM-streaming variants, across depths that exercise a
    remainder root (D mod 3 = 0, 1, 2)."""
    from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
    for n_tris, n_rays, depth, seed in ((300, 1500, None, 0),
                                        (500, 2000, 4, 3),
                                        (700, 2000, 5, 5),
                                        (900, 2000, 6, 1)):
        tris, o, d = random_scene(n_tris, n_rays, seed=seed)
        bvh = build_bvh(tris, depth=depth)
        if bvh["depth"] < 3:
            continue
        st = tris[bvh["perm"]]
        _, _, tris9 = pack_bvh_for_pallas(bvh, st)
        nodes8, leaf8 = pack_bvh_wide(bvh)
        dev = {k: jnp.asarray(bvh[k]) for k in
               ("node_bmin", "node_bmax", "node_from", "node_to")}
        ri, rt = traverse(dev, jnp.asarray(st), o, d, depth=bvh["depth"],
                          max_leaf=bvh["max_leaf"])
        for stream in (False, True):
            wi, wt = traverse_wide(nodes8, leaf8, tris9, o, d,
                                   depth=bvh["depth"],
                                   max_leaf=bvh["max_leaf"], interpret=True,
                                   stream=stream)
            np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))
            hit = np.asarray(ri) >= 0
            np.testing.assert_allclose(np.asarray(wt)[hit],
                                       np.asarray(rt)[hit],
                                       rtol=1e-5, atol=1e-6)


def test_wide_tile_widths_agree():
    from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
    tris, o, d = random_scene(500, 3000, seed=7)
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    _, _, tris9 = pack_bvh_for_pallas(bvh, st)
    nodes8, leaf8 = pack_bvh_wide(bvh)
    ref = None
    for sub in (8, 32):
        wi, wt = traverse_wide(nodes8, leaf8, tris9, o, d,
                               depth=bvh["depth"],
                               max_leaf=bvh["max_leaf"], interpret=True,
                               sub=sub)
        if ref is None:
            ref = (np.asarray(wi), np.asarray(wt))
        else:
            np.testing.assert_array_equal(np.asarray(wi), ref[0])
            np.testing.assert_array_equal(np.asarray(wt), ref[1])


def test_frontier_matches_per_ray():
    """Frontier-K walk (r4: K stack entries per serialized step): hit
    ids/distances must match the per-ray reference exactly — traversal
    order changes, the strict-'<' nearest result cannot.  Covers VMEM +
    stream residencies, K=2/4, and the any-hit occlusion mode."""
    tris, o, d = random_scene(800, 2000, seed=3)
    bvh = build_bvh(tris)
    st = tris[np.asarray(bvh["perm"])]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    dev = {k: jnp.asarray(bvh[k]) for k in
           ("node_bmin", "node_bmax", "node_from", "node_to")}
    ri, rt = traverse(dev, jnp.asarray(st), o, d, depth=bvh["depth"],
                      max_leaf=bvh["max_leaf"])
    hit = np.asarray(ri) >= 0
    for K in (2, 4):
        for stream in (False, True):
            fi, ft = traverse_pallas(nodes, leaf, tris9, o, d,
                                     depth=bvh["depth"],
                                     max_leaf=bvh["max_leaf"],
                                     interpret=True, sub=8,
                                     stream=stream, frontier=K)
            np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
            np.testing.assert_allclose(np.asarray(ft)[hit],
                                       np.asarray(rt)[hit],
                                       rtol=1e-5, atol=1e-6)

    # Any-hit mode under the frontier walk: same flag as the classic
    # kernel's any-hit (both are exact — docs in traverse_pallas).
    N = o.shape[0]
    rng = np.random.default_rng(5)
    excl = jnp.asarray(rng.integers(-1, 800, N).astype(np.int32))
    tmax = jnp.asarray(np.where(rng.random(N) < 0.5, np.inf,
                                rng.uniform(1, 10, N)).astype(np.float32))
    ai, _ = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                            max_leaf=bvh["max_leaf"], interpret=True,
                            sub=8, exclude=excl, t_max=tmax)
    fi, _ = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                            max_leaf=bvh["max_leaf"], interpret=True,
                            sub=8, exclude=excl, t_max=tmax, frontier=4)
    np.testing.assert_array_equal(np.asarray(fi) >= 0, np.asarray(ai) >= 0)


def test_count_steps_counters():
    """count_steps (the roofline instrumentation, scripts/roofline.py)
    must not perturb results, and its counters must satisfy the walk's
    invariants: leaf-parent visits <= node visits, leaf rows >= 0, and
    streaming reports the same counts as VMEM residency."""
    tris, o, d = random_scene(400, 2000, seed=11)
    bvh = build_bvh(tris)
    st = tris[bvh["perm"]]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)

    i0, t0 = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                             max_leaf=bvh["max_leaf"], interpret=True, sub=8)
    i1, t1, c = traverse_pallas(nodes, leaf, tris9, o, d,
                                depth=bvh["depth"],
                                max_leaf=bvh["max_leaf"], interpret=True,
                                sub=8, count_steps=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    c = np.asarray(c)
    assert c.shape[1] == 4 and (c >= 0).all()
    visits, leafrows, leafparents, slots = (c[:, 0], c[:, 1], c[:, 2],
                                            c[:, 3])
    assert (visits >= 1).all()
    assert (leafparents <= visits).all()
    # Each counted leaf-parent visit scans at least one row per
    # overlapping child.
    assert (leafrows >= leafparents).all()
    # Without leaf_aabb every touched row is fully MT-tested (8 slots).
    np.testing.assert_array_equal(slots, leafrows * 8)

    _, _, c2 = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                               max_leaf=bvh["max_leaf"], interpret=True,
                               sub=8, stream=True, count_steps=True)
    np.testing.assert_array_equal(c, np.asarray(c2))


def test_leaf_aabb_parity():
    """leaf_aabb (the packed row/half-row AABB pre-test) must be a pure
    work-skip: identical hits in nearest AND any-hit modes, VMEM and
    stream residencies, and the slots-tested counter must not exceed the
    leaf_aabb=0 count."""
    tris, o, d = random_scene(900, 4096, seed=7)
    bvh = build_bvh(tris)
    st = tris[np.asarray(bvh["perm"])]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    kw = dict(depth=bvh["depth"], max_leaf=bvh["max_leaf"], interpret=True,
              sub=8)
    i0, t0 = traverse_pallas(nodes, leaf, tris9, o, d, **kw)
    N = o.shape[0]
    rng = np.random.default_rng(1)
    excl = jnp.asarray(rng.integers(-1, 900, N).astype(np.int32))
    tmax = jnp.asarray(np.where(rng.random(N) < 0.5, np.inf,
                                rng.uniform(1, 10, N)).astype(np.float32))
    a0, _ = traverse_pallas(nodes, leaf, tris9, o, d, exclude=excl,
                            t_max=tmax, **kw)
    _, _, c0 = traverse_pallas(nodes, leaf, tris9, o, d, count_steps=True,
                               **kw)
    for la in (1, 2):
        for stream in (False, True):
            i1, t1 = traverse_pallas(nodes, leaf, tris9, o, d,
                                     stream=stream, leaf_aabb=la, **kw)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        a1, _ = traverse_pallas(nodes, leaf, tris9, o, d, exclude=excl,
                                t_max=tmax, leaf_aabb=la, **kw)
        np.testing.assert_array_equal(np.asarray(a0) >= 0,
                                      np.asarray(a1) >= 0)
        _, _, c1 = traverse_pallas(nodes, leaf, tris9, o, d,
                                   count_steps=True, leaf_aabb=la, **kw)
        assert np.asarray(c1)[:, 3].sum() <= np.asarray(c0)[:, 3].sum()


def test_anyhit_occlusion_matches_ground_truth():
    """Any-hit occlusion mode (exclude + t_max): occluded iff some tri
    other than the per-ray excluded one is hit closer than t_max."""
    tris, o, d = random_scene(500, 3000, seed=2)
    bvh = build_bvh(tris)
    st = tris[np.asarray(bvh["perm"])]
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, st)
    N = o.shape[0]
    rng = np.random.default_rng(0)
    excl = jnp.asarray(rng.integers(-1, 500, N).astype(np.int32))
    tmax = jnp.asarray(np.where(rng.random(N) < 0.5, np.inf,
                                rng.uniform(1, 10, N)).astype(np.float32))

    ai, _ = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                            max_leaf=bvh["max_leaf"], interpret=True,
                            sub=8, exclude=excl, t_max=tmax)
    occ = np.asarray(ai) >= 0

    # Ground truth: brute nearest is NOT enough (the nearest hit may be
    # excluded); scan all tris per ray.
    v0 = st[:, 0]
    e1 = st[:, 1] - st[:, 0]
    e2 = st[:, 2] - st[:, 0]
    on, dn = np.asarray(o), np.asarray(d)
    for k in range(0, N, 7):  # spot-check every 7th ray
        p = np.cross(dn[k], e2)
        det = (e1 * p).sum(1)
        inv = 1.0 / np.where(np.abs(det) < 1e-30, 1e-30, det)
        tv = on[k] - v0
        u = (tv * p).sum(1) * inv
        q = np.cross(tv, e1)
        vv = (dn[k] * q).sum(1) * inv
        t = (e2 * q).sum(1) * inv
        ok = ((np.abs(det) > 1e-7) & (u >= 0) & (u <= 1) & (vv >= 0)
              & (u + vv <= 1) & (t >= 0) & (t < float(tmax[k])))
        if int(excl[k]) >= 0:
            ok[int(excl[k])] = False
        assert occ[k] == ok.any(), k
