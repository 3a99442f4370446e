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
    """8-wide collapse (ops/bvh_wide.py) vs the per-ray reference walk,
    VMEM and HBM-streaming variants, across depths that exercise a
    remainder root (D mod 3 = 0, 1, 2)."""
    from elevenrender_tpu.ops.bvh_wide import pack_bvh_wide, traverse_wide
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
    from elevenrender_tpu.ops.bvh_wide import pack_bvh_wide, traverse_wide
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
    assert c.shape[1] == 3 and (c >= 0).all()
    visits, leafrows, leafparents = c[:, 0], c[:, 1], c[:, 2]
    assert (visits >= 1).all()
    assert (leafparents <= visits).all()
    # Each counted leaf-parent visit scans at least one row per
    # overlapping child.
    assert (leafrows >= leafparents).all()

    _, _, c2 = traverse_pallas(nodes, leaf, tris9, o, d, depth=bvh["depth"],
                               max_leaf=bvh["max_leaf"], interpret=True,
                               sub=8, stream=True, count_steps=True)
    np.testing.assert_array_equal(c, np.asarray(c2))
