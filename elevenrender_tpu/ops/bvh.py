"""BVH: binned-SAH build (vectorized host) + stack traversal (jitted jnp).

TPU-native re-design of /root/reference/src/BVH.{h,cpp}:

- Same topology: a fixed-depth *complete* binary tree with leaves only at
  max depth and implicit children computable from the node index
  (left = idx+1, right = idx + 2^(D-d), preorder layout — BVH.cpp:122-130).
  That layout is index arithmetic, no pointers — already ideal for TPU.
- Same split policy: binned SAH, BVH_SAHBINS=14 bins per axis
  (BVH.cpp:327-415), bin = map(centroid, b1, b2, 0, bins-1) truncated,
  first-minimum tie-break in (axis, bin) order, left = bin < bestBin,
  empty-child bounds = (0,0,0) and "empty iff surface area <= 0" union
  semantics (BVH.cpp:447-472).
- The *build* is level-order and fully vectorized numpy: each level
  partitions every node at once via stable sorts + segment reductions,
  instead of the reference's per-node recursion — O(D) numpy passes total.
- Depth is adaptive by default (the reference hard-codes 18 even for a
  36-tri box, Definitions.h:13); pass ``depth=`` for the fixed behavior.
- Triangles are stored *permuted* into leaf order, so a leaf is a
  contiguous slice and the traversal's ``triIdx`` equals the sorted
  position, matching the reference's ``nearestHit.triIdx = i``
  (BVH.cpp:116) semantics used by the self-shadow test.

Traversal is a lax.while_loop over a per-ray explicit stack — the
vectorized analog of the reference's 64-deep stack walk (BVH.cpp:63-103),
with leaf intersection at depth D-1 via a static-size padded scan.  All
rays advance in lockstep with masks; finished lanes idle.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .intersect import moller_trumbore

SAH_BINS = 14  # Definitions.h:14
MAX_DEPTH = 18  # Definitions.h:13
# Deepest tree whose node+leaf tables fit the Pallas kernels' VMEM
# budget (2^(D+8) B each — 8MB+8MB at 15); auto depth clamps here.
STREAM_MAX_DEPTH = 15


def _bounds_area(bmin, bmax):
    """2*(xy+xz+yz) (BVH.cpp:474-482); negative extents allowed as in ref."""
    d = bmax - bmin
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2]
                  + d[..., 1] * d[..., 2])


def default_depth(tri_count: int) -> int:
    """Adaptive depth targeting ~32 tris/leaf, clamped to
    [1, STREAM_MAX_DEPTH].

    Leaf scans in the packet kernel are fully vectorized over the ray
    tile while interior steps are scalar-serial, so fat leaves win: a
    depth sweep on the 66k-tri bench scene measured the minimum at
    ~32 tris/leaf (2.2x faster than the 4 tris/leaf a CPU tracer
    would pick).

    The upper clamp is STREAM_MAX_DEPTH (15), not the reference's 18
    (Definitions.h:13): the Pallas kernels keep the node/leaf tables
    VMEM-resident (2^(D+8) bytes — 8MB at 15), so auto mode grows
    leaves past ~1M tris (mean 2^(log2(T)-15) tris/leaf) instead of
    deepening into a depth the fast kernels cannot take.  Explicit
    ``bvh_depth=`` still goes to MAX_DEPTH for reference-shape parity
    (trace falls back to the jnp packet path above 15 — see
    integrator._resolve_trace_mode)."""
    if tri_count <= 4:
        return 1
    return int(np.clip(np.ceil(np.log2(tri_count / 32.0)), 1,
                       STREAM_MAX_DEPTH))


def preorder_indices(depth: int) -> list[np.ndarray]:
    """Preorder index of each node per level for a complete tree.

    level d has 2^d nodes in left-to-right order; children of preorder
    node idx at depth d are idx+1 and idx + 2^(D-d) (BVH.cpp:122-130).
    """
    idx = [np.zeros(1, np.int64)]
    for d in range(1, depth + 1):
        parent = idx[d - 1]
        child = np.empty(1 << d, np.int64)
        child[0::2] = parent + 1
        child[1::2] = parent + (1 << (depth - (d - 1)))
        idx.append(child)
    return idx


def build_bvh(tri_verts: np.ndarray, depth: int | None = None,
              use_native: bool | None = None) -> dict:
    """Build the flat BVH arrays.

    tri_verts: [T, 3, 3] float32.  Returns a dict of numpy arrays:
      node_bmin/node_bmax [NN,3] f32, node_from/node_to [NN] i32,
      perm [T] i32 (leaf-order permutation of the input tris),
      depth (python int), max_leaf (python int).

    Uses the C++ builder (native/elevenrt.cpp) when available — same split
    policy, ~10x faster on large scenes; set ELEVENRT_NATIVE=0 or
    use_native=False to force the vectorized numpy path.
    """
    import os
    T = tri_verts.shape[0]
    if depth is None:
        depth = default_depth(T)
    if use_native is None:
        use_native = os.environ.get("ELEVENRT_NATIVE", "1") != "0"
    if use_native and T > 0:
        from .native import build_bvh_native
        out = build_bvh_native(np.asarray(tri_verts, np.float32), depth)
        if out is not None:
            return out
    D = depth
    NN = (1 << (D + 1)) - 1

    node_bmin = np.zeros((NN, 3), np.float32)
    node_bmax = np.zeros((NN, 3), np.float32)
    node_from = np.zeros(NN, np.int32)
    node_to = np.zeros(NN, np.int32)

    if T == 0:
        return dict(node_bmin=node_bmin, node_bmax=node_bmax,
                    node_from=node_from, node_to=node_to,
                    perm=np.zeros(0, np.int32), depth=D, max_leaf=1)

    tbmin = tri_verts.min(axis=1)  # [T,3]
    tbmax = tri_verts.max(axis=1)
    cent = ((tri_verts[:, 0] + tri_verts[:, 1] + tri_verts[:, 2]) / 3.0)

    pre = preorder_indices(D)

    perm = np.arange(T, dtype=np.int64)
    # Node id (within level) of each tri; tris stay sorted by node id.
    node_of = np.zeros(T, np.int64)
    # Segment offsets for the current level: starts[n] .. starts[n+1].
    starts = np.array([0, T], np.int64)

    for d in range(D + 1):
        n_nodes = 1 << d
        counts = starts[1:] - starts[:-1]
        nonempty = counts > 0

        # Vertex bounds per node (empty -> zeros, matching the reference's
        # default-constructed Vector3 bounds).
        bmin = np.zeros((n_nodes, 3), np.float64)
        bmax = np.zeros((n_nodes, 3), np.float64)
        if nonempty.any():
            pmin = tbmin[perm]
            pmax = tbmax[perm]
            acc_min = np.full((n_nodes, 3), np.inf)
            acc_max = np.full((n_nodes, 3), -np.inf)
            np.minimum.at(acc_min, node_of, pmin)
            np.maximum.at(acc_max, node_of, pmax)
            bmin[nonempty] = acc_min[nonempty]
            bmax[nonempty] = acc_max[nonempty]

        node_bmin[pre[d]] = bmin.astype(np.float32)
        node_bmax[pre[d]] = bmax.astype(np.float32)

        if d == D:
            # Leaves: contiguous ranges in the permuted order.
            node_from[pre[d]] = starts[:-1].astype(np.int32)
            node_to[pre[d]] = starts[1:].astype(np.int32)
            break

        # --- binned SAH over 3 axes x SAH_BINS (BVH.cpp:327-415) ---------
        c = cent[perm]                    # [t,3]
        b1 = bmin[node_of]                # per-tri node bounds
        b2 = bmax[node_of]
        ext = b2 - b1
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = (c - b1) / ext
        rel = np.where(ext != 0.0, rel, 0.0)   # guard at BVH.cpp:362
        bins = np.clip((rel * (SAH_BINS - 1)).astype(np.int64), 0, SAH_BINS - 1)

        best_heur = np.full(n_nodes, np.inf)
        best_axis = np.zeros(n_nodes, np.int64)
        best_bin = np.zeros(n_nodes, np.int64)

        for axis in range(3):
            key = node_of * SAH_BINS + bins[:, axis]
            cnt = np.bincount(key, minlength=n_nodes * SAH_BINS)
            cnt = cnt.reshape(n_nodes, SAH_BINS)
            bin_min = np.full((n_nodes * SAH_BINS, 3), np.inf)
            bin_max = np.full((n_nodes * SAH_BINS, 3), -np.inf)
            np.minimum.at(bin_min, key, tbmin[perm])
            np.maximum.at(bin_max, key, tbmax[perm])
            bin_min = bin_min.reshape(n_nodes, SAH_BINS, 3)
            bin_max = bin_max.reshape(n_nodes, SAH_BINS, 3)
            # Reference union skips "empty" operands (area <= 0,
            # BVH.cpp:447-460); an unfilled bin here is +-inf which we
            # replace by the zero bounds the reference would keep.
            empty_bin = cnt == 0
            bin_min[empty_bin] = 0.0
            bin_max[empty_bin] = 0.0
            bin_area = _bounds_area(bin_min, bin_max)
            bin_empty = bin_area <= 0.0  # includes degenerate flat bins

            # Prefix/suffix folds of (bounds union, count) over bins with
            # the reference's empty-skip semantics.
            def sweep(idx_order):
                accs_min = np.zeros((n_nodes, SAH_BINS + 1, 3))
                accs_max = np.zeros((n_nodes, SAH_BINS + 1, 3))
                acc_min = np.zeros((n_nodes, 3))
                acc_max = np.zeros((n_nodes, 3))
                acc_empty = np.ones(n_nodes, bool)
                for k, j in enumerate(idx_order):
                    accs_min[:, k] = acc_min
                    accs_max[:, k] = acc_max
                    take_bin = ~bin_empty[:, j]
                    use_bin = take_bin & acc_empty
                    both = take_bin & ~acc_empty
                    acc_min = np.where(use_bin[:, None], bin_min[:, j],
                                       np.where(both[:, None],
                                                np.minimum(acc_min, bin_min[:, j]),
                                                acc_min))
                    acc_max = np.where(use_bin[:, None], bin_max[:, j],
                                       np.where(both[:, None],
                                                np.maximum(acc_max, bin_max[:, j]),
                                                acc_max))
                    acc_empty = acc_empty & ~take_bin
                accs_min[:, SAH_BINS] = acc_min
                accs_max[:, SAH_BINS] = acc_max
                return accs_min, accs_max

            pref_min, pref_max = sweep(range(SAH_BINS))
            suff_min_r, suff_max_r = sweep(range(SAH_BINS - 1, -1, -1))
            # suffix fold k steps from the right == union of bins [S-k, S)
            cum = np.cumsum(cnt, axis=1)
            for i in range(SAH_BINS):
                count1 = cum[:, i - 1] if i > 0 else np.zeros(n_nodes, np.int64)
                count2 = cum[:, -1] - count1
                area1 = _bounds_area(pref_min[:, i], pref_max[:, i])
                area2 = _bounds_area(suff_min_r[:, SAH_BINS - i],
                                     suff_max_r[:, SAH_BINS - i])
                heur = area1 * count1 + area2 * count2
                upd = heur < best_heur
                best_heur = np.where(upd, heur, best_heur)
                best_axis = np.where(upd, axis, best_axis)
                best_bin = np.where(upd, i, best_bin)

        # --- partition (BVH.cpp:402-414): left iff bin < bestBin ---------
        tri_bin = bins[np.arange(len(perm)), best_axis[node_of]]
        go_left = tri_bin < best_bin[node_of]
        child = node_of * 2 + (~go_left).astype(np.int64)
        order = np.argsort(child, kind="stable")
        perm = perm[order]
        node_of = child[order]
        new_counts = np.bincount(child, minlength=2 * n_nodes)
        starts = np.concatenate([[0], np.cumsum(new_counts)])

    max_leaf = int((starts[1:] - starts[:-1]).max()) if T else 1
    return dict(node_bmin=node_bmin, node_bmax=node_bmax,
                node_from=node_from, node_to=node_to,
                perm=perm.astype(np.int32), depth=D,
                max_leaf=max(max_leaf, 1))


# ---------------------------------------------------------------------------
# Traversal (device)
# ---------------------------------------------------------------------------

def _minf(a, b):
    """Reference minf: a < b ? a : b (returns b on NaN)."""
    return jnp.where(a < b, a, b)


def _maxf(a, b):
    return jnp.where(a > b, a, b)


def aabb_hit(ray_o, inv_d, bmin, bmax):
    """Slab test, parity with BVH::intersect (BVH.cpp:27-61)."""
    t1 = (bmin[..., 0] - ray_o[..., 0]) * inv_d[..., 0]
    t2 = (bmax[..., 0] - ray_o[..., 0]) * inv_d[..., 0]
    t3 = (bmin[..., 1] - ray_o[..., 1]) * inv_d[..., 1]
    t4 = (bmax[..., 1] - ray_o[..., 1]) * inv_d[..., 1]
    t5 = (bmin[..., 2] - ray_o[..., 2]) * inv_d[..., 2]
    t6 = (bmax[..., 2] - ray_o[..., 2]) * inv_d[..., 2]
    tmin = _maxf(_maxf(_minf(t1, t2), _minf(t3, t4)), _minf(t5, t6))
    tmax = _minf(_minf(_maxf(t1, t2), _maxf(t3, t4)), _maxf(t5, t6))
    return ~((tmax < 0.0) | (tmin > tmax))


def traverse(bvh: dict, tri_verts, ray_o, ray_d, depth: int, max_leaf: int):
    """Find nearest hit for each ray.

    bvh: dict of device arrays (node_bmin [NN,3], node_bmax, node_from,
    node_to).  tri_verts: [T,3,3] in leaf (permuted) order.  ray_o/ray_d:
    [N,3] (directions unit length).  Returns (hit_idx [N] int32 — sorted
    tri position, -1 for miss; hit_t [N] f32).

    Vectorized analog of BVH::transverse (BVH.cpp:63-103): per-ray stack of
    (node, depth), children at idx+1 / idx + 2^(D-d), leaves intersected
    from depth D-1 (right child first), nearest by strict '<' on distance.
    """
    N = ray_o.shape[0]
    if tri_verts.shape[0] == 0:
        return jnp.full(N, -1, jnp.int32), jnp.full(N, jnp.inf, jnp.float32)
    D = depth
    S = D + 2  # sentinel + worst-case pushes

    inv_d = 1.0 / ray_d

    v0 = tri_verts[:, 0]
    v1 = tri_verts[:, 1]
    v2 = tri_verts[:, 2]

    def leaf_scan(child_idx, active, best_idx, best_t):
        frm = bvh["node_from"][child_idx]
        to = bvh["node_to"][child_idx]

        def body(j, carry):
            best_idx, best_t = carry
            slot = frm + j
            m = active & (slot < to)
            safe = jnp.clip(slot, 0, v0.shape[0] - 1)
            valid, t, _, _ = moller_trumbore(ray_o, ray_d,
                                             v0[safe], v1[safe], v2[safe])
            better = m & valid & (t < best_t)
            best_idx = jnp.where(better, slot, best_idx)
            best_t = jnp.where(better, t, best_t)
            return best_idx, best_t

        return jax.lax.fori_loop(0, max_leaf, body, (best_idx, best_t))

    def cond(state):
        return jnp.any(~state[0])

    def body(state):
        done, node, ndep, stack_node, stack_dep, sp, best_idx, best_t = state
        act = ~done

        shift = (jnp.uint32(1) << (D - ndep).astype(jnp.uint32)).astype(jnp.int32)
        l_idx = node + 1
        r_idx = node + shift
        nn = bvh["node_bmin"].shape[0]
        l_safe = jnp.clip(l_idx, 0, nn - 1)
        r_safe = jnp.clip(r_idx, 0, nn - 1)

        l_over = aabb_hit(ray_o, inv_d, bvh["node_bmin"][l_safe],
                          bvh["node_bmax"][l_safe]) & act
        r_over = aabb_hit(ray_o, inv_d, bvh["node_bmin"][r_safe],
                          bvh["node_bmax"][r_safe]) & act

        at_leaf_parent = (ndep == D - 1) & act
        # Right child first, then left (BVH.cpp:81-87).
        best_idx, best_t = leaf_scan(r_safe, at_leaf_parent & r_over,
                                     best_idx, best_t)
        best_idx, best_t = leaf_scan(l_safe, at_leaf_parent & l_over,
                                     best_idx, best_t)

        trav_l = l_over & ~at_leaf_parent
        trav_r = r_over & ~at_leaf_parent

        pop = ~trav_l & ~trav_r
        # Push right when traversing both.
        push = trav_l & trav_r
        sp_ins = jnp.clip(sp, 0, S - 1)
        stack_node = jnp.where(
            push[:, None] & (jnp.arange(S)[None, :] == sp_ins[:, None]),
            r_idx[:, None], stack_node)
        stack_dep = jnp.where(
            push[:, None] & (jnp.arange(S)[None, :] == sp_ins[:, None]),
            (ndep + 1)[:, None], stack_dep)
        sp = jnp.where(act & push, sp + 1, sp)

        # Next node: descend or pop.
        sp_pop = jnp.clip(sp - 1, 0, S - 1)
        popped_node = jnp.take_along_axis(stack_node, sp_pop[:, None], 1)[:, 0]
        popped_dep = jnp.take_along_axis(stack_dep, sp_pop[:, None], 1)[:, 0]
        next_node = jnp.where(trav_l, l_idx,
                              jnp.where(trav_r, r_idx, popped_node))
        next_dep = jnp.where(pop, popped_dep, ndep + 1)
        sp = jnp.where(act & pop, sp - 1, sp)

        done = done | (act & pop & (popped_node < 0))
        node = jnp.where(act, next_node, node)
        ndep = jnp.where(act, next_dep, ndep)
        return done, node, ndep, stack_node, stack_dep, sp, best_idx, best_t

    init = (
        jnp.zeros(N, bool) | (tri_verts.shape[0] == 0),
        jnp.zeros(N, jnp.int32),           # root
        jnp.zeros(N, jnp.int32),           # depth 0
        jnp.full((N, S), -1, jnp.int32),   # stack (slot 0 = sentinel)
        jnp.zeros((N, S), jnp.int32),
        jnp.ones(N, jnp.int32),            # sp = 1
        jnp.full(N, -1, jnp.int32),
        jnp.full(N, jnp.inf, jnp.float32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[6], out[7]


def traverse_packet(bvh: dict, tri_verts, ray_o, ray_d, depth: int,
                    max_leaf: int, tile: int = 128):
    """Packet traversal: tiles of rays share one BVH walk.

    The TPU-shaped redesign of the per-ray stack walk: XLA's per-lane
    gathers are near-scalar on TPU, so ``traverse`` pays ~N gathers per
    step.  Here all rays in a tile traverse together — node fetches are
    per-TILE (N/tile gathers, 100-1000x fewer) and every AABB slab test /
    triangle intersection is a broadcast over the tile's rays: pure VPU
    work with no data-dependent lanes.  A tile descends into a child if
    ANY of its rays overlaps it (classic packet tracing); masked rays ride
    along, which costs redundant tests but no extra memory traffic.

    Same results as ``traverse`` (nearest hit, strict '<'), modulo
    exact-distance ties visited in a different order.
    Rays are padded to a multiple of ``tile``.
    """
    N = ray_o.shape[0]
    if tri_verts.shape[0] == 0:
        return jnp.full(N, -1, jnp.int32), jnp.full(N, jnp.inf, jnp.float32)
    D = depth
    S = D + 2
    pad = (-N) % tile
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], ray_d.dtype),
                             (pad, 1))])
    NT = (N + pad) // tile
    o = ray_o.reshape(NT, tile, 3)
    dvec = ray_d.reshape(NT, tile, 3)
    inv_d = 1.0 / dvec

    v0 = tri_verts[:, 0]
    v1 = tri_verts[:, 1]
    v2 = tri_verts[:, 2]
    nn = bvh["node_bmin"].shape[0]

    def leaf_scan(child_idx, active, best_idx, best_t):
        # child_idx/active: [NT]; best: [NT, tile]
        frm = bvh["node_from"][child_idx]   # [NT]
        to = bvh["node_to"][child_idx]

        def body(j, carry):
            best_idx, best_t = carry
            slot = frm + j                   # [NT]
            m = active & (slot < to)
            safe = jnp.clip(slot, 0, v0.shape[0] - 1)
            valid, t, _, _ = moller_trumbore(
                o, dvec, v0[safe][:, None, :], v1[safe][:, None, :],
                v2[safe][:, None, :])
            better = m[:, None] & valid & (t < best_t)
            best_idx = jnp.where(better, slot[:, None], best_idx)
            best_t = jnp.where(better, t, best_t)
            return best_idx, best_t

        return jax.lax.fori_loop(0, max_leaf, body, (best_idx, best_t))

    def cond(state):
        return jnp.any(~state[0])

    def body(state):
        done, node, ndep, stack_node, stack_dep, sp, best_idx, best_t = state
        act = ~done                                   # [NT]

        shift = (jnp.uint32(1) << (D - ndep).astype(jnp.uint32)).astype(jnp.int32)
        l_idx = node + 1
        r_idx = node + shift
        l_safe = jnp.clip(l_idx, 0, nn - 1)
        r_safe = jnp.clip(r_idx, 0, nn - 1)

        # Per-tile node fetch, broadcast AABB test over the tile's rays.
        l_over_ray = aabb_hit(o, inv_d, bvh["node_bmin"][l_safe][:, None, :],
                              bvh["node_bmax"][l_safe][:, None, :])
        r_over_ray = aabb_hit(o, inv_d, bvh["node_bmin"][r_safe][:, None, :],
                              bvh["node_bmax"][r_safe][:, None, :])
        l_over = jnp.any(l_over_ray, axis=1) & act
        r_over = jnp.any(r_over_ray, axis=1) & act

        at_leaf_parent = (ndep == D - 1) & act
        best_idx, best_t = leaf_scan(r_safe, at_leaf_parent & r_over,
                                     best_idx, best_t)
        best_idx, best_t = leaf_scan(l_safe, at_leaf_parent & l_over,
                                     best_idx, best_t)

        trav_l = l_over & ~at_leaf_parent
        trav_r = r_over & ~at_leaf_parent

        pop = ~trav_l & ~trav_r
        push = trav_l & trav_r
        sp_ins = jnp.clip(sp, 0, S - 1)
        onehot = jnp.arange(S)[None, :] == sp_ins[:, None]
        stack_node = jnp.where(push[:, None] & onehot, r_idx[:, None],
                               stack_node)
        stack_dep = jnp.where(push[:, None] & onehot, (ndep + 1)[:, None],
                              stack_dep)
        sp = jnp.where(act & push, sp + 1, sp)

        sp_pop = jnp.clip(sp - 1, 0, S - 1)
        popped_node = jnp.take_along_axis(stack_node, sp_pop[:, None], 1)[:, 0]
        popped_dep = jnp.take_along_axis(stack_dep, sp_pop[:, None], 1)[:, 0]
        next_node = jnp.where(trav_l, l_idx,
                              jnp.where(trav_r, r_idx, popped_node))
        next_dep = jnp.where(pop, popped_dep, ndep + 1)
        sp = jnp.where(act & pop, sp - 1, sp)

        done = done | (act & pop & (popped_node < 0))
        node = jnp.where(act, next_node, node)
        ndep = jnp.where(act, next_dep, ndep)
        return done, node, ndep, stack_node, stack_dep, sp, best_idx, best_t

    init = (
        jnp.zeros(NT, bool),
        jnp.zeros(NT, jnp.int32),
        jnp.zeros(NT, jnp.int32),
        jnp.full((NT, S), -1, jnp.int32),
        jnp.zeros((NT, S), jnp.int32),
        jnp.ones(NT, jnp.int32),
        jnp.full((NT, tile), -1, jnp.int32),
        jnp.full((NT, tile), jnp.inf, jnp.float32),
    )
    out = jax.lax.while_loop(cond, body, init)
    best_idx = out[6].reshape(-1)[:N]
    best_t = out[7].reshape(-1)[:N]
    return best_idx, best_t


def brute_force(tri_verts, ray_o, ray_d, chunk: int = 512):
    """Reference fallback path (#if !USEBVH, kernel.cpp:224-238): test all
    triangles; chunked fori to bound memory.  Returns (hit_idx, hit_t)."""
    T = tri_verts.shape[0]
    N = ray_o.shape[0]
    if T == 0:
        return jnp.full(N, -1, jnp.int32), jnp.full(N, jnp.inf, jnp.float32)
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    v = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))

    def body(c, carry):
        best_idx, best_t = carry
        base = c * chunk
        vb = jax.lax.dynamic_slice_in_dim(v, base, chunk)  # [chunk,3,3]
        valid, t, _, _ = moller_trumbore(
            ray_o[:, None, :], ray_d[:, None, :],
            vb[None, :, 0], vb[None, :, 1], vb[None, :, 2])
        idx = base + jnp.arange(chunk)[None, :]
        valid = valid & (idx < T)
        t = jnp.where(valid, t, jnp.inf)
        arg = jnp.argmin(t, axis=1)
        tmin = jnp.take_along_axis(t, arg[:, None], 1)[:, 0]
        imin = jnp.take_along_axis(idx, arg[:, None], 1)[:, 0]
        better = tmin < best_t
        return (jnp.where(better, imin.astype(jnp.int32), best_idx),
                jnp.where(better, tmin, best_t))

    init = (jnp.full(N, -1, jnp.int32), jnp.full(N, jnp.inf, jnp.float32))
    return jax.lax.fori_loop(0, n_chunks, body, init)
