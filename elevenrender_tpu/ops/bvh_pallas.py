"""Pallas TPU packet-traversal kernel — the flagship native kernel.

Replaces BVH::transverse + Tri::hit (/root/reference/src/BVH.cpp:63-120,
Tri.h:41-144) with a TPU-shaped design:

- The ray grid is tiled; each grid step traverses the BVH ONCE for a tile
  of TILE rays (classic packet tracing).  Traversal state (node, depth,
  stack) is *scalar*; the stack lives in SMEM.
- Node AABBs and leaf triangles are fetched with scalar loads from
  VMEM-resident tables and broadcast to the whole tile — ZERO per-lane
  gathers, which XLA executes near-serially on TPU and which made the
  pure-jnp traversal memory-bound.
- Slab tests and Möller-Trumbore run as [8, TILE/8] vector ops on the
  VPU; a tile descends iff any of its rays overlaps the child.
- Unlike the lax.while_loop formulation, each tile runs its OWN trip
  count — no global lockstep against the slowest tile.

Limits (v1): the whole scene (node table + tri verts) must fit in VMEM —
fine to ~300k tris; larger scenes fall back to the jnp paths until the
HBM-streaming variant lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of rays traversed together: sublane x lane register shape.
SUB = 8
LANE = 128
TILE = SUB * LANE  # 1024


def _kernel(nodes_ref, leaf_ref, tri_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, idx_out, t_out, *, depth, max_leaf,
            stack_smem, use_cond=True):
    D = depth

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def aabb_any(n, best_t):
        """Slab test of the whole tile against node n's box; True if any
        ray overlaps (BVH.cpp:27-61 semantics) AND could still find a
        closer hit there (tmin > best_t prunes exactly: any hit inside has
        t >= tmin, and the nearest rule is strict '<')."""
        bx1 = nodes_ref[0, n]
        by1 = nodes_ref[1, n]
        bz1 = nodes_ref[2, n]
        bx2 = nodes_ref[3, n]
        by2 = nodes_ref[4, n]
        bz2 = nodes_ref[5, n]
        t1 = (bx1 - ox) * inv_x
        t2 = (bx2 - ox) * inv_x
        t3 = (by1 - oy) * inv_y
        t4 = (by2 - oy) * inv_y
        t5 = (bz1 - oz) * inv_z
        t6 = (bz2 - oz) * inv_z

        def mn(a, b):
            return jnp.where(a < b, a, b)

        def mx(a, b):
            return jnp.where(a > b, a, b)

        tmin = mx(mx(mn(t1, t2), mn(t3, t4)), mn(t5, t6))
        tmax = mn(mn(mx(t1, t2), mx(t3, t4)), mx(t5, t6))
        hit = ~((tmax < 0.0) | (tmin > tmax)) & (tmin < best_t)
        return jnp.any(hit)

    def leaf_scan(n, best_idx, best_t):
        frm = leaf_ref[0, n]
        to = leaf_ref[1, n]

        def tri_body(j, carry):
            best_idx, best_t = carry
            slot = frm + j

            def do(carry):
                best_idx, best_t = carry
                # Clamp the LOAD index (the cond-free variant reads past
                # `to` before masking); `ok` still uses the true slot.
                s = jnp.minimum(slot, tri_ref.shape[1] - 1)
                v0x = tri_ref[0, s]
                v0y = tri_ref[1, s]
                v0z = tri_ref[2, s]
                e1x = tri_ref[3, s] - v0x
                e1y = tri_ref[4, s] - v0y
                e1z = tri_ref[5, s] - v0z
                e2x = tri_ref[6, s] - v0x
                e2y = tri_ref[7, s] - v0y
                e2z = tri_ref[8, s] - v0z
                # pvec = d x e2
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                # qvec = tvec x e1
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((jnp.abs(det) > 1e-7)
                      & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= 0.0) & (t < best_t))
                return (jnp.where(ok, slot, best_idx),
                        jnp.where(ok, t, best_t))

            return jax.lax.cond(slot < to, do, lambda c: c,
                                (best_idx, best_t))

        return jax.lax.fori_loop(0, max_leaf, tri_body, (best_idx, best_t))

    def cond(state):
        return ~state[0]

    def body(state):
        done, node, ndep, sp, best_idx, best_t = state
        shift = jnp.int32(1) << (D - ndep)
        l_idx = node + 1
        r_idx = node + shift

        l_over = aabb_any(l_idx, best_t)
        r_over = aabb_any(r_idx, best_t)

        at_leaf_parent = ndep == D - 1

        # Right child first, then left (BVH.cpp:81-87).
        if use_cond:
            best_idx, best_t = jax.lax.cond(
                at_leaf_parent & r_over,
                lambda c: leaf_scan(r_idx, *c), lambda c: c,
                (best_idx, best_t))
            best_idx, best_t = jax.lax.cond(
                at_leaf_parent & l_over,
                lambda c: leaf_scan(l_idx, *c), lambda c: c,
                (best_idx, best_t))
        else:
            # Cond-free variant: scans run every iteration, results are
            # masked in.  More VPU work per step but simpler control flow
            # for Mosaic.
            take_r = at_leaf_parent & r_over
            bi, bt = leaf_scan(r_idx, best_idx, best_t)
            best_idx = jnp.where(take_r, bi, best_idx)
            best_t = jnp.where(take_r, bt, best_t)
            take_l = at_leaf_parent & l_over
            bi, bt = leaf_scan(l_idx, best_idx, best_t)
            best_idx = jnp.where(take_l, bi, best_idx)
            best_t = jnp.where(take_l, bt, best_t)

        trav_l = l_over & ~at_leaf_parent
        trav_r = r_over & ~at_leaf_parent
        push = trav_l & trav_r
        pop = ~trav_l & ~trav_r

        @pl.when(push)
        def _():
            stack_smem[sp, 0] = r_idx
            stack_smem[sp, 1] = ndep + 1

        sp_next = jnp.where(push, sp + 1, jnp.where(pop, sp - 1, sp))
        sp_pop = jnp.maximum(sp - 1, 0)
        popped_node = stack_smem[sp_pop, 0]
        popped_dep = stack_smem[sp_pop, 1]

        node = jnp.where(trav_l, l_idx,
                         jnp.where(trav_r, r_idx, popped_node))
        ndep = jnp.where(pop, popped_dep, ndep + 1)
        done = pop & (popped_node < 0)
        return done, node, ndep, sp_next, best_idx, best_t

    stack_smem[0, 0] = -1  # sentinel (transverse pushes invalid first)
    stack_smem[0, 1] = 0
    init = (False, jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.full((SUB, LANE), -1, jnp.int32),
            jnp.full((SUB, LANE), jnp.inf, jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    idx_out[...] = out[4]
    t_out[...] = out[5]


@functools.partial(jax.jit, static_argnames=("depth", "max_leaf",
                                             "interpret", "use_cond"))
def traverse_pallas(nodes, leaf, tris9, ray_o, ray_d, depth: int,
                    max_leaf: int, interpret: bool = False,
                    use_cond: bool = True):
    """nodes: [8, NN'] f32 (bmin3, bmax3, pad2); leaf: [2, NN'] i32
    (from, to); tris9: [9, T'] f32 in leaf order (component-major, see
    pack_bvh_for_pallas); ray_o/ray_d: [N, 3].
    Returns (idx [N] i32, t [N] f32)."""
    N = ray_o.shape[0]
    # Chunk tiles so the blocked ray arrays of one kernel launch stay well
    # inside VMEM (XLA scope-allocates all of a launch's operands; 64+
    # tiles of 6 ray components + 2 outputs blew the 16MB budget).
    CHUNK = 8
    pad = (-N) % (TILE * CHUNK)
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], ray_d.dtype),
                             (pad, 1))])
    NP = N + pad
    NT = NP // TILE
    n_chunks = NT // CHUNK

    comps = []
    for arr in (ray_o, ray_d):
        for c in range(3):
            comps.append(arr[:, c].reshape(n_chunks, CHUNK, SUB, LANE))

    nodes_shape = nodes.shape
    leaf_shape = leaf.shape
    tris_shape = tris9.shape

    grid_spec = pl.GridSpec(
        grid=(CHUNK,),
        in_specs=[
            # Whole tables with CONSTANT index maps: Mosaic then keeps ONE
            # VMEM buffer across grid steps (an unblocked spec allocated a
            # fresh copy per step -> scoped-VMEM OOM).
            pl.BlockSpec(nodes_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(leaf_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((depth + 2, 2), jnp.int32)],
    )

    def kernel(nodes_ref, leaf_ref, tri_ref, *rest):
        refs = rest[:6]
        idx_out, t_out, stack = rest[6], rest[7], rest[8]
        sq = [r[0] for r in refs]

        def squeeze_out(ref):
            class _W:
                def __setitem__(self, k, v):
                    ref[0] = v
            return _W()

        _kernel(nodes_ref, leaf_ref, tri_ref, *sq,
                squeeze_out(idx_out), squeeze_out(t_out),
                depth=depth, max_leaf=max_leaf, stack_smem=stack,
                use_cond=use_cond)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((CHUNK, SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((CHUNK, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )

    def one_chunk(chunk_comps):
        return call(nodes, leaf, tris9, *chunk_comps)

    idx, t = jax.lax.map(one_chunk, tuple(comps))
    return idx.reshape(-1)[:N], t.reshape(-1)[:N]


def pack_bvh_for_pallas(bvh: dict, tri_verts_sorted) -> tuple:
    """Host-side packing, component-major so the LARGE axis is the VMEM
    lane axis: nodes -> [8, NN'] f32 (bmin3, bmax3, pad2), leaves ->
    [2, NN'] i32, tris -> [9, T'] f32; NN'/T' padded to lane multiples.

    (A [N, 8] layout pads the 8 to 128 lanes in VMEM — a 16x memory
    blowup that OOM'd the 16MB scoped budget.)
    """
    import numpy as np

    def pad128(n):
        return -(-max(n, 1) // 128) * 128

    nn = bvh["node_bmin"].shape[0]
    nodes = np.zeros((8, pad128(nn)), np.float32)
    nodes[0:3, :nn] = bvh["node_bmin"].T
    nodes[3:6, :nn] = bvh["node_bmax"].T
    leaf = np.zeros((2, pad128(nn)), np.int32)
    leaf[0, :nn] = bvh["node_from"]
    leaf[1, :nn] = bvh["node_to"]
    tv = np.asarray(tri_verts_sorted, np.float32).reshape(-1, 9)
    tris9 = np.zeros((9, pad128(tv.shape[0])), np.float32)
    tris9[:, :tv.shape[0]] = tv.T
    return jnp.asarray(nodes), jnp.asarray(leaf), jnp.asarray(tris9)
