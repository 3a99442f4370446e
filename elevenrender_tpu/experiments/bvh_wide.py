"""8-wide BVH packet traversal — EXPERIMENTAL (demoted from the
supported matrix in r4): it measured at best +5-6%% on fully-shuffled
isolated stream traversals but lost the full 1M-tri integrator step
11.4 s vs 7.9 s per sample against the binary kernel (docs/PERF.md
"8-wide fate"; .runlogs/sweep_frontier.log, integrator_1m_wide.log).
Kept with its parity tests: the collapse of the binary tree (VERDICT r2
ask #4: traversal is ~78% of the step and interior-step-bound).

The reference walks a fixed-depth COMPLETE binary tree with implicit
children (/root/reference/src/BVH.cpp:63-130).  The Pallas packet kernel
(ops/bvh_pallas.py) reproduces that shape; its cost is the scalar-driven
walk — every interior visit pays a row fetch, a dynamic lane rotate, two
slab tests, two horizontal reductions, and stack bookkeeping, all
serialized on the scalar unit while the VPU idles.

This kernel collapses THREE binary levels into one 8-wide level:
- The build is unchanged (binary SAH split, exact reference parity, and
  the leaf order / tri table are shared with the binary kernel).  At pack
  time, each wide node's row stores the AABBs of its 8 binary descendants
  three levels down; intermediate-level boxes are never stored or tested.
- One visit = ONE dynamic-sublane row fetch + 8 slab tests at STATIC lane
  offsets (the per-parent row removes the dynamic rotate entirely) —
  versus 7 binary visits (7 fetches + 7 rotates + 14 slab tests) for the
  same subtree.
- The wide tree has ceil(D/3) levels, so the traversal stack and the
  while_loop trip count shrink ~3x.

Layout (all rows 128 lanes, 8 entries x 16 lanes):
- nodes8 f32 [sum(level sizes), 128]: row of wide node (k, i) at
  level_offset[k] + i; entry e lanes 0-2 = child e bmin, 3-5 = bmax.
  Children of (k, i) are the binary nodes at depth d_list[k+1] (or D, the
  leaves, for the last level), indices i*8+e left-to-right.  A root with
  2^(D mod 3) < 8 children pads the rest with far point-boxes (slab test
  can never pass).
- leaf8 i32 [8^(M-1) rows, 128]: last-level rows; entry e lanes 0/1 =
  leaf child e's [from, to) range in the leaf-ordered tri table.
- tris9: SAME packed table as the binary kernel (pack_bvh_for_pallas) —
  the in-place SAH partition (BVH.cpp:402-414) makes any subtree's tris
  contiguous, so a last-level visit's 8 leaf ranges tile one contiguous
  burst and (with stream=True) ONE DMA feeds all 8 child scans.

Traversal: visit pops (level, index) pairs; descends immediately into
the nearest overlapping child (argmin of slab entry distances) and
pushes the remaining overlapping children in fixed order — the cheap
approximation of the binary kernel's near-child-first ordering without
an 8-element scalar sorting network.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ENTRY_LANES = 16
WIDE = 8


def wide_levels(depth: int) -> list[int]:
    """Binary depths of the wide interior levels: [0, r, r+3, ..., D-3]
    (r = D mod 3; the remainder rides at the ROOT, which then has 2^r
    children).  Requires depth >= 3."""
    assert depth >= 3, "wide BVH needs depth >= 3"
    r = depth % 3
    return [0] + list(range(r if r else 3, depth - 2, 3))


def _kernel(nodes_ref, leaf_ref, tri_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, idx_out, t_out, *, depth, max_leaf,
            stack_smem, tri_scratch=None, dma_sem=None, rows8=0,
            counts_out=None):
    count = counts_out is not None
    D = depth
    d_list = wide_levels(D)
    M = len(d_list)
    level_off = [0]
    for d in d_list[1:]:
        level_off.append(level_off[-1] + (1 << d_list[len(level_off) - 1]))
    # level_off[k] = sum of 2^d for prior levels.
    stream = tri_scratch is not None

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def row_offset(k):
        off = jnp.int32(level_off[0])
        for kk in range(1, M):
            off = jnp.where(k == kk, jnp.int32(level_off[kk]), off)
        return off

    def aabb_any(box, best_t):
        """Tile slab test against one child box (6 scalars) — identical
        semantics to the binary kernel (bvh_pallas.aabb_any): overlap
        that could still improve (tmin < best_t is exact under the
        strict-'<' nearest rule), plus the tile's min entry distance."""
        bx1, by1, bz1, bx2, by2, bz2 = box
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
        near = jnp.min(jnp.where(hit, tmin, jnp.inf))
        return jnp.any(hit), near

    def leaf_scan(frm, to, best_idx, best_t, base_row=None):
        """Same group-of-8 scan as the binary kernel (bvh_pallas
        leaf_scan); trip count is the leaf's actual row span."""
        n_groups = jnp.where(to > frm,
                             ((to - 1) >> 3) - (frm >> 3) + 1, 0)

        def group_body(g, carry):
            best_idx, best_t = carry
            row_i = (frm >> 3) + g
            if stream:
                rel = jnp.clip(row_i - base_row, 0, rows8 - 1)
                trow = tri_scratch[pl.ds(rel, 1), :]
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
            else:
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
                trow = tri_ref[pl.ds(row_i, 1), :]
            for e in range(WIDE):
                slot = (row_i << 3) + e
                base = e * ENTRY_LANES
                v0x = trow[0, base + 0]
                v0y = trow[0, base + 1]
                v0z = trow[0, base + 2]
                e1x = trow[0, base + 3]
                e1y = trow[0, base + 4]
                e1z = trow[0, base + 5]
                e2x = trow[0, base + 6]
                e2y = trow[0, base + 7]
                e2z = trow[0, base + 8]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                in_leaf = (slot >= frm) & (slot < to)
                ok = (in_leaf
                      & (jnp.abs(det) > 1e-7)
                      & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= 0.0) & (t < best_t))
                best_idx = jnp.where(ok, slot, best_idx)
                best_t = jnp.where(ok, t, best_t)
            return best_idx, best_t

        return jax.lax.fori_loop(0, n_groups, group_body,
                                 (best_idx, best_t))

    def cond(state):
        return ~state[0]

    def body(state):
        if count:
            done, k, i, sp, best_idx, best_t, visits, leafrows, dmas = state
        else:
            done, k, i, sp, best_idx, best_t = state
        row = nodes_ref[pl.ds(row_offset(k) + i, 1), :]

        hits = []
        nears = []
        for e in range(WIDE):
            b = e * ENTRY_LANES
            box = (row[0, b + 0], row[0, b + 1], row[0, b + 2],
                   row[0, b + 3], row[0, b + 4], row[0, b + 5])
            h, nr = aabb_any(box, best_t)
            hits.append(h)
            nears.append(nr)

        is_last = k == M - 1

        def do_leaves(c):
            if count:
                best_idx, best_t, leafrows, dmas = c
            else:
                best_idx, best_t = c
            lrow = leaf_ref[pl.ds(i, 1), :]
            frms = [lrow[0, e * ENTRY_LANES + 0] for e in range(WIDE)]
            tos = [lrow[0, e * ENTRY_LANES + 1] for e in range(WIDE)]
            base_row = None
            if stream:
                # The 8 child ranges tile the contiguous [frms[0],
                # tos[7]): one fixed-size DMA window serves every scan
                # (table is padded at pack time so the window never runs
                # off the end).
                base_row = frms[0] >> 3
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(base_row, rows8), :],
                    tri_scratch, dma_sem)
                dma.start()
                dma.wait()
            sc = (best_idx, best_t)
            for e in range(WIDE):
                sc = jax.lax.cond(
                    hits[e],
                    (lambda c, e=e: leaf_scan(frms[e], tos[e], *c,
                                              base_row)),
                    lambda c: c, sc)
            if not count:
                return sc

            def groups(f, t):
                return jnp.where(t > f, ((t - 1) >> 3) - (f >> 3) + 1, 0)

            for e in range(WIDE):
                leafrows = leafrows + jnp.where(hits[e],
                                                groups(frms[e], tos[e]), 0)
            return sc + (leafrows, dmas + 1)

        leaf_carry = ((best_idx, best_t, leafrows, dmas) if count
                      else (best_idx, best_t))
        leaf_carry = jax.lax.cond(
            is_last & functools.reduce(jnp.logical_or, hits),
            do_leaves, lambda c: c, leaf_carry)
        if count:
            best_idx, best_t, leafrows, dmas = leaf_carry
        else:
            best_idx, best_t = leaf_carry

        # Interior: descend into the nearest overlapping child, push the
        # rest (fixed order).  Masked nears are +inf, so argmin lands on
        # a hit child whenever one exists.
        can_desc = ~is_last
        e_star = jnp.int32(0)
        n_star = nears[0]
        for e in range(1, WIDE):
            better = nears[e] < n_star
            e_star = jnp.where(better, jnp.int32(e), e_star)
            n_star = jnp.where(better, nears[e], n_star)
        any_h = functools.reduce(jnp.logical_or, hits) & can_desc

        child_base = i * WIDE
        for e in range(WIDE - 1, -1, -1):
            push_e = hits[e] & can_desc & (e != e_star)

            @pl.when(push_e)
            def _(e=e, push_e=push_e):
                stack_smem[sp, 0] = k + 1
                stack_smem[sp, 1] = child_base + e
            sp = sp + push_e.astype(jnp.int32)

        pop = ~any_h
        sp_pop = jnp.maximum(sp - 1, 0)
        popped_k = stack_smem[sp_pop, 0]
        popped_i = stack_smem[sp_pop, 1]
        sp = jnp.where(pop, sp_pop, sp)

        k = jnp.where(pop, popped_k, k + 1)
        i = jnp.where(pop, popped_i, child_base + e_star)
        done = pop & (popped_k < 0)
        if count:
            return (done, k, i, sp, best_idx, best_t,
                    visits + 1, leafrows, dmas)
        return done, k, i, sp, best_idx, best_t

    stack_smem[0, 0] = -1  # sentinel
    stack_smem[0, 1] = 0
    init = (False, jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.full(ox.shape, -1, jnp.int32),
            jnp.full(ox.shape, jnp.inf, jnp.float32))
    if count:
        init = init + (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    idx_out[...] = out[4]
    t_out[...] = out[5]
    if count:
        counts_out[...] = jnp.stack(
            [jnp.full((LANE,), out[6], jnp.int32),
             jnp.full((LANE,), out[7], jnp.int32),
             jnp.full((LANE,), out[8], jnp.int32),
             jnp.zeros((LANE,), jnp.int32)])


@functools.partial(jax.jit, static_argnames=("depth", "max_leaf",
                                             "interpret", "chunk", "stream",
                                             "sub", "count_steps"))
def traverse_wide(nodes8, leaf8, tris9, ray_o, ray_d, depth: int,
                  max_leaf: int, interpret: bool = False,
                  chunk: int = 512, stream: bool = False, sub: int = 8,
                  count_steps: bool = False):
    """8-wide packet traversal.  nodes8/leaf8 from pack_bvh_wide; tris9
    is the SAME table as the binary kernel's (pack_bvh_for_pallas).
    Returns (idx [N] i32 leaf-order tri index, -1 on miss; t [N] f32).
    Args as traverse_pallas (ops/bvh_pallas.py); count_steps returns the
    same [NT, 3] (visits, leaf rows, leaf-node visits) counters."""
    N = ray_o.shape[0]
    tile = sub * LANE
    CHUNK = min(chunk, max(-(-N // tile), 1))
    pad = (-N) % (tile * CHUNK)
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], ray_d.dtype),
                             (pad, 1))])
    NP = N + pad
    NT = NP // tile
    n_chunks = NT // CHUNK

    comps = []
    for arr in (ray_o, ray_d):
        for c in range(3):
            comps.append(arr[:, c].reshape(n_chunks, CHUNK, sub, LANE))

    M = len(wide_levels(depth))
    # Worst-case stack: 7 deferred children per level + sentinel + slack.
    stack_rows = 7 * M + 4

    # Streaming scratch: rows covering a last-level node's worst-case
    # contiguous 8-leaf span, plus row slack, 8-aligned (see
    # bvh_pallas.traverse_pallas rows2 — non-8-aligned dynamic DMA
    # extents crashed the worker).
    rows8 = (WIDE * max_leaf + 7) // WIDE + 1
    rows8 = -(-rows8 // 8) * 8
    scratch_shapes = [pltpu.SMEM((stack_rows, 2), jnp.int32)]
    if stream:
        tris_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes += [pltpu.VMEM((rows8, LANE), jnp.float32),
                           pltpu.SemaphoreType.DMA(())]
    else:
        tris_spec = pl.BlockSpec(tris9.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((CHUNK, sub, LANE), jnp.int32),
        jax.ShapeDtypeStruct((CHUNK, sub, LANE), jnp.float32),
    ]
    if count_steps:
        out_specs.append(pl.BlockSpec((1, 4, LANE), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((CHUNK, 4, LANE), jnp.int32))

    grid_spec = pl.GridSpec(
        grid=(CHUNK,),
        in_specs=[
            pl.BlockSpec(nodes8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(leaf8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tris_spec,
        ] + [
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def kernel(nodes_ref, leaf_ref, tri_ref, *rest):
        refs = rest[:6]
        rest = rest[6:]
        if count_steps:
            idx_out, t_out, counts, stack = rest[:4]
            rest = rest[4:]
        else:
            idx_out, t_out, stack = rest[:3]
            counts = None
            rest = rest[3:]
        tri_scratch = rest[0] if stream else None
        dma_sem = rest[1] if stream else None
        sq = [r[0] for r in refs]

        def squeeze_out(ref):
            class _W:
                def __setitem__(self, key, v):
                    ref[0] = v
            return _W()

        _kernel(nodes_ref, leaf_ref, tri_ref, *sq,
                squeeze_out(idx_out), squeeze_out(t_out),
                depth=depth, max_leaf=max_leaf, stack_smem=stack,
                tri_scratch=tri_scratch, dma_sem=dma_sem, rows8=rows8,
                counts_out=squeeze_out(counts) if count_steps else None)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    def one_chunk(chunk_comps):
        return call(nodes8, leaf8, tris9, *chunk_comps)

    outs = jax.lax.map(one_chunk, tuple(comps))
    idx, t = outs[0], outs[1]
    if count_steps:
        counts = outs[2][:, :, :3, 0].reshape(-1, 3)
        return idx.reshape(-1)[:N], t.reshape(-1)[:N], counts
    return idx.reshape(-1)[:N], t.reshape(-1)[:N]


def pack_bvh_wide(bvh: dict) -> tuple:
    """Host-side collapse of the binary BVH (build_bvh output) into the
    8-wide tables.  Returns (nodes8 f32 [R,128], leaf8 i32 [R_last,128]).
    The tri table is unchanged — reuse pack_bvh_for_pallas's tris9."""
    import numpy as np
    from ..ops.bvh import preorder_indices

    D = bvh["depth"]
    d_list = wide_levels(D)
    M = len(d_list)
    pre = preorder_indices(D)

    sizes = [1 << d for d in d_list]
    total = sum(sizes)
    # Empty entries: far point-box — per-axis slab values differ across
    # axes, so tmin > tmax and the test can never pass.
    nodes = np.zeros((total, LANE), np.float32)
    for e in range(WIDE):
        nodes[:, e * ENTRY_LANES:e * ENTRY_LANES + 6] = 1e30

    off = 0
    for k, d in enumerate(d_list):
        dn = D if k == M - 1 else d_list[k + 1]
        Bk = 1 << (dn - d)
        n_par = sizes[k]
        child_pre = pre[dn]
        rows = off + np.arange(n_par)
        for c in range(Bk):
            idxs = child_pre[np.arange(n_par) * Bk + c]
            b = c * ENTRY_LANES
            nodes[rows, b + 0:b + 3] = bvh["node_bmin"][idxs]
            nodes[rows, b + 3:b + 6] = bvh["node_bmax"][idxs]
        off += n_par

    n_last = sizes[M - 1]
    leaf = np.zeros((n_last, LANE), np.int32)
    leaf_pre = pre[D]
    B_last = 1 << (D - d_list[M - 1])
    rows = np.arange(n_last)
    for c in range(B_last):
        idxs = leaf_pre[rows * B_last + c]
        leaf[rows, c * ENTRY_LANES + 0] = bvh["node_from"][idxs]
        leaf[rows, c * ENTRY_LANES + 1] = bvh["node_to"][idxs]
    return jnp.asarray(nodes), jnp.asarray(leaf)
