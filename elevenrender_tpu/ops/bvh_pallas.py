"""Pallas TPU packet-traversal kernel — the flagship native kernel.

Replaces BVH::transverse + Tri::hit (/root/reference/src/BVH.cpp:63-120,
Tri.h:41-144) with a TPU-shaped design:

- The ray grid is tiled; each grid step traverses the BVH ONCE for a tile
  of TILE rays (classic packet tracing).  Traversal state (node, depth,
  stack) is *scalar*; the stack lives in SMEM.
- Node AABBs and leaf triangles are fetched from VMEM-resident tables and
  broadcast to the whole tile — ZERO per-lane gathers (XLA executes those
  near-serially on TPU, which made the pure-jnp traversal memory-bound).
- Slab tests and Möller-Trumbore run as [8, TILE/8] vector ops on the
  VPU; a tile descends iff any of its rays overlaps the child, with exact
  early termination (a child whose entry distance exceeds every ray's
  current best is pruned).
- Each tile runs its OWN trip count — no global lockstep against the
  slowest tile (unlike a lax.while_loop over all rays).

Mosaic memory-layout constraints (learned the hard way on v5e):
- dynamic indexing is allowed on the SUBLANE (second-to-minor) dim only;
  lane indices must be static — so tables cannot be component-major.
- a [N, 8] row layout pads rows to 128 lanes (16x VMEM blowup -> scoped
  OOM at 65k tris).
The packing that satisfies both: EIGHT entries of 16 lanes per 128-lane
row.  Entry i lives at row i>>3, lanes (i&7)*16..+15.  One dynamic-
sublane vector load fetches the row; fields are extracted at static lane
positions and the entry is chosen with an (i&7)-select.  64 bytes/entry —
no padding waste; a 65k-tri scene needs ~8MB of VMEM.

Two triangle residencies (nodes/leaf tables are always VMEM-resident —
they are 2^(D+8) bytes total, 8MB at depth 15):
- VMEM (default, scenes to ~150k tris): the packed tri table rides in
  VMEM; leaf scans read it directly.
- HBM-streamed (``stream=True``, arbitrary T): the tri table stays in
  HBM (pl.ANY) and each leaf-parent visit DMAs its triangles into a VMEM
  scratch before scanning.  The two children of a leaf parent cover a
  CONTIGUOUS range [l_from, r_to) of the leaf-ordered tris (the SAH
  partition splits a parent's range in place, BVH.cpp:402-414), so ONE
  dynamic-start fixed-size DMA feeds both child scans.  This matches the
  reference's arbitrary-T traversal (BVH.cpp:63-120) at TPU bandwidth:
  the megakernel gathers tris from device memory per thread; here a
  whole packet shares each ~5KB contiguous burst.

Ray tiles must be spatially coherent — see ops/sort.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of rays traversed together: sublane x lane register shape.
# SUB is the default; traverse_pallas takes ``sub`` to widen the tile —
# a wider tile amortizes the scalar-driven walk over more rays per node
# visit but descends into the union of its rays' nodes.  32 matches the
# shipped RenderConfig.pallas_sub default (scripts/sweep_trav_kernels.py
# measured 32 fastest at 66k tris, coherent and sorted-incoherent;
# table in docs/PERF.md).
SUB = 32
LANE = 128
TILE = SUB * LANE  # 1024

ENTRY_LANES = 16
ENTRIES_PER_ROW = LANE // ENTRY_LANES  # 8


def _row_vec(ref, row):
    """One table row as a (1, 128) vector (dynamic sublane index)."""
    return ref[pl.ds(row, 1), :]


def _select_entry(vals, e):
    """vals: list of 8 per-entry scalars; pick entry e (scalar select)."""
    out = vals[0]
    for k in range(1, ENTRIES_PER_ROW):
        out = jnp.where(e == k, vals[k], out)
    return out


def _entry_scalars(row, e, lanes, use_roll: bool = True):
    """Extract per-entry fields: one dynamic lane-rotate brings entry e's
    16 lanes to position 0, then static extracts.  (The select fallback
    costs 8 extracts + a 7-way select PER FIELD — measured ~10x slower
    per node visit.)  Uses pltpu.roll: Mosaic lowers it to a native
    dynamic lane rotate, whereas jnp.roll with a traced shift becomes
    concat+dynamic_slice, which Mosaic cannot lower on the lane dim."""
    if use_roll:
        shift = (LANE - e * ENTRY_LANES) % LANE  # left-rotate by e*16
        shifted = pltpu.roll(row, shift, 1)
        return [shifted[0, c] for c in lanes]
    outs = []
    for c in lanes:
        cands = [row[0, k * ENTRY_LANES + c] for k in range(ENTRIES_PER_ROW)]
        outs.append(_select_entry(cands, e))
    return outs


def _kernel(nodes_ref, leaf_ref, tri_ref, ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, idx_out, t_out, *, depth, max_leaf,
            stack_smem, tri_scratch=None, dma_sem=None, rows2=0,
            counts_out=None, order="near", excl_ref=None, tmax_ref=None,
            leaf_mode="full", leaf_aabb=0):
    D = depth
    stream = tri_scratch is not None
    count = counts_out is not None
    sign_order = order == "sign"
    any_hit = excl_ref is not None

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    if any_hit:
        excl = excl_ref[...]
        tmax0 = tmax_ref[...]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz
    if sign_order:
        # Tile direction signs, ONCE per tile: order="sign" replaces the
        # per-visit min(near) horizontal reduction with a scalar select
        # against these three booleans (the classic packet-tracing
        # sign-ordering heuristic; result identical up to equal-t ties,
        # only visit ORDER/count changes).
        sgn = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)

    def aabb_any(box, best_t):
        """Slab test of the whole tile against one box (6 scalars).

        Returns (any_hit, near): any ray overlaps (BVH.cpp:27-61
        semantics) and could still improve (tmin >= best_t prunes exactly
        under the strict-'<' nearest rule); ``near`` is the tile's min
        entry distance, used for near-child-first ordering."""
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
        if sign_order:
            # Ordering comes from the packed sign code — skip the near
            # min entirely (one fewer horizontal reduction per visit).
            return jnp.any(hit), None
        # Keep any(hit) as its own predicate reduction: deriving it from
        # the float near-min (near < inf) measured 3x SLOWER at sub=8 —
        # the min lands on the critical scalar path, whereas Mosaic
        # schedules the predicate-or cheaply (A/B in docs/PERF.md).
        near = jnp.min(jnp.where(hit, tmin, jnp.inf))
        return jnp.any(hit), near

    def leaf_scan(frm, to, carry, base_row=None):
        """Intersect the leaf's contiguous [frm, to) range in groups of
        8 tris: one dynamic-sublane row load per group, all lane offsets
        static (e is the unrolled loop index).  Trip count is the leaf's
        ACTUAL row span, not the global max (leaves are skewed; paying
        max_leaf everywhere measured ~2-4x extra leaf work).

        ``carry``: (best_idx, best_t) (+ scanned-slot counter in count
        mode).  ``base_row``: when streaming, tri rows live in
        ``tri_scratch`` starting at this absolute row (set by do_leaves'
        DMA).

        ``leaf_aabb`` (static): 0 = scan every row; 1 = slab-test each
        row's packed AABB (spare lanes 9..14, already in the loaded row)
        and branch over the whole 8-tri Möller-Trumbore block when no
        ray can hit it (~33 vector ops to skip ~528); 2 = same at
        half-row granularity (two 4-tri boxes, lanes 25..30 / 73..78) —
        tighter boxes, two branches per row."""
        n_groups = jnp.where(to > frm,
                             ((to - 1) >> 3) - (frm >> 3) + 1, 0)

        def group_body(g, carry):
            row_i = (frm >> 3) + g
            if stream:
                rel = jnp.clip(row_i - base_row, 0, rows2 - 1)
                trow = _row_vec(tri_scratch, rel)
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
            else:
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
                trow = _row_vec(tri_ref, row_i)

            def mt_entries(entries):
                def run(c):
                    if count:
                        best_idx, best_t, scanned = c
                    else:
                        best_idx, best_t = c
                    for e in entries:
                        slot = (row_i << 3) + e
                        base = e * ENTRY_LANES
                        # Lanes: (v0, e1, e2) — edges precomputed at pack.
                        v0x = trow[0, base + 0]
                        v0y = trow[0, base + 1]
                        v0z = trow[0, base + 2]
                        e1x = trow[0, base + 3]
                        e1y = trow[0, base + 4]
                        e1z = trow[0, base + 5]
                        e2x = trow[0, base + 6]
                        e2y = trow[0, base + 7]
                        e2z = trow[0, base + 8]
                        # pvec = d x e2
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                                                  1e-30, det)
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
                        in_leaf = (slot >= frm) & (slot < to)
                        ok = (in_leaf
                              & (jnp.abs(det) > 1e-7)
                              & (u >= 0.0) & (u <= 1.0)
                              & (v >= 0.0) & (u + v <= 1.0)
                              & (t >= 0.0) & (t < best_t))
                        if any_hit:
                            # Occlusion query: exclude the per-ray source
                            # tri (the reference's self-hit triIdx check,
                            # kernel.cpp:556) in-kernel, and on ANY
                            # accepted hit make the lane inert (best_t =
                            # -inf: no further slab test or tri test can
                            # pass) — a fully-occluded tile then prunes
                            # every remaining node.
                            ok = ok & (slot != excl)
                            best_idx = jnp.where(ok, slot, best_idx)
                            best_t = jnp.where(ok, -jnp.inf, best_t)
                        else:
                            best_idx = jnp.where(ok, slot, best_idx)
                            best_t = jnp.where(ok, t, best_t)
                    if count:
                        return best_idx, best_t, scanned + len(entries)
                    return best_idx, best_t
                return run

            def box_at(lane0):
                # The box rides in the row just loaded — static lane
                # extracts, no extra memory traffic.  Empty groups are
                # packed as NaN boxes: every slab comparison is false,
                # so the test reports no overlap and the group skips.
                return tuple(trow[0, lane0 + k] for k in range(6))

            if leaf_aabb == 2:
                c = carry
                for lane0, lo, hi in ((25, 0, 4), (73, 4, 8)):
                    ghit = aabb_any(box_at(lane0), c[1])[0]
                    c = jax.lax.cond(ghit, mt_entries(range(lo, hi)),
                                     lambda x: x, c)
                return c
            full = mt_entries(range(ENTRIES_PER_ROW))
            if leaf_aabb == 1:
                rhit = aabb_any(box_at(9), carry[1])[0]
                return jax.lax.cond(rhit, full, lambda x: x, carry)
            return full(carry)

        return jax.lax.fori_loop(0, n_groups, group_body, carry)

    def cond(state):
        return ~state[0]

    def body(state):
        if count:
            (done, node, ndep, sp, best_idx, best_t,
             visits, leafrows, dmas, scanned) = state
        else:
            done, node, ndep, sp, best_idx, best_t = state
        shift = jnp.int32(1) << (D - ndep)
        l_idx = node + 1
        r_idx = node + shift

        # ONE row fetch + ONE dynamic rotate yields BOTH children's boxes
        # (parent-indexed packing: 12 floats/entry, +1 ordering code).
        row = _row_vec(nodes_ref, node >> 3)
        f = _entry_scalars(row, node & 7,
                           range(13) if sign_order else range(12))
        l_over, l_near = aabb_any(f[0:6], best_t)
        r_over, r_near = aabb_any(f[6:12], best_t)

        at_leaf_parent = ndep == D - 1

        def do_leaves(c):
            if count:
                best_idx, best_t, leafrows, dmas, scanned = c
            else:
                best_idx, best_t = c
            # Leaf from/to for both children in one fetch (parent-indexed
            # leaf table) — off the interior hot path entirely.
            lrow = _row_vec(leaf_ref, node >> 3)
            lf, lt, rf, rt = _entry_scalars(lrow, node & 7, range(4))
            base_row = None
            if stream:
                # The SAH partition splits a parent's tri range in place,
                # so [lf, lt) and [rf, rt) tile the contiguous [lf, rt):
                # ONE fixed-size DMA from the HBM tri table covers both
                # child scans (the table is padded by rows2 at pack time
                # so the dynamic start never reads past the end).
                base_row = lf >> 3
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(base_row, rows2), :],
                    tri_scratch, dma_sem)
                dma.start()
                dma.wait()
            sc0 = ((best_idx, best_t, scanned) if count
                   else (best_idx, best_t))
            # Right child first, then left (BVH.cpp:81-87).
            if leaf_mode == "noscan":
                # Decomposition probe (scripts/decompose_trav.py): pay
                # the leaf-parent overhead (cond, leaf-row fetch, DMA)
                # but skip the Möller-Trumbore row loops.
                sc = sc0
            else:
                sc = jax.lax.cond(r_over,
                                  lambda c: leaf_scan(rf, rt, c, base_row),
                                  lambda c: c, sc0)
                sc = jax.lax.cond(l_over,
                                  lambda c: leaf_scan(lf, lt, c, base_row),
                                  lambda c: c, sc)
            if not count:
                return sc

            def groups(f, t):
                return jnp.where(t > f, ((t - 1) >> 3) - (f >> 3) + 1, 0)

            leafrows = leafrows + jnp.where(l_over, groups(lf, lt), 0) \
                + jnp.where(r_over, groups(rf, rt), 0)
            return (sc[0], sc[1], leafrows, dmas + 1, sc[2])

        leaf_carry = ((best_idx, best_t, leafrows, dmas, scanned) if count
                      else (best_idx, best_t))
        if leaf_mode != "skip":  # "skip": walk-only decomposition probe
            leaf_carry = jax.lax.cond(
                at_leaf_parent & (l_over | r_over), do_leaves, lambda c: c,
                leaf_carry)
        if count:
            best_idx, best_t, leafrows, dmas, scanned = leaf_carry
        else:
            best_idx, best_t = leaf_carry

        trav_l = l_over & ~at_leaf_parent
        trav_r = r_over & ~at_leaf_parent
        push = trav_l & trav_r
        pop = ~trav_l & ~trav_r

        # Near child first when descending both: the near subtree tightens
        # best_t so the far one (often) prunes away on pop.  Result is
        # unchanged (strict-'<' nearest); only visit order/count differ.
        if sign_order:
            code = f[12]
            left_pos = code >= 3.0
            ax = code - jnp.where(left_pos, 3.0, 0.0)
            pos_dir = jnp.where(ax < 0.5, sgn[0],
                                jnp.where(ax < 1.5, sgn[1], sgn[2]))
            l_first = pos_dir != left_pos
        else:
            l_first = l_near <= r_near
        first_idx = jnp.where(l_first, l_idx, r_idx)
        second_idx = jnp.where(l_first, r_idx, l_idx)

        @pl.when(push)
        def _():
            stack_smem[sp, 0] = second_idx
            stack_smem[sp, 1] = ndep + 1

        sp_next = jnp.where(push, sp + 1, jnp.where(pop, sp - 1, sp))
        sp_pop = jnp.maximum(sp - 1, 0)
        popped_node = stack_smem[sp_pop, 0]
        popped_dep = stack_smem[sp_pop, 1]

        node = jnp.where(push, first_idx,
                         jnp.where(trav_l, l_idx,
                                   jnp.where(trav_r, r_idx, popped_node)))
        ndep = jnp.where(pop, popped_dep, ndep + 1)
        done = pop & (popped_node < 0)
        if count:
            return (done, node, ndep, sp_next, best_idx, best_t,
                    visits + 1, leafrows, dmas, scanned)
        return done, node, ndep, sp_next, best_idx, best_t

    stack_smem[0, 0] = -1  # sentinel (transverse pushes invalid first)
    stack_smem[0, 1] = 0
    # any_hit: best_t starts at the per-ray t_max (a point-light's
    # distance), so occluders beyond the light AND subtrees beyond it
    # are rejected by the same t < best_t / tmin < best_t tests.
    best_t0 = tmax0 if any_hit else jnp.full(ox.shape, jnp.inf, jnp.float32)
    init = (False, jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.full(ox.shape, -1, jnp.int32), best_t0)
    if count:
        init = init + (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                       jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    idx_out[...] = out[4]
    t_out[...] = out[5]
    if count:
        # Per-tile counters, broadcast across the row (host reads lane 0):
        # row 0 = node visits, 1 = leaf rows touched (potential work),
        # 2 = leaf-parent visits (== DMA bursts when streaming), 3 = tri
        # SLOTS actually Möller-Trumbore-tested (8 per full row scan, 4
        # per half; leaf_aabb skips shrink this vs 8x row 1).
        counts_out[...] = jnp.stack(
            [jnp.full((LANE,), out[6], jnp.int32),
             jnp.full((LANE,), out[7], jnp.int32),
             jnp.full((LANE,), out[8], jnp.int32),
             jnp.full((LANE,), out[9], jnp.int32)])


def _kernel_frontier(nodes_ref, leaf_ref, tri_ref, ox_ref, oy_ref, oz_ref,
                     dx_ref, dy_ref, dz_ref, idx_out, t_out, *, depth,
                     max_leaf, K, stack_smem, stack_rows,
                     tri_scratch=None, dma_sem=None, rows2=0,
                     counts_out=None, excl_ref=None, tmax_ref=None):
    """Frontier-K walk: each while-loop step pops up to K stack entries
    and processes them TOGETHER — K node-row fetches issue back-to-back
    (independent dynamic-sublane loads), 2K slab tests batch on the VPU,
    and the per-visit serialized scalar chain (fetch -> rotate ->
    extract -> reduce -> branch) amortizes over K visits.  This is the
    r3 roofline's stated frontier (docs/PERF.md: per-visit cost ~20x the
    dependency-chain floor): trade strict near-first DFS ordering (the
    frontier pops in LIFO blocks, so ordering is approximate and
    best_t pruning slightly weaker -> a few % more visits) for a ~K-fold
    cut in serialized steps.  Hit results are IDENTICAL up to equal-t
    ties: the strict '<' nearest rule is order-independent.

    Same tile/memory layout as _kernel; stream + any-hit modes work
    unchanged (any-hit cares nothing for ordering — pure win).  Child
    ordering uses the near heuristic WITHIN an entry (right pushed
    first, nearer child last so it pops first).
    """
    D = depth
    stream = tri_scratch is not None
    count = counts_out is not None
    any_hit = excl_ref is not None

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    if any_hit:
        excl = excl_ref[...]
        tmax0 = tmax_ref[...]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def aabb_any(box, best_t):
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
        n_groups = jnp.where(to > frm,
                             ((to - 1) >> 3) - (frm >> 3) + 1, 0)

        def group_body(g, carry):
            best_idx, best_t = carry
            row_i = (frm >> 3) + g
            if stream:
                rel = jnp.clip(row_i - base_row, 0, rows2 - 1)
                trow = _row_vec(tri_scratch, rel)
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
            else:
                row_i = jnp.minimum(row_i, tri_ref.shape[0] - 1)
                trow = _row_vec(tri_ref, row_i)
            for e in range(ENTRIES_PER_ROW):
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
                if any_hit:
                    ok = ok & (slot != excl)
                    best_idx = jnp.where(ok, slot, best_idx)
                    best_t = jnp.where(ok, -jnp.inf, best_t)
                else:
                    best_idx = jnp.where(ok, slot, best_idx)
                    best_t = jnp.where(ok, t, best_t)
            return best_idx, best_t

        return jax.lax.fori_loop(0, n_groups, group_body,
                                 (best_idx, best_t))

    def cond(state):
        return state[0] > 0

    def body(state):
        if count:
            sp, best_idx, best_t, visits, leafrows, dmas = state
        else:
            sp, best_idx, best_t = state
        k = jnp.minimum(sp, K)
        # Masked block pop: entry j is stack[sp-1-j], j < k.  All K
        # SMEM reads are independent — they issue together.
        ent = [(stack_smem[jnp.maximum(sp - 1 - j, 0), 0],
                stack_smem[jnp.maximum(sp - 1 - j, 0), 1],
                j < k) for j in range(K)]
        sp = sp - k

        # Phase 1 (batched): fetch all K rows + run all 2K slab tests.
        # The fetches/rotates/extracts are mutually independent scalar
        # chains; Mosaic can overlap them where the single-entry walk
        # serializes end-to-end.
        tests = []
        for node, ndep, active in ent:
            row = _row_vec(nodes_ref, node >> 3)
            f = _entry_scalars(row, node & 7, range(12))
            l_over, l_near = aabb_any(f[0:6], best_t)
            r_over, r_near = aabb_any(f[6:12], best_t)
            tests.append((l_over & active, r_over & active,
                          l_near, r_near))
        if count:
            for _, _, active in ent:
                visits = visits + jnp.where(active, 1, 0)

        # Phase 2 (sequential, short): leaf scans + stack pushes.
        for (node, ndep, active), (l_over, r_over, l_near, r_near) \
                in zip(ent, tests):
            at_leaf_parent = ndep == D - 1

            def do_leaves(c):
                if count:
                    best_idx, best_t, leafrows, dmas = c
                else:
                    best_idx, best_t = c
                lrow = _row_vec(leaf_ref, node >> 3)
                lf, lt, rf, rt = _entry_scalars(lrow, node & 7, range(4))
                base_row = None
                if stream:
                    base_row = lf >> 3
                    dma = pltpu.make_async_copy(
                        tri_ref.at[pl.ds(base_row, rows2), :],
                        tri_scratch, dma_sem)
                    dma.start()
                    dma.wait()
                sc = jax.lax.cond(r_over,
                                  lambda c: leaf_scan(rf, rt, *c, base_row),
                                  lambda c: c, (best_idx, best_t))
                sc = jax.lax.cond(l_over,
                                  lambda c: leaf_scan(lf, lt, *c, base_row),
                                  lambda c: c, sc)
                if not count:
                    return sc

                def groups(f, t):
                    return jnp.where(t > f, ((t - 1) >> 3) - (f >> 3) + 1, 0)

                leafrows = leafrows + jnp.where(l_over, groups(lf, lt), 0) \
                    + jnp.where(r_over, groups(rf, rt), 0)
                return sc + (leafrows, dmas + 1)

            leaf_carry = ((best_idx, best_t, leafrows, dmas) if count
                          else (best_idx, best_t))
            leaf_carry = jax.lax.cond(
                at_leaf_parent & (l_over | r_over), do_leaves,
                lambda c: c, leaf_carry)
            if count:
                best_idx, best_t, leafrows, dmas = leaf_carry
            else:
                best_idx, best_t = leaf_carry

            trav_l = l_over & ~at_leaf_parent
            trav_r = r_over & ~at_leaf_parent
            shift = jnp.int32(1) << (D - ndep)
            l_idx = node + 1
            r_idx = node + shift
            l_first = l_near <= r_near
            # Push far child first, near second (near pops first).
            first_idx = jnp.where(l_first, l_idx, r_idx)
            second_idx = jnp.where(l_first, r_idx, l_idx)
            first_ok = jnp.where(l_first, trav_l, trav_r)
            second_ok = jnp.where(l_first, trav_r, trav_l)

            # Overflow guard (ADVICE r4): the 4*K*depth+8 allocation is a
            # heuristic bound — rather than silently corrupt SMEM on a
            # pathological scene, refuse the push (degraded result, never
            # OOB).  The margin is generous; this should never fire.
            room = sp < stack_rows - 1

            @pl.when(second_ok & room)
            def _():
                stack_smem[sp, 0] = second_idx
                stack_smem[sp, 1] = ndep + 1

            sp = sp + jnp.where(second_ok & room, 1, 0)
            room = sp < stack_rows - 1

            @pl.when(first_ok & room)
            def _():
                stack_smem[sp, 0] = first_idx
                stack_smem[sp, 1] = ndep + 1

            sp = sp + jnp.where(first_ok & room, 1, 0)

        if count:
            return sp, best_idx, best_t, visits, leafrows, dmas
        return sp, best_idx, best_t

    # Root on the stack; pop-blocks of K from here on.
    stack_smem[0, 0] = 0
    stack_smem[0, 1] = 0
    best_t0 = tmax0 if any_hit else jnp.full(ox.shape, jnp.inf, jnp.float32)
    init = (jnp.int32(1), jnp.full(ox.shape, -1, jnp.int32), best_t0)
    if count:
        init = init + (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    idx_out[...] = out[1]
    t_out[...] = out[2]
    if count:
        counts_out[...] = jnp.stack(
            [jnp.full((LANE,), out[3], jnp.int32),
             jnp.full((LANE,), out[4], jnp.int32),
             jnp.full((LANE,), out[5], jnp.int32),
             jnp.zeros((LANE,), jnp.int32)])


@functools.partial(jax.jit, static_argnames=("depth", "max_leaf",
                                             "interpret", "chunk", "stream",
                                             "sub", "count_steps", "order",
                                             "leaf_mode", "frontier",
                                             "leaf_aabb"))
def traverse_pallas(nodes, leaf, tris9, ray_o, ray_d, depth: int,
                    max_leaf: int, interpret: bool = False,
                    chunk: int = 512, stream: bool = False,
                    sub: int = SUB, count_steps: bool = False,
                    order: str = "near", exclude=None, t_max=None,
                    leaf_mode: str = "full", frontier: int = 1,
                    leaf_aabb: int = 0):
    """nodes/leaf/tris9: packed tables from pack_bvh_for_pallas (8
    entries per 128-lane row).  ray_o/ray_d: [N, 3] (unit directions).
    Returns (idx [N] i32 — leaf-order tri index, -1 on miss; t [N] f32).

    ``chunk``: grid steps per kernel launch.  Large = few launches (each
    launch carries real overhead); the blocked per-step buffers are tiny
    (6x4KB double-buffered), so hundreds of steps fit VMEM comfortably.

    ``stream``: keep the tri table in HBM and DMA each leaf parent's
    contiguous tri burst into a VMEM scratch (see module docstring) —
    removes the VMEM triangle-count ceiling; nodes/leaf stay VMEM
    (2^(depth+8) bytes, so depth <= 15 ~ 8MB).

    ``sub``: tile sublanes — tile is sub*128 rays.  Wider tiles amortize
    the scalar-driven walk over more rays but visit the union of their
    nodes.  32 measured best on v5e for coherent AND sorted-incoherent
    rays (2.2x/2x over 8 — scripts/sweep_trav_kernels.py table in
    docs/PERF.md; the earlier "8 best" claim here was an artifact of the
    axon tunnel's first-timed-kernel transient, see PERF.md).

    ``count_steps``: additionally return per-tile work counters
    [NT, 3] i32 — (node visits, leaf rows scanned, leaf-parent visits
    == DMA bursts when streaming) — the inputs to the roofline analysis
    (scripts/roofline.py, docs/PERF.md "speed of light").

    ``order``: child descent order when both overlap.  "near" = min
    entry distance (one extra horizontal reduction per visit); "sign" =
    the packed split-axis code against precomputed tile direction signs
    (pure scalar select).  Hit results identical up to equal-t ties;
    visit counts and cost differ.

    ``leaf_mode``: decomposition probe (scripts/decompose_trav.py), NOT
    a rendering mode — "full" (default), "noscan" (leaf-parent overhead
    incl. DMA but no Möller-Trumbore loops), "skip" (interior walk
    only).  Both probe modes return misses everywhere and, because hits
    never tighten best_t, walk MORE than the full kernel — normalize
    per-visit with count_steps.

    ``exclude`` [N] i32 + ``t_max`` [N] f32 (both or neither): ANY-HIT
    occlusion mode for shadow rays.  A lane reports the first accepted
    hit with tri != exclude[lane] and t < t_max[lane] (t_max = the
    point-light distance, or +inf) and then goes inert, so
    fully-occluded tiles stop walking; `idx >= 0` is the occlusion
    flag and the returned t is NOT a distance (-inf on hit).

    ``frontier``: > 1 selects the frontier-K walk (_kernel_frontier):
    each serialized while-step processes K stack entries together
    (batched row fetches + 2K slab tests), amortizing the scalar chain;
    ordering becomes approximate (slightly more visits), results
    identical up to equal-t ties.  ``order``/``leaf_mode``/``leaf_aabb``
    apply only to the classic kernel (frontier ignores them).

    ``leaf_aabb``: 0 = off; 1 = slab-test each 8-tri leaf row's packed
    AABB (riding in the row's spare lanes — zero extra traffic) and
    branch over its Möller-Trumbore block when no ray can hit; 2 = the
    same at 4-tri half-row granularity.  Results identical (the box is
    conservative; the per-tri tests are unchanged) — only work skipped.
    """
    any_hit = exclude is not None
    assert any_hit == (t_max is not None), \
        "exclude and t_max come together (any-hit mode)"
    N = ray_o.shape[0]
    tile = sub * LANE
    CHUNK = min(chunk, max(-(-N // tile), 1))
    pad = (-N) % (tile * CHUNK)
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], ray_d.dtype),
                             (pad, 1))])
        if any_hit:
            exclude = jnp.concatenate(
                [exclude, jnp.full((pad,), -1, jnp.int32)])
            t_max = jnp.concatenate(
                [t_max, jnp.zeros((pad,), jnp.float32)])
    NP = N + pad
    NT = NP // tile
    n_chunks = NT // CHUNK

    comps = []
    for arr in (ray_o, ray_d):
        for c in range(3):
            comps.append(arr[:, c].reshape(n_chunks, CHUNK, sub, LANE))
    if any_hit:
        comps.append(exclude.reshape(n_chunks, CHUNK, sub, LANE))
        comps.append(t_max.reshape(n_chunks, CHUNK, sub, LANE))
    n_ray_ops = len(comps)

    nodes_shape = nodes.shape
    leaf_shape = leaf.shape
    tris_shape = tris9.shape

    # Streaming scratch: rows covering a leaf parent's worst-case
    # contiguous child span [lf, rt) (<= 2*max_leaf tris) plus row
    # slack, rounded UP to a multiple of 8: f32 arrays tile as (8, 128)
    # and a dynamic-start DMA with a non-8-aligned row extent crashed
    # the TPU worker at scale (r3 bisection: the only working
    # configuration, 201k tris, was also the only one whose window was
    # a multiple of 8 — 16 rows vs 22/29/35 for the crashing ones).
    rows2 = (2 * max_leaf + 7) // ENTRIES_PER_ROW + 1
    rows2 = -(-rows2 // 8) * 8
    # Frontier-K stack bound: each step pops <= K and pushes <= 2 per
    # pop (net growth <= K/step, ~2K pending per level in the common
    # case) — but mixed-level pop blocks make a tight bound fiddly, so
    # allocate 4K*depth: SMEM ints are free next to an overflow.
    stack_rows = (depth + 2) if frontier <= 1 else (4 * frontier * depth + 8)
    scratch_shapes = [pltpu.SMEM((stack_rows, 2), jnp.int32)]
    if stream:
        tris_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes += [pltpu.VMEM((rows2, LANE), jnp.float32),
                           pltpu.SemaphoreType.DMA(())]
    else:
        tris_spec = pl.BlockSpec(tris_shape, lambda i: (0, 0),
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
        out_specs.append(
            pl.BlockSpec((1, 4, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((CHUNK, 4, LANE), jnp.int32))

    grid_spec = pl.GridSpec(
        grid=(CHUNK,),
        in_specs=[
            # Whole tables with CONSTANT index maps: one shared VMEM
            # buffer across grid steps (unblocked specs get a fresh copy
            # per step -> scoped-VMEM OOM).
            pl.BlockSpec(nodes_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(leaf_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tris_spec,
        ] + [
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_ray_ops)
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def kernel(nodes_ref, leaf_ref, tri_ref, *rest):
        refs = rest[:n_ray_ops]
        rest = rest[n_ray_ops:]
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

        class _Sq:
            def __init__(self, v):
                self.v = v

            def __getitem__(self, k):
                return self.v

        def squeeze_out(ref):
            class _W:
                def __setitem__(self, k, v):
                    ref[0] = v
            return _W()

        if frontier > 1:
            _kernel_frontier(
                nodes_ref, leaf_ref, tri_ref, *sq[:6],
                squeeze_out(idx_out), squeeze_out(t_out),
                depth=depth, max_leaf=max_leaf, K=frontier,
                stack_smem=stack, stack_rows=stack_rows,
                tri_scratch=tri_scratch,
                dma_sem=dma_sem, rows2=rows2,
                counts_out=squeeze_out(counts) if count_steps else None,
                excl_ref=_Sq(sq[6]) if any_hit else None,
                tmax_ref=_Sq(sq[7]) if any_hit else None)
        else:
            _kernel(nodes_ref, leaf_ref, tri_ref, *sq[:6],
                    squeeze_out(idx_out), squeeze_out(t_out),
                    depth=depth, max_leaf=max_leaf, stack_smem=stack,
                    tri_scratch=tri_scratch, dma_sem=dma_sem, rows2=rows2,
                    counts_out=squeeze_out(counts) if count_steps else None,
                    order=order,
                    excl_ref=_Sq(sq[6]) if any_hit else None,
                    tmax_ref=_Sq(sq[7]) if any_hit else None,
                    leaf_mode=leaf_mode, leaf_aabb=leaf_aabb)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    def one_chunk(chunk_comps):
        return call(nodes, leaf, tris9, *chunk_comps)

    outs = jax.lax.map(one_chunk, tuple(comps))
    idx, t = outs[0], outs[1]
    if count_steps:
        counts = outs[2][:, :, :4, 0].reshape(-1, 4)  # [NT, 4]
        return idx.reshape(-1)[:N], t.reshape(-1)[:N], counts
    return idx.reshape(-1)[:N], t.reshape(-1)[:N]


def pack_bvh_for_pallas(bvh: dict, tri_verts_sorted) -> tuple:
    """Host-side packing: 8 entries of 16 lanes per 128-lane row,
    PARENT-indexed — entry p holds BOTH children of interior node p, so
    each traversal step is one row fetch + one dynamic rotate.

    nodes: f32 [ceil(NN/8), 128] — parent p at row p>>3, lanes (p&7)*16+
      (0..2 left bmin, 3..5 left bmax, 6..8 right bmin, 9..11 right bmax).
    leaf:  i32, same geometry — lanes +0/+1 left child from/to, +2/+3
      right child from/to (only meaningful at leaf-parent depth).
    tris:  f32 [ceil(T/8), 128] — tri t at row t>>3, lanes (t&7)*16+0..8
      = (v0, e1, e2) with edges precomputed, leaf order.
    64 bytes/entry, zero pad waste; dynamic indexing only on sublanes.
    """
    import numpy as np
    from .bvh import preorder_indices

    def rows(n):
        return max(-(-n // ENTRIES_PER_ROW), 1)

    nn = bvh["node_bmin"].shape[0]
    D = bvh["depth"]
    nodes = np.zeros((rows(nn), LANE), np.float32)
    leaf = np.zeros((rows(nn), LANE), np.int32)
    pre = preorder_indices(D)
    for d in range(D):
        p = pre[d]
        l = p + 1
        r = p + (1 << (D - d))
        pr = p >> 3
        pb = (p & 7) * ENTRY_LANES
        for c in range(3):
            nodes[pr, pb + c] = bvh["node_bmin"][l, c]
            nodes[pr, pb + 3 + c] = bvh["node_bmax"][l, c]
            nodes[pr, pb + 6 + c] = bvh["node_bmin"][r, c]
            nodes[pr, pb + 9 + c] = bvh["node_bmax"][r, c]
        # Lane 12 (spare): child-ordering code for order="sign" —
        # axis of largest child-center separation (the effective split
        # axis, derived from the boxes so both builders work) + 3 if
        # the LEFT child sits on the POSITIVE side of it.
        c_l = (bvh["node_bmin"][l] + bvh["node_bmax"][l]) * 0.5
        c_r = (bvh["node_bmin"][r] + bvh["node_bmax"][r]) * 0.5
        diff = c_r - c_l  # [n, 3]
        ax = np.argmax(np.abs(diff), axis=1)
        left_pos = diff[np.arange(len(ax)), ax] < 0.0
        nodes[pr, pb + 12] = (ax + 3 * left_pos).astype(np.float32)
        if d == D - 1:
            leaf[pr, pb + 0] = bvh["node_from"][l]
            leaf[pr, pb + 1] = bvh["node_to"][l]
            leaf[pr, pb + 2] = bvh["node_from"][r]
            leaf[pr, pb + 3] = bvh["node_to"][r]

    tv = np.asarray(tri_verts_sorted, np.float32).reshape(-1, 9)
    tv = tv.copy()
    tv[:, 3:6] -= tv[:, 0:3]  # e1 = v1 - v0
    tv[:, 6:9] -= tv[:, 0:3]  # e2 = v2 - v0
    T = tv.shape[0]
    # Trailing pad rows: the streaming kernels DMA a fixed window
    # starting anywhere in the table (worst case: an empty leaf whose
    # from==to==T), so the window must never run off the end.  The 8-wide
    # kernel's window covers an 8-leaf span (experiments/bvh_wide.py), the widest
    # consumer of this table; +8 covers the windows' 8-row alignment.
    pad_rows = (8 * bvh["max_leaf"] + 7) // ENTRIES_PER_ROW + 2 + 8
    tris = np.zeros((rows(T) + pad_rows, LANE), np.float32)
    ti = np.arange(T)
    tr = ti >> 3
    tb = (ti & 7) * ENTRY_LANES
    for c in range(9):
        tris[tr, tb + c] = tv[:, c]

    # Row / half-row AABBs in the SPARE lanes (each entry uses 9 of its
    # 16): the leaf scan can then slab-test a whole row (or half) against
    # the tile BEFORE issuing its Möller-Trumbore loop — ~33 vector ops
    # to potentially skip ~528 — at zero extra memory traffic, because
    # the boxes ride in the row the scan already loads.  Layout per row:
    #   lanes  9..14  (entry 0 spares): AABB of all 8 tris (bmin, bmax)
    #   lanes 25..30  (entry 1 spares): AABB of tris 0..3 (half 0)
    #   lanes 73..78  (entry 4 spares): AABB of tris 4..7 (half 1)
    # A group with no valid tris gets a NaN box: every slab comparison
    # is then false, so the test reports "no overlap" and the scan skips
    # it (consumed by _kernel when leaf_aabb > 0).
    if T:
        v0 = tv[:, 0:3]
        v1 = v0 + tv[:, 3:6]
        v2 = v0 + tv[:, 6:9]
        tmin = np.minimum(np.minimum(v0, v1), v2)
        tmax = np.maximum(np.maximum(v0, v1), v2)
        R = rows(T)
        padn = R * 8 - T
        tmin8 = np.concatenate(
            [tmin, np.full((padn, 3), np.inf, np.float32)]).reshape(R, 8, 3)
        tmax8 = np.concatenate(
            [tmax, np.full((padn, 3), -np.inf, np.float32)]).reshape(R, 8, 3)
        valid8 = (np.arange(R * 8) < T).reshape(R, 8)

        def grp(lo, hi):
            gmin = tmin8[:, lo:hi].min(axis=1)
            gmax = tmax8[:, lo:hi].max(axis=1)
            empty = ~valid8[:, lo:hi].any(axis=1)
            gmin[empty] = np.nan
            gmax[empty] = np.nan
            return gmin, gmax

        rr = np.arange(R)
        for (lo, hi), lane0 in (((0, 8), 9), ((0, 4), 25), ((4, 8), 73)):
            gmin, gmax = grp(lo, hi)
            for c in range(3):
                tris[rr, lane0 + c] = gmin[:, c]
                tris[rr, lane0 + 3 + c] = gmax[:, c]
    return jnp.asarray(nodes), jnp.asarray(leaf), jnp.asarray(tris)
