"""Ray reordering for packet coherence.

Packet traversal amortizes one BVH walk over a tile of rays; its cost is
the union of the tile's nodes, so tiles must be SPATIALLY COMPACT.  Camera
rays in pixel order already are; secondary and shadow rays scatter, and an
unsorted tile can span the whole scene — the walk then degenerates toward
brute force (measured: 10x+ slowdown).  Sorting rays by a Morton code of
the origin plus the direction octant re-clusters them; XLA's device sort
is a few ms for 1M keys, far cheaper than the divergence it removes.

This is the TPU analog of the wavefront-path-tracer ray-compaction stage
(the reference's megakernel has no equivalent; SURVEY.md §7 'sorted /
compacted wavefronts').
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits10(v):
    """Spread 10 bits to every 3rd position (standard Morton dilation)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def morton_key(origin, direction, bounds_min, bounds_max,
               dir_major: bool = False, dir_bits: int = 3):
    """30-bit Morton code of the origin (scene-normalized) combined with
    a direction class -> uint32 sort key.

    ``dir_major=False`` (default): position-major — ``Morton << 3 |
    octant``; tiles are spatially compact with mixed directions.
    ``dir_major=True``: direction-major — direction class in the top
    bits; rays split into pure-direction classes first, so every tile
    shares a direction cone (tighter slab unions; the walk's sign
    ordering is then exact per tile) at the cost of splitting spatial
    clusters that straddle classes.  A/B knob (RenderConfig
    .sort_dir_major).

    ``dir_bits`` (direction-major only): 3 = the 8 sign octants; >3 =
    an equirectangular direction grid with dir_bits total bits (half on
    each spherical coordinate), trading position bits for finer
    direction cones — secondary/shadow directions spread over the whole
    sphere, so finer cones can cut each tile's node union further
    (RenderConfig.sort_dir_bits).
    """
    ext = jnp.maximum(bounds_max - bounds_min, 1e-12)
    q = jnp.clip((origin - bounds_min) / ext, 0.0, 1.0)
    qi = (q * 1023.0).astype(jnp.uint32)
    code = (_expand_bits10(qi[..., 0])
            | (_expand_bits10(qi[..., 1]) << jnp.uint32(1))
            | (_expand_bits10(qi[..., 2]) << jnp.uint32(2)))
    if dir_major and dir_bits > 3:
        from .texture import spherical_mapping
        bu = (dir_bits + 1) // 2
        bv = dir_bits - bu
        u, v = spherical_mapping(direction)
        ui = jnp.clip((u * (1 << bu)).astype(jnp.uint32), 0,
                      jnp.uint32((1 << bu) - 1))
        vi = jnp.clip((v * (1 << bv)).astype(jnp.uint32), 0,
                      jnp.uint32((1 << bv) - 1))
        dclass = (ui << jnp.uint32(bv)) | vi
        return ((dclass << jnp.uint32(32 - dir_bits))
                | (code >> jnp.uint32(dir_bits - 2)))
    octant = ((direction[..., 0] > 0).astype(jnp.uint32)
              | ((direction[..., 1] > 0).astype(jnp.uint32) << jnp.uint32(1))
              | ((direction[..., 2] > 0).astype(jnp.uint32) << jnp.uint32(2)))
    if dir_major:
        return (octant << jnp.uint32(30)) | code
    return (code << jnp.uint32(3)) | octant


def counting_order(key, bits: int = 8, chunk: int = 2048):
    """Stable counting sort of uint32 keys by their TOP ``bits`` bits:
    O(n) histogram + prefix ranks + one scatter.

    MEASURED NEGATIVE on v5e (r4, docs/PERF.md "the sort lever"):
    jnp.argsort of 1M keys is only 6.3 ms — the per-bounce sort cost is
    permutation PLUMBING (gathers/scatters) that any ordering pays —
    and this path's rank pass alone is 37.8 ms, 1.30x worse end-to-end.
    Kept as the documented negative behind RenderConfig.sort_impl
    ("argsort" stays the default); tests pin its correctness.

    Memory note (ADVICE r4): the one-hot + cumsum materializes a
    [C, chunk, 257] int32 transient — ~1.05 GB per 1M keys, scaling
    linearly with key count and with ``chunk`` — so enabling
    sort_impl="counting" at multi-megapixel resolutions adds that much
    HBM pressure per bounce on top of the measured 1.30x slowdown.

    Packet tracing only needs TILE-granular grouping (order within a
    4096-ray tile is irrelevant), so 2^bits buckets with STABLE
    within-bucket order suffice — and stability means within-bucket
    order inherits the previous bounce's (already sorted) order, so the
    effective ordering refines across bounces like an iterated radix
    pass.

    Returns (order, inverse): key[order] is bucket-sorted;
    inverse[order[i]] = i (the scatter positions ARE the inverse, so
    unlike the argsort path no second scatter is needed).

    Mechanics: split into chunks of ``chunk`` elements; per-chunk
    one-hot prefix counts (int32 cumsum — bf16 would overflow exact
    counts past 256) give within-chunk ranks AND per-chunk histograms
    in one pass; global position = bucket base (+ chunk base within
    bucket) + within-chunk rank.
    """
    n = key.shape[0]
    pad = (-n) % chunk
    kb = (key >> jnp.uint32(32 - bits)).astype(jnp.int32)
    if pad:
        # Padding keys land in a virtual overflow bucket past every real
        # one so they sort to the very end and are then sliced off.
        kb = jnp.concatenate([kb, jnp.full((pad,), (1 << bits),
                                           jnp.int32)])
    B = (1 << bits) + 1
    C = (n + pad) // chunk
    kc = kb.reshape(C, chunk)
    oh = (kc[:, :, None] == jnp.arange(B, dtype=jnp.int32)).astype(
        jnp.int32)                                        # [C, M, B]
    pref = jnp.cumsum(oh, axis=1)                         # ranks+1
    rank = jnp.take_along_axis(pref, kc[:, :, None], axis=2)[..., 0] - 1
    chunk_hist = pref[:, -1, :]                           # [C, B]
    bucket_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(jnp.sum(chunk_hist, axis=0))[:-1]])   # [B]
    chunk_base = bucket_base[None, :] + jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32),
         jnp.cumsum(chunk_hist, axis=0)[:-1]], axis=0)    # [C, B]
    pos = (jnp.take_along_axis(chunk_base, kc, axis=1) + rank).reshape(-1)
    pos = pos[:n]
    order = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True,
        mode="promise_in_bounds")
    return order, pos


def sort_for_packets(origin, direction, bounds_min, bounds_max, mask=None,
                     dir_major: bool = False, impl: str = "argsort",
                     dir_bits: int = 3):
    """Returns (order, inverse) permutations: ``origin[order]`` is
    packet-coherent; scatter results back with ``result[inverse]``.

    ``mask``: lanes that actually need tracing.  Dead lanes get the max
    key so they pack into the TAIL tiles — combined with the instant-miss
    ray substitution in the integrator's _trace, those tiles terminate at
    the root, so dead rays cost ~nothing instead of a full walk.

    ``impl``: "argsort" (full comparison sort) or "counting" (top-8-bit
    stable counting sort, counting_order — tile-granular grouping at
    O(n); RenderConfig.sort_impl)."""
    key = morton_key(origin, direction, bounds_min, bounds_max,
                     dir_major=dir_major, dir_bits=dir_bits)
    if mask is not None:
        key = jnp.where(mask, key, jnp.uint32(0xFFFFFFFF))
    if impl == "counting":
        return counting_order(key)
    order = jnp.argsort(key)
    # inverse[order[i]] = i — a scatter, NOT a second argsort (which would
    # pay a full 1M-key device sort again; there are 2 traces x bounces of
    # these per sample).
    n = order.shape[0]
    inverse = jnp.zeros_like(order).at[order].set(
        jnp.arange(n, dtype=order.dtype))
    return order, inverse
