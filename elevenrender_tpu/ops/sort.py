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
               dir_major: bool = False):
    """30-bit Morton code of the origin (scene-normalized) combined with
    the 3-bit direction octant -> uint32 sort key.

    ``dir_major=False`` (default): position-major — ``Morton << 3 |
    octant``; tiles are spatially compact with mixed directions.
    ``dir_major=True``: octant-major — ``octant << 30 | Morton``; rays
    split into 8 pure-direction classes first, so every tile is
    single-octant (tighter slab unions; the walk's sign ordering is then
    exact per tile) at the cost of splitting spatial clusters that
    straddle octants.  A/B knob (RenderConfig.sort_dir_major).
    """
    ext = jnp.maximum(bounds_max - bounds_min, 1e-12)
    q = jnp.clip((origin - bounds_min) / ext, 0.0, 1.0)
    qi = (q * 1023.0).astype(jnp.uint32)
    code = (_expand_bits10(qi[..., 0])
            | (_expand_bits10(qi[..., 1]) << jnp.uint32(1))
            | (_expand_bits10(qi[..., 2]) << jnp.uint32(2)))
    octant = ((direction[..., 0] > 0).astype(jnp.uint32)
              | ((direction[..., 1] > 0).astype(jnp.uint32) << jnp.uint32(1))
              | ((direction[..., 2] > 0).astype(jnp.uint32) << jnp.uint32(2)))
    if dir_major:
        return (octant << jnp.uint32(30)) | code
    return (code << jnp.uint32(3)) | octant


def sort_for_packets(origin, direction, bounds_min, bounds_max, mask=None,
                     dir_major: bool = False):
    """Returns (order, inverse) permutations: ``origin[order]`` is
    packet-coherent; scatter results back with ``result[inverse]``.

    ``mask``: lanes that actually need tracing.  Dead lanes get the max
    key so they pack into the TAIL tiles — combined with the instant-miss
    ray substitution in the integrator's _trace, those tiles terminate at
    the root, so dead rays cost ~nothing instead of a full walk."""
    key = morton_key(origin, direction, bounds_min, bounds_max,
                     dir_major=dir_major)
    if mask is not None:
        key = jnp.where(mask, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    # inverse[order[i]] = i — a scatter, NOT a second argsort (which would
    # pay a full 1M-key device sort again; there are 2 traces x bounces of
    # these per sample).
    n = order.shape[0]
    inverse = jnp.zeros_like(order).at[order].set(
        jnp.arange(n, dtype=order.dtype))
    return order, inverse
