"""Vector math on stacked jnp arrays.

TPU-native replacement for the reference's scalar ``Vector3`` class
(/root/reference/src/Vector.h:10-264) and the float helpers in
/root/reference/src/Math.hpp:12-67.  Everything operates on arrays whose
trailing axis has size 3 and broadcasts over any leading (pixel/ray) axes,
so one call covers the whole wavefront instead of one lane.
"""

from __future__ import annotations

import jax.numpy as jnp

PIF = 3.14159265358979323846
TWO_PIF = 2.0 * PIF

EPS_DENOM = 1e-12  # squared must stay a normal float32 (FTZ: eps^2 > 1.2e-38) or div VJPs emit NaN


def vec3(x, y, z):
    """Stack three broadcastable components into a [..., 3] vector."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def dot(a, b):
    """Batched dot product -> [...] (keeps no trailing axis)."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a):
    """Reference Vector3::normalize() divides by the norm with no epsilon
    (Vector.h); we guard the denominator so masked-off lanes never emit NaN
    that would poison a whole vector register."""
    n = length(a)
    return a / jnp.maximum(n, EPS_DENOM)[..., None]


def lerp(a, b, t):
    """Math.hpp:38-45 FAST_LERP: a + t*(b-a)."""
    return a + t * (b - a)


def clampf(a, lo, hi):
    return jnp.clip(a, lo, hi)


def mapf(a, b, c, d, e):
    """Math.hpp:22-24 linear remap of a from [b,c] to [d,e]."""
    return d + ((a - b) / (c - b)) * (e - d)


def limit_uv(u, v):
    """Math.hpp:48-51: wrap u,v into [0,1] by +/-1 (single step)."""
    u = u - (u > 1.0).astype(u.dtype) + (u < 0.0).astype(u.dtype)
    v = v - (v > 1.0).astype(v.dtype) + (v < 0.0).astype(v.dtype)
    return u, v


def reflect(i, n):
    """GLSL-style reflect used by Disney sampling (Vector.h reflect)."""
    return i - 2.0 * dot(i, n)[..., None] * n


def where3(mask, a, b):
    """Select on a [...] mask between [..., 3] vectors."""
    return jnp.where(mask[..., None], a, b)
