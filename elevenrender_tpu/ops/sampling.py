"""Direction samplers (batched, differentiable where meaningful).

TPU-native equivalents of /root/reference/src/Sampling.h:9-53.  Each takes
[...]-shaped uniforms and returns [..., 3] directions; everything is pure
jnp so XLA fuses them into the surrounding shading kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import PIF, vec3


def uniform_sample_sphere(u1, u2):
    """Sampling.h:9-18."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PIF * u2
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_circle_sampling(u1, u2, u3):
    """Sampling.h:20-28 (triangle-profile radius; matches reference quirk)."""
    t = 2.0 * PIF * u1
    u = u2 + u3
    r = jnp.where(u > 1.0, 2.0 - u, u)
    return r * jnp.cos(t), r * jnp.sin(t)


def cosine_sample_hemisphere(u1, u2):
    """Sampling.h:30-40: z from x,y (not sqrt(1-u1)) exactly as reference."""
    r = jnp.sqrt(u1)
    phi = 2.0 * PIF * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return vec3(x, y, z)


def importance_sample_ggx(rgh, r1, r2):
    """Sampling.h:42-53: GGX half-vector in tangent space."""
    a = jnp.maximum(0.001, rgh)
    phi = r1 * PIF * 2.0
    cos_theta = jnp.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_theta = jnp.clip(jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta)), 0.0, 1.0)
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
