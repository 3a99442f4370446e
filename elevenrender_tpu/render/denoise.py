"""JAX denoiser — the OIDN replacement.

The reference wraps Intel OIDN's "RT" filter over the beauty pass
(/root/reference/src/Managers.cpp:319-343, color-only, HDR, float4
stride).  Per the project north star, the TPU build replaces it with a
jitted JAX denoiser: an edge-preserving cross-bilateral filter guided by
the normal AOV.  Same call shape (HDR float image in, denoised image out);
runs on-chip, no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _despeckle(color, k: float = 2.5):
    """Firefly suppression: clamp each pixel to k x its 8-neighborhood
    mean (per channel).  A bilateral filter PRESERVES fireflies (an
    outlier matches none of its neighbors, so nothing smooths it); Monte
    Carlo denoisers therefore clamp outliers first.  Pure shifts + min —
    VPU work, no gathers."""
    acc = jnp.zeros_like(color)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + jnp.roll(color, (dy, dx), axis=(0, 1))
    neigh = acc / 8.0
    return jnp.minimum(color, neigh * k + 1e-4)


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_denoise(color, normal=None, albedo=None, radius: int = 3,
                      sigma_s: float = 2.0, sigma_c: float = 0.35,
                      sigma_n: float = 0.3, sigma_a: float = 0.15):
    """color: [H, W, 3] HDR; normal/albedo: optional [H, W, 3] guides
    (the guides OIDN accepts but the reference never feeds it,
    Managers.cpp:319-343 — color-only there).

    Returns [H, W, 3].  Static unrolled (2r+1)^2 taps — each tap is a
    shifted image, so the whole filter is elementwise VPU work.
    """
    h, w, _ = color.shape
    color = _despeckle(color)
    acc = jnp.zeros_like(color)
    wacc = jnp.zeros((h, w, 1), color.dtype)

    log_lum = jnp.log1p(jnp.max(color, axis=-1, keepdims=True))

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(color, (dy, dx), axis=(0, 1))
            ws = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma_s * sigma_s))
            s_lum = jnp.roll(log_lum, (dy, dx), axis=(0, 1))
            wc = jnp.exp(-jnp.square(s_lum - log_lum) / (2.0 * sigma_c * sigma_c))
            wgt = ws * wc
            if normal is not None:
                s_n = jnp.roll(normal, (dy, dx), axis=(0, 1))
                nd = jnp.sum((s_n - normal) ** 2, axis=-1, keepdims=True)
                wgt = wgt * jnp.exp(-nd / (2.0 * sigma_n * sigma_n))
            if albedo is not None:
                s_a = jnp.roll(albedo, (dy, dx), axis=(0, 1))
                ad = jnp.sum((s_a - albedo) ** 2, axis=-1, keepdims=True)
                wgt = wgt * jnp.exp(-ad / (2.0 * sigma_a * sigma_a))
            acc = acc + shifted * wgt
            wacc = wacc + wgt
    return acc / jnp.maximum(wacc, 1e-8)


def denoise(width: int, height: int, raw, normal=None, albedo=None):
    """DenoiseManager::denoise-shaped entry: flat float4 [H*W*4] in/out."""
    img = jnp.asarray(raw).reshape(height, width, 4)

    def guide(x):
        return (None if x is None
                else jnp.asarray(x).reshape(height, width, 4)[:, :, :3])

    out = bilateral_denoise(img[:, :, :3], guide(normal), guide(albedo))
    res = jnp.concatenate([out, jnp.ones((height, width, 1), out.dtype)],
                          axis=-1)
    return res.reshape(-1)
