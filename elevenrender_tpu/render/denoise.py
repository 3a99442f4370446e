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


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_denoise(color, normal=None, radius: int = 3,
                      sigma_s: float = 2.0, sigma_c: float = 0.2,
                      sigma_n: float = 0.3):
    """color: [H, W, 3] HDR; normal: optional [H, W, 3] guide.

    Returns [H, W, 3].  Static unrolled (2r+1)^2 taps — each tap is a
    shifted image, so the whole filter is elementwise VPU work.
    """
    h, w, _ = color.shape
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
            acc = acc + shifted * wgt
            wacc = wacc + wgt
    return acc / jnp.maximum(wacc, 1e-8)


def denoise(width: int, height: int, raw, normal=None):
    """DenoiseManager::denoise-shaped entry: flat float4 [H*W*4] in/out."""
    img = jnp.asarray(raw).reshape(height, width, 4)
    guide = None
    if normal is not None:
        guide = jnp.asarray(normal).reshape(height, width, 4)[:, :, :3]
    out = bilateral_denoise(img[:, :, :3], guide)
    res = jnp.concatenate([out, jnp.ones((height, width, 1), out.dtype)],
                          axis=-1)
    return res.reshape(-1)
