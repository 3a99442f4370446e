"""JAX denoiser — the OIDN replacement.

The reference wraps Intel OIDN's "RT" filter over the beauty pass
(/root/reference/src/Managers.cpp:319-343, color-only, HDR, float4
stride).  Per the project north star, the TPU build replaces it with a
jitted JAX denoiser; runs on-chip, no host round-trip.

Pipeline (nlm_denoise, the default when guides are available):
1. Firefly despeckle (neighborhood clamp — a patch filter preserves
   outliers, so clamp first).
2. **Noise-compensated non-local-means weights**: per-tap patch SSD
   (3x3 box of the pointwise squared log-luminance difference) with the
   measured noise floor subtracted and the bandwidth scaled by it
   (Buades-style, the low-spp-robust form) — times normal AND albedo
   edge-stop guides.

Albedo DEMODULATION (OIDN's first move) was tried and measured WORSE on
both test scenes (A/B in the r3 work log): our albedo AOV is a
progressive per-pixel average, so pixels whose samples mix surfaces
(lamp edge: albedo 0 emission hits + 0.73 wall hits) get a modulator
that matches neither surface and the division manufactures energy
errors the filter then spreads.  The albedo edge-stop GUIDE delivers
the detail preservation without the division.

Everything is shifts + elementwise math (jnp.roll unrolled over static
taps): pure VPU work under jit, no gathers.
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


def _box3(x):
    """3x3 box filter via separable rolls (no gathers)."""
    s = x + jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
    return (s + jnp.roll(s, 1, 1) + jnp.roll(s, -1, 1)) / 9.0


@functools.partial(jax.jit, static_argnames=("radius",))
def nlm_denoise(color, normal=None, albedo=None, radius: int = 4,
                sigma_s: float = 3.0, sigma_p: float = 0.22,
                sigma_n: float = 0.25, sigma_a: float = 0.15):
    """Guided, noise-compensated non-local-means (module docstring).

    color: [H, W, 3] HDR beauty; normal/albedo: optional [H, W, 3]
    first-hit AOV guides.  Returns [H, W, 3].
    """
    irr = _despeckle(color)

    # Patch distance works on compressed luminance: HDR outliers would
    # otherwise dominate every patch they touch.
    log_lum = jnp.log1p(jnp.max(irr, axis=-1, keepdims=True))

    # Noise-compensated NL-means (Buades'05 as used by MC denoisers):
    # for iid noise, E[(I(x)-I(x+d))^2] ~ 2*sigma_noise^2 + signal term;
    # the median of unit-offset squared differences is a robust 2s^2
    # estimate.  Subtract it from every patch SSD (else at low spp the
    # noise floor swamps the distance and weights collapse to self) and
    # scale the filter bandwidth h^2 with the same estimate so smoothing
    # strength tracks spp automatically.
    d2u = jnp.square(jnp.roll(log_lum, 1, 0) - log_lum)
    d2l = jnp.square(jnp.roll(log_lum, 1, 1) - log_lum)
    # Median over pixels that carry signal (a mostly-dark frame's global
    # median is 0, which would disable the compensation).
    lit = log_lum > 0.02
    d2s = jnp.stack([d2u, d2l])
    var2 = jnp.nanmedian(jnp.where(jnp.stack([lit, lit]), d2s, jnp.nan))
    var2 = jnp.where(jnp.isnan(var2), 0.0, var2)  # fully-dark frame
    h2 = jnp.maximum(2.0 * sigma_p * sigma_p, 1.5 * var2)

    acc = jnp.zeros_like(irr)
    wacc = jnp.zeros(irr.shape[:2] + (1,), irr.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(irr, (dy, dx), axis=(0, 1))
            ws = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma_s * sigma_s))
            # NL-means tap weight: mean SSD over the 3x3 patch pair,
            # noise floor removed.
            d2 = jnp.square(jnp.roll(log_lum, (dy, dx), (0, 1)) - log_lum)
            pd = jnp.maximum(_box3(d2) - var2, 0.0)
            wgt = ws * jnp.exp(-pd / h2)
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


def _down2(x):
    """2x2 average pool (even-cropped: callers pad odd extents)."""
    h2, w2 = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    x = x[:h2, :w2]
    return (x[0::2, 0::2] + x[1::2, 0::2]
            + x[0::2, 1::2] + x[1::2, 1::2]) * 0.25


def _box3_edge(x):
    """3x3 box with EDGE padding (no wraparound).  The NLM taps above
    use rolls deliberately (each tap is distance-weighted, so the 1-px
    wrapped band is negligible); here the band is added UNWEIGHTED, and
    a rolled box would bleed coarse content between opposite borders
    (ADVICE r4)."""
    p = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    s = p[:-2] + p[1:-1] + p[2:]
    return (s[:, :-2] + s[:, 1:-1] + s[:, 2:]) / 9.0


def _up2(x, h, w):
    """2x nearest upsample + 3x3 edge-padded box (cheap bilinear-ish —
    the band being upsampled is a low-frequency correction, so block
    edges must not survive), cropped/edge-padded to (h, w)."""
    r = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    if r.shape[0] < h:
        r = jnp.concatenate([r, r[-1:]], axis=0)
    if r.shape[1] < w:
        r = jnp.concatenate([r, r[:, -1:]], axis=1)
    return _box3_edge(r[:h, :w])


@functools.partial(jax.jit, static_argnames=("levels", "radius"))
def nlm_denoise_ms(color, normal=None, albedo=None, levels: int = 3,
                   radius: int = 4):
    """Multi-scale guided NL-means (r4 quality ratchet, VERDICT r3 #7).

    Single-scale NL-means only reaches noise whose correlation length
    fits inside its (2r+1)^2 window; low-spp Monte Carlo renders also
    carry LOW-frequency blotches (indirect-bounce variance) that survive
    it.  Standard MC-denoiser fix: a coarse-to-fine pyramid — denoise
    each 2x-downsampled level (downsampling itself averages 4 samples,
    halving sigma), then replace each finer level's low band with the
    upsampled coarser result:

        R_L = D_L;   R_l = D_l + up(R_{l+1} - down(D_l))

    so the finest level keeps its own high-frequency detail (edges,
    texture — protected by the guides) while inheriting the smoothed
    low bands.  A/B vs single-scale and vs albedo demodulation:
    .runlogs/denoise_ab_r04.log (scripts/denoise_ab.py).
    """
    h, w = color.shape[0], color.shape[1]
    dn = nlm_denoise(color, normal, albedo, radius=radius)
    if levels <= 1 or min(h, w) < 32:
        return dn
    c1 = _down2(color)
    n1 = None if normal is None else _down2(normal)
    a1 = None if albedo is None else _down2(albedo)
    r1 = nlm_denoise_ms(c1, n1, a1, levels=levels - 1, radius=radius)
    return dn + _up2(r1 - _down2(dn), h, w)


def denoise(width: int, height: int, raw, normal=None, albedo=None):
    """DenoiseManager::denoise-shaped entry: flat float4 [H*W*4] in/out.

    With guides: multi-scale albedo-guided NL-means (nlm_denoise_ms —
    demodulation was tried and measured worse, see module docstring and
    .runlogs/denoise_ab_r04.log); without: the color-only cross-bilateral
    (the reference's OIDN call is also color-only, Managers.cpp:319-343).
    """
    img = jnp.asarray(raw).reshape(height, width, 4)

    def guide(x):
        return (None if x is None
                else jnp.asarray(x).reshape(height, width, 4)[:, :, :3])

    if normal is not None or albedo is not None:
        out = nlm_denoise_ms(img[:, :, :3], guide(normal), guide(albedo))
    else:
        out = bilateral_denoise(img[:, :, :3])
    res = jnp.concatenate([out, jnp.ones((height, width, 1), out.dtype)],
                          axis=-1)
    return res.reshape(-1)
