"""HDRI environment sampling on device.

TPU-native equivalent of /root/reference/src/HDRI.cpp:85-133 plus the env
fetch in the megakernel (kernel.cpp:517-522, 543-567):

- CDF inversion with the reference's exact (quirky) binary search — it can
  land one texel off for non-exact values (HDRI.cpp:85-98); we vectorize
  the same loop so the sampled texel stream matches.
- solid-angle pdf with sin(theta) (HDRI.cpp:101-107).
- env radiance fetch by direction via spherical mapping.

The HDRI image is kept as its own [H, W, 3] array (not in the texture
atlas): it is the single most-fetched table and benefits from direct 2-D
indexing, and it is a differentiable leaf for inverse rendering.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .texture import spherical_mapping


def pack_hdri(hdri) -> dict:
    """Host HDRI -> device dict {img [H,W,3], cdf [H*W+1], rsum, filter}."""
    img = hdri.texture.data
    if img.shape[2] < 3:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    return {
        "img": jnp.asarray(img[:, :, :3].astype(np.float32)),
        "cdf": jnp.asarray(hdri.cdf.astype(np.float32)),
        # Guarded so an all-black env yields pdf 0 (-> NEE term zeroed in
        # native mode) instead of 0/0 NaN killing every sample.
        "rsum": jnp.asarray(np.float32(max(hdri.radiance_sum, 1e-30))),
    }


def binary_search_host(arr: np.ndarray, value: float, length: int) -> int:
    """Scalar oracle of HDRI::binarySearch (HDRI.cpp:85-98)."""
    frm, to = 0, length - 1
    while to - frm > 0:
        m = frm + (to - frm) // 2
        if value == arr[m]:
            return m
        if value < arr[m]:
            to = m - 1
        if value > arr[m]:
            frm = m + 1
    return to


def binary_search(cdf, value, length: int):
    """Vectorized parity implementation of the reference binary search.

    value: [...] floats.  Returns [...] int32 flat pixel index.
    The loop is bounded by ceil(log2(length)) + 2 iterations.
    """
    iters = int(np.ceil(np.log2(max(length, 2)))) + 2
    frm = jnp.zeros_like(value, jnp.int32)
    to = jnp.full_like(frm, length - 1)

    def body(_, carry):
        frm, to = carry
        active = (to - frm) > 0
        m = frm + (to - frm) // 2
        vm = cdf[jnp.clip(m, 0, length - 1)]
        eq = value == vm
        lt = value < vm
        gt = value > vm
        new_to = jnp.where(lt, m - 1, to)
        new_frm = jnp.where(gt, m + 1, frm)
        # 'eq' returns m: encode by collapsing the interval onto m.
        new_frm = jnp.where(eq, m, new_frm)
        new_to = jnp.where(eq, m, new_to)
        frm = jnp.where(active, new_frm, frm)
        to = jnp.where(active, new_to, to)
        return frm, to

    frm, to = jax.lax.fori_loop(0, iters, body, (frm, to))
    return to


def sample_env(env, r1):
    """HDRI::sample (HDRI.cpp:109-117): CDF inversion -> (x, y) texel.

    Keeps the reference's one-off quirk: its binary search returns ``to``,
    which for most values lands one texel past the CDF step
    (HDRI.cpp:85-98).  The estimator stays consistent because pdf() and the
    radiance fetch use the same shifted texel; it is simply importance
    sampling under a one-texel-shifted map.
    """
    H, W, _ = env["img"].shape
    count = binary_search(env["cdf"], r1, H * W)
    x = count % W
    y = count // W
    return x, y


def sample_env_exact(env, r1):
    """Native-mode inversion: pixel i is chosen iff cdf[i] <= r < cdf[i+1]
    (exact proportional sampling, no one-off)."""
    H, W, _ = env["img"].shape
    count = jnp.clip(
        jnp.searchsorted(env["cdf"], r1, side="right").astype(jnp.int32) - 1,
        0, H * W - 1)
    return count % W, count // W


def env_pdf(env, x, y, center: bool = False):
    """HDRI::pdf (HDRI.cpp:101-107).

    ``center=False`` replicates the reference exactly: texel-corner theta
    (singular at y=0) and a 2*pi*sin(theta) denominator — which is pi/2
    OFF the true equirect solid-angle normalization (the CDF picks pixels
    with P = lum/rsum and a pixel covers dw = (2 pi^2 / WH) sin(theta), so
    the true pdf divides by 2 pi^2 sin(theta)).  Native mode (center=True)
    uses the texel-center theta and the correct normalization, which makes
    the MIS weights consistent and the furnace test converge.
    """
    H, W, _ = env["img"].shape
    val = env["img"][jnp.clip(y, 0, H - 1), jnp.clip(x, 0, W - 1)]
    yf = y.astype(jnp.float32) + (0.5 if center else 0.0)
    theta = (yf / jnp.float32(H)) * jnp.pi
    lum = val[..., 0] + val[..., 1] + val[..., 2]
    denom = (2.0 * jnp.pi * jnp.pi) if center else (2.0 * jnp.pi)
    return (lum / env["rsum"]) * W * H / (denom * jnp.sin(theta))


def env_pdf_uv(env, u, v):
    """Exact solid-angle pdf of the NATIVE env sampler at continuous
    equirect (u, v): texel picked with P = lum/rsum, then uniform jitter
    within the texel (see integrator render_sample), so the density in
    (u, v) is P * W * H and the equirect measure is
    dw = 2 pi^2 sin(theta) du dv.  Evaluating sin at the JITTERED v (not
    the texel center) makes pdf() the true density of the sampler — the
    requirement for unbiased NEE and consistent MIS weights.  Without the
    jitter a coarse HDRI (worst case: the default 1x1 constant grey,
    HDRI.cpp:18) collapses NEE onto single fixed directions while
    claiming a continuous pdf — a real bias the furnace test catches.
    """
    H, W, _ = env["img"].shape
    x = jnp.clip(jnp.trunc(u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.trunc(v * H).astype(jnp.int32), 0, H - 1)
    val = env["img"][y, x]
    lum = val[..., 0] + val[..., 1] + val[..., 2]
    sin_t = jnp.maximum(jnp.sin(v * jnp.pi), 1e-8)
    return (lum / env["rsum"]) * W * H / (2.0 * jnp.pi * jnp.pi * sin_t)


def balance_heuristic(a, b):
    """a/(a+b), robust to a or b being 0 or inf (but not both inf)."""
    ratio = b / jnp.maximum(a, 1e-12)
    return jnp.where(a > 0.0, 1.0 / (1.0 + ratio), 0.0)


def env_fetch_uv(env, u, v):
    """getValueFromUV on the HDRI image (nearest, truncating)."""
    H, W, _ = env["img"].shape
    x = jnp.trunc(u * W).astype(jnp.int32)
    y = jnp.trunc(v * H).astype(jnp.int32)
    # C-style wrap + abs like fetch_texel.
    x = jnp.abs(x) % W
    y = jnp.abs(y) % H
    return env["img"][y, x]


def env_radiance(env, direction):
    """Environment lookup on ray miss (kernel.cpp:517-522): spherical-map
    the negated direction, nearest fetch (HDRI textures are NO_FILTER)."""
    u, v = spherical_mapping(-direction)
    return env_fetch_uv(env, u, v)
