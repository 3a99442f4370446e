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


def build_alias_table(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Walker/Vose alias table for a discrete distribution p (sums to 1).

    Returns (prob [N] f32, alias [N] i32): draw u ~ U[0,1), let
    j = floor(u*N), f = frac(u*N); the sample is j if f < prob[j] else
    alias[j] — an O(1) exactly-proportional lookup replacing the O(log N)
    CDF search (HDRI.cpp:85-98's job).  Built with the classic two-stack
    partition of under/over-full buckets.
    """
    p = np.asarray(p, np.float64)
    n = p.size
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    scaled = p * n
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    # Leftovers (float residue) are full buckets: prob = 1, self-alias.
    return prob.astype(np.float32), alias


def pack_hdri(hdri, alias_table: bool | None = None) -> dict:
    """Host HDRI -> device dict {img [H,W,3], cdf [H*W+1], rsum,
    + alias_prob/alias_idx [H*W] when the alias table is built}.

    ``alias_table``: True = build, False = skip, None (default) = build
    when the env is small enough that the sequential Vose partition is
    cheap (<= 2^20 texels; ~1 s of host loop per 2M texels).  build_ir
    forces True when the config actually selects the alias sampler, so
    compat/cdf builds never pay for a table they will not read.  An IR
    packed without the table that then renders with
    env_sampler="alias" fails with a clear trace-time error
    (integrator NEE site) — pass alias_table=True when packing an env
    by hand for an alias A/B."""
    img = hdri.texture.data
    if img.shape[2] < 3:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    img3 = img[:, :, :3].astype(np.float32)
    out = {
        "img": jnp.asarray(img3),
        "cdf": jnp.asarray(hdri.cdf.astype(np.float32)),
        # Guarded so an all-black env yields pdf 0 (-> NEE term zeroed in
        # native mode) instead of 0/0 NaN killing every sample.
        "rsum": jnp.asarray(np.float32(max(hdri.radiance_sum, 1e-30))),
    }
    n = img3.shape[0] * img3.shape[1]
    if alias_table is None:
        alias_table = n <= (1 << 20)
    if alias_table:
        # Cache the built table on the HDRI object (like its cdf): the
        # partition is a sequential host loop (~1 s per 2M texels) and
        # build_ir reruns on every scene tweak while the env itself
        # rarely changes.  HDRI instances are effectively frozen after
        # load (mirror/pixel_shift happen on the Texture BEFORE HDRI
        # construction), so identity caching is safe.
        cached = getattr(hdri, "_alias_tables", None)
        if cached is None or cached[0] != n:
            lum = img3.sum(axis=2).reshape(-1).astype(np.float64)
            psum = lum.sum()
            p = lum / psum if psum > 0 else np.full(n, 1.0 / n)
            aprob, aidx = build_alias_table(p)
            cached = (n, jnp.asarray(aprob), jnp.asarray(aidx))
            try:
                hdri._alias_tables = cached
            except AttributeError:  # exotic HDRI stand-ins in tests
                pass
        out["alias_prob"] = cached[1]
        out["alias_idx"] = cached[2]
        if n < (1 << 24):
            # Packed [n, 2] (prob, idx-as-exact-f32) row so the sampler
            # pays ONE row gather instead of two scalar gathers — same
            # per-index gather economics as packed_sort_io
            # (scripts/microbench_gather.py: a [1M, 2] row gather costs
            # what a scalar gather costs).  idx rides as a float32
            # VALUE, exact below 2^24; larger envs keep the two-table
            # path.
            out["alias_packed"] = jnp.stack(
                [cached[1], cached[2].astype(jnp.float32)], axis=1)
    return out


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


def sample_env_alias(env, r1, r2):
    """O(1) alias-table texel sampling (RenderConfig.env_sampler="alias").

    r1 selects the bucket (j = floor(r1*N)); r2 decides bucket-vs-alias
    against prob[j].  A DEDICATED threshold draw is required for
    correctness at large HDRIs: the classic single-uniform trick (reuse
    frac(r1*N)) quantizes the fraction to float32's leftover mantissa —
    at N = 2^21 a ray with r1 in [0.5, 1) has only 3 fraction bits, so
    thresholds collapse to eighths and the realized distribution
    deviates from the luminance-proportional density env_pdf_uv reports
    (a real bias in exactly the big-env regime this sampler targets).

    Two flat gathers replace the CDF binary search's log2(H*W) gather
    chain — the win grows with HDRI size (a 2k x 1k env is 21 search
    steps).  Exactly proportional to texel luminance by construction;
    the pdf of the jittered continuous sampler is unchanged
    (env_pdf_uv)."""
    H, W, _ = env["img"].shape
    n = H * W
    j = jnp.clip((jnp.clip(r1, 0.0, 1.0 - 1e-7) * n).astype(jnp.int32),
                 0, n - 1)
    if "alias_packed" in env:
        # One [n, 2] row gather instead of two scalar gathers (see
        # pack_hdri) — identical values (idx is exact f32 below 2^24).
        row = env["alias_packed"][j]
        take_alias = r2 >= row[..., 0]
        count = jnp.where(take_alias, row[..., 1].astype(jnp.int32), j)
    else:
        take_alias = r2 >= env["alias_prob"][j]
        count = jnp.where(take_alias, env["alias_idx"][j], j)
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


def env_fetch_pdf_uv(env, u, v):
    """Fused texel fetch + native-sampler pdf at continuous (u, v): ONE
    image gather serving both consumers.

    The integrator previously fetched the same texel twice per env
    lookup site (env_fetch_uv for the radiance, env_pdf_uv for the MIS
    density) — and a wavefront-scale gather costs ~30 ms per MILLION
    indices on v5e regardless of row width (XLA lowers it per-index:
    scripts/microbench_gather.py, 0.1-5 GB/s effective), so the
    duplicate fetch was pure step time.  The pdf here is env_pdf_uv's
    exact expression with the luminance taken from the fetched texel;
    values match the unfused pair bit-for-bit for in-range (u, v).

    Returns (rgb [..., 3], pdf [...])."""
    H, W, _ = env["img"].shape
    x = jnp.clip(jnp.trunc(u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.trunc(v * H).astype(jnp.int32), 0, H - 1)
    val = env["img"][y, x]
    lum = val[..., 0] + val[..., 1] + val[..., 2]
    sin_t = jnp.maximum(jnp.sin(v * jnp.pi), 1e-8)
    pdf = (lum / env["rsum"]) * W * H / (2.0 * jnp.pi * jnp.pi * sin_t)
    return val, pdf


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
