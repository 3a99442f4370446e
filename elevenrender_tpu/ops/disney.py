"""Disney BRDF — eval / sample / pdf, batched and differentiable.

TPU-native re-derivation of /root/reference/src/Disney.cpp (itself the
knightcrawler25 GLSL Disney BRDF).  Same lobe set and gating:

- ``disney_eval``   == DisneyEval   (Disney.cpp:160-230): diffuse + retro +
  Hanrahan-Krueger subsurface + sheen + anisotropic GGX specular +
  clearcoat, gated on transmission < 1 && NdotL > 0 && NdotV > 0.
  BRDF only — no transmission lobe (Disney.h:39).
- ``disney_sample`` == DisneySample (Disney.cpp:136-158): cosine hemisphere
  vs GGX-reflection chosen by diffuseRatio = 0.5*(1-metallic).
- ``disney_pdf``    == DisneyPdf    (Disney.cpp:97-133): mixture pdf,
  returns 1.0 when NdotL <= 0 (reference quirk, kept for parity).

Shading state is a flat dict of [...]-shaped arrays (see ``render.hitdata``)
instead of a struct-of-scalars; every formula below is elementwise over the
whole wavefront, so XLA maps it onto the VPU with no divergence.

Differentiability: all branches are ``jnp.where``-based, so reverse-mode AD
flows through albedo/roughness/metallic etc.  Discrete sampling decisions
(lobe choice) happen outside under ``stop_gradient`` (detached-sampling
estimator), per the inverse-rendering design.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import PIF, dot, lerp, normalize, reflect, where3
from .sampling import cosine_sample_hemisphere, importance_sample_ggx


def schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def dielectric_fresnel(cos_theta_i, eta):
    sin_theta_t_sq = eta * eta * (1.0 - cos_theta_i * cos_theta_i)
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t_sq, 0.0))
    rs = (eta * cos_theta_t - cos_theta_i) / (eta * cos_theta_t + cos_theta_i)
    rp = (eta * cos_theta_i - cos_theta_t) / (eta * cos_theta_i + cos_theta_t)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin_theta_t_sq > 1.0, 1.0, f)  # total internal reflection


def gtr1(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    val = (a2 - 1.0) / (PIF * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, 1.0 / PIF, val)


def gtr2(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / (PIF * t * t)


def gtr2_aniso(n_dot_h, h_dot_x, h_dot_y, ax, ay):
    a = h_dot_x / ax
    b = h_dot_y / ay
    c = a * a + b * b + n_dot_h * n_dot_h
    return 1.0 / (PIF * ax * ay * c * c)


def smith_g_ggx(n_dot_v, alpha_g):
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return 1.0 / (n_dot_v + jnp.sqrt(a + b - a * b))


def smith_g_ggx_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay):
    a = v_dot_x * ax
    b = v_dot_y * ay
    c = n_dot_v
    return 1.0 / (n_dot_v + jnp.sqrt(a * a + b * b + c * c))


def _aniso_alphas(roughness, anisotropic):
    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    ax = jnp.maximum(0.001, roughness / aspect)
    ay = jnp.maximum(0.001, roughness * aspect)
    return ax, ay


def disney_pdf(hd, v, n, l):
    """Mixture pdf of the sampling strategy (Disney.cpp:97-133)."""
    h = normalize(l + v)
    t = hd["tangent"]
    b = hd["bitangent"]

    n_dot_h = jnp.abs(dot(n, h))

    clearcoat_alpha = lerp(0.1, 0.001, hd["clearcoatGloss"])
    diffuse_ratio = 0.5 * (1.0 - hd["metallic"])
    specular_ratio = 1.0 - diffuse_ratio
    ax, ay = _aniso_alphas(hd["roughness"], hd["anisotropic"])

    pdf_gtr2 = gtr2_aniso(n_dot_h, dot(h, t), dot(h, b), ax, ay) * n_dot_h
    pdf_gtr1 = gtr1(n_dot_h, clearcoat_alpha) * n_dot_h
    ratio = 1.0 / (1.0 + hd["clearcoat"])
    pdf_spec = lerp(pdf_gtr1, pdf_gtr2, ratio) / (4.0 * jnp.abs(dot(l, h)) + 1e-12)
    pdf_diff = jnp.abs(dot(l, n)) * (1.0 / PIF)

    brdf_pdf = diffuse_ratio * pdf_diff + specular_ratio * pdf_spec
    # Reference returns 1.0 for below-horizon L (Disney.cpp:109-111).
    return jnp.where(dot(n, l) <= 0.0, 1.0, brdf_pdf)


def disney_sample(hd, v, n, r1, r2, r3):
    """Sample a scatter direction (Disney.cpp:136-158)."""
    t = hd["tangent"]
    b = hd["bitangent"]
    diffuse_ratio = 0.5 * (1.0 - hd["metallic"])

    take_diffuse = r3 < diffuse_ratio

    hc = cosine_sample_hemisphere(r1, r2)
    dir_diffuse = t * hc[..., 0:1] + b * hc[..., 1:2] + n * hc[..., 2:3]

    hg = importance_sample_ggx(hd["roughness"], r1, r2)
    h = t * hg[..., 0:1] + b * hg[..., 1:2] + n * hg[..., 2:3]
    dir_spec = reflect(-v, h)

    return where3(take_diffuse, dir_diffuse, dir_spec)


def disney_eval(hd, v, n, l):
    """Full lobe sum (Disney.cpp:160-230).  Returns [..., 3] reflectance."""
    t = hd["tangent"]
    b = hd["bitangent"]
    h = normalize(l + v)

    n_dot_l = jnp.abs(dot(n, l))
    n_dot_v = jnp.abs(dot(n, v))
    n_dot_h = jnp.abs(dot(n, h))
    l_dot_h = jnp.abs(dot(l, h))

    cdlin = hd["albedo"]
    cdlum = 0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1] + 0.1 * cdlin[..., 2]
    ctint = where3(cdlum > 0.0, cdlin / jnp.maximum(cdlum, 1e-12)[..., None],
                   jnp.ones_like(cdlin))
    one3 = jnp.ones_like(cdlin)
    cspec0 = lerp(hd["specular"][..., None] * 0.08 *
                  lerp(one3, ctint, hd["specularTint"][..., None]),
                  cdlin, hd["metallic"][..., None])
    csheen = lerp(one3, ctint, hd["sheenTint"][..., None])

    fl = schlick_fresnel(n_dot_l)
    fv = schlick_fresnel(n_dot_v)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * hd["roughness"]
    fd = lerp(1.0, fd90, fl) * lerp(1.0, fd90, fv)

    fss90 = l_dot_h * l_dot_h * hd["roughness"]
    fss = lerp(1.0, fss90, fl) * lerp(1.0, fss90, fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(n_dot_l + n_dot_v, 1e-12) - 0.5) + 0.5)

    ax, ay = _aniso_alphas(hd["roughness"], hd["anisotropic"])
    ds = gtr2_aniso(n_dot_h, dot(h, t), dot(h, b), ax, ay)
    fh = schlick_fresnel(l_dot_h)
    fs = lerp(cspec0, one3, fh[..., None])
    gs = (smith_g_ggx_aniso(n_dot_l, dot(l, t), dot(l, b), ax, ay) *
          smith_g_ggx_aniso(n_dot_v, dot(v, t), dot(v, b), ax, ay))

    fsheen = fh[..., None] * hd["sheen"][..., None] * csheen

    dr = gtr1(n_dot_h, lerp(0.1, 0.001, hd["clearcoatGloss"]))
    fr = lerp(0.04, 1.0, fh)
    gr = smith_g_ggx(n_dot_l, 0.25) * smith_g_ggx(n_dot_v, 0.25)

    brdf = (((1.0 / PIF) * lerp(fd, ss, hd["subsurface"])[..., None] * cdlin + fsheen)
            * (1.0 - hd["metallic"])[..., None]
            + (gs * ds)[..., None] * fs
            + (0.25 * hd["clearcoat"] * gr * fr * dr)[..., None])

    gate = ((hd["transmission"] < 1.0) & (dot(n, l) > 0.0) & (dot(n, v) > 0.0))
    return where3(gate, brdf, jnp.zeros_like(brdf))
