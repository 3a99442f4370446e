"""Denoiser A/B evidence (VERDICT r3 #7 + weak #6): committed numbers
for every filter decision the docstrings cite.

Scenes (CPU, small res — the filters are resolution-agnostic):
  - cornell 4 spp vs 400-spp converged (the existing gate scene);
  - GLOSSY cornell (metallic walls: rough-specular noise + fireflies)
    4 spp vs 600-spp converged.

Filters:
  noisy            raw 4-spp render (baseline denominator)
  bilateral        r2 cross-bilateral (guides)
  nlm              r3 single-scale noise-compensated guided NL-means
  nlm_demod        nlm on albedo-DEMODULATED color (OIDN's first move —
                   the A/B the module docstring cites as measured worse)
  nlm_ms           r4 multi-scale pyramid (the shipped default)

Prints an MSE-ratio table (vs converged; lower is better) and exits 0.
Run: python scripts/denoise_ab.py | tee .runlogs/denoise_ab_r04.log
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from scenes import cornell_scene
from elevenrender_tpu.render import denoise as dn
from elevenrender_tpu.render.integrator import init_state, render_samples_jit

RES = int(os.environ.get("RES", "48"))


def render(config, ir, spp):
    state = render_samples_jit(config, ir, init_state(config), spp)
    img = np.asarray(state["passes"][0, :, :3]).reshape(RES, RES, 3)
    normal = np.asarray(state["passes"][2, :, :3]).reshape(RES, RES, 3)
    albedo = np.asarray(state["passes"][1, :, :3]).reshape(RES, RES, 3)
    return img, normal, albedo


def demod_nlm(noisy, normal, albedo):
    """OIDN-style albedo demodulation around the r3 single-scale filter."""
    mod = np.maximum(albedo, 0.05)
    out = np.asarray(dn.nlm_denoise(jnp.asarray(noisy / mod),
                                    jnp.asarray(normal),
                                    jnp.asarray(albedo)))
    return out * mod


for label, glossy, ref_spp in (("cornell", False, 400),
                               ("glossy-cornell", True, 600)):
    scene, config, ir = cornell_scene(res=RES, spp=4, glossy=glossy)
    config = config.replace(compat=False)
    noisy, normal, albedo = render(config, ir, 4)
    ref, _, _ = render(config, ir, ref_spp)

    jn, jnm, ja = (jnp.asarray(noisy), jnp.asarray(normal),
                   jnp.asarray(albedo))
    outs = {
        "noisy": noisy,
        "bilateral": np.asarray(dn.bilateral_denoise(jn, jnm, ja)),
        "nlm": np.asarray(dn.nlm_denoise(jn, jnm, ja)),
        "nlm_demod": demod_nlm(noisy, normal, albedo),
        "nlm_ms": np.asarray(dn.nlm_denoise_ms(jn, jnm, ja)),
    }
    mse0 = float(np.mean((noisy - ref) ** 2))
    print(f"\n[{label}] 4 spp vs {ref_spp} spp converged; "
          f"MSE(noisy)={mse0:.5f}")
    for k, v in outs.items():
        mse = float(np.mean((v - ref) ** 2))
        print(f"  {k:10s} MSE {mse:.5f}  ratio {mse / mse0:5.3f}x")
