"""Denoised beauty PNG from a render checkpoint (the reference's
showcase image is '1000 samples and denoised', README.md:5 — this is
ours, through the multi-scale guided NL-means instead of OIDN).

Usage: CKPT=.runlogs/config5.npz OUT=.runlogs/config5_denoised.png \
           python scripts/denoise_showcase.py
Runs on CPU (reads the .npz; no TPU needed).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from elevenrender_tpu.render.denoise import nlm_denoise_ms
from elevenrender_tpu.utils.image import write_png

CKPT = os.environ.get("CKPT", ".runlogs/config5.npz")
OUT = os.environ.get("OUT", CKPT.replace(".npz", "_denoised.png"))

data = np.load(CKPT)
passes = data["passes"]
npix = passes.shape[1]
res = int(round(npix ** 0.5))
beauty = passes[0, :, :3].reshape(res, res, 3)
albedo = passes[1, :, :3].reshape(res, res, 3)   # DENOISE slot = albedo AOV
normal = passes[2, :, :3].reshape(res, res, 3)
spp = int(data["samples"].max())

out = np.asarray(nlm_denoise_ms(jnp.asarray(beauty), jnp.asarray(normal),
                                jnp.asarray(albedo)))
img = np.clip(np.abs(np.concatenate(
    [out, np.ones((res, res, 1), np.float32)], -1)), 0.0, None) ** (1 / 2.2)
write_png(OUT, np.clip(img, 0.0, 1.0))
print(f"{OUT}: {res}x{res} at {spp} spp, denoised "
      f"(multi-scale guided NL-means)")
