"""Denoiser quality ratchet (VERDICT r4 #9): PSNR of the denoised
low-spp render vs a high-spp ground truth, with thresholds, so kernel or
filter changes cannot silently regress the OIDN replacement
(/root/reference/src/Managers.cpp:319-343).

Deterministic: fixed RNG streams, fixed scene, CPU backend."""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.render import denoise as dn
from elevenrender_tpu.render.integrator import (BEAUTY, DENOISE, NORMAL,
                                                init_state,
                                                render_samples_jit)

from scenes import cornell_scene

RES = 32


def _psnr(a, b, peak):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))


def _render(config, ir, spp):
    state = init_state(config)
    state = render_samples_jit(config, ir, state, spp)
    p = np.asarray(state["passes"])
    return p[BEAUTY, :, :3], p[NORMAL, :, :3], p[DENOISE, :, :3]


def test_denoise_psnr_ratchet():
    scene, config, ir = cornell_scene(res=RES, spp=4)
    config = config.replace(compat=False, max_bounces=3)
    gt, _, _ = _render(config, ir, 512)
    noisy, normal, albedo = _render(config, ir, 4)
    peak = float(gt.max())

    def flat4(x):
        return np.concatenate([x, np.ones((x.shape[0], 1), x.dtype)],
                              axis=1).reshape(-1)

    out = np.asarray(dn.denoise(RES, RES, flat4(noisy), flat4(normal),
                                flat4(albedo))).reshape(-1, 4)[:, :3]
    psnr_noisy = _psnr(noisy.reshape(RES, RES, 3), gt.reshape(RES, RES, 3),
                       peak)
    psnr_dn = _psnr(out.reshape(RES, RES, 3), gt.reshape(RES, RES, 3), peak)
    # Ratchet: the denoiser must (a) improve on the input and (b) clear
    # an absolute floor measured at commit time minus a safety margin.
    assert psnr_dn > psnr_noisy + 2.0, (psnr_noisy, psnr_dn)
    assert psnr_dn > 25.0, psnr_dn


def test_denoise_color_only_path():
    """The guide-less cross-bilateral (the reference's OIDN usage is
    color-only) must also improve PSNR."""
    scene, config, ir = cornell_scene(res=RES, spp=4)
    config = config.replace(compat=False, max_bounces=3)
    gt, _, _ = _render(config, ir, 512)
    noisy, _, _ = _render(config, ir, 4)
    peak = float(gt.max())

    raw = np.concatenate([noisy, np.ones((noisy.shape[0], 1), noisy.dtype)],
                         axis=1).reshape(-1)
    out = np.asarray(dn.denoise(RES, RES, raw)).reshape(-1, 4)[:, :3]
    p_noisy = _psnr(noisy, gt, peak)
    p_dn = _psnr(out, gt, peak)
    assert p_dn > p_noisy + 1.0, (p_noisy, p_dn)
