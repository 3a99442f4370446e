"""MIS correctness (native mode): the combined NEE + BRDF-sampling
estimator with balance-heuristic weights must be unbiased against a
brute-force quadrature of the one-bounce integral

    E = integral over sphere of L(w) f(V, w) |cos(theta)| dw

for a textured environment and a glossy Disney surface.  This is the
quantitative check the reference can't pass: it computes MIS weights but
never applies them (kernel.cpp:569-575) and its env pdf normalization is
off by pi/2 (HDRI.cpp:101-107) — the native path fixes both.
"""

import numpy as np
import jax.numpy as jnp

from elevenrender_tpu.core import rng as rng_mod
from elevenrender_tpu.core.vecmath import dot, normalize
from elevenrender_tpu.ops.disney import disney_eval, disney_pdf, disney_sample
from elevenrender_tpu.ops.hdri import (balance_heuristic, env_fetch_uv,
                                       env_pdf_uv, pack_hdri,
                                       sample_env_exact)
from elevenrender_tpu.ops.texture import reverse_spherical_mapping, spherical_mapping
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.texture import Texture


def _hitdata(n):
    return {
        "albedo": jnp.full((n, 3), 0.7),
        "roughness": jnp.full((n,), 0.6),
        "metallic": jnp.full((n,), 0.3),
        "anisotropic": jnp.zeros((n,)),
        "clearcoat": jnp.zeros((n,)),
        "clearcoatGloss": jnp.zeros((n,)),
        "specular": jnp.full((n,), 0.5),
        "specularTint": jnp.zeros((n,)),
        "sheen": jnp.zeros((n,)),
        "sheenTint": jnp.full((n,), 0.5),
        "subsurface": jnp.zeros((n,)),
        "transmission": jnp.zeros((n,)),
        "tangent": jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1)),
        "bitangent": jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1)),
    }


def test_mis_estimator_unbiased():
    rng = np.random.default_rng(7)
    imgH, imgW = 16, 32
    img = rng.uniform(0.05, 1.0, (imgH, imgW, 3)).astype(np.float32)
    img[3, 7] = [25.0, 20.0, 15.0]  # one hot texel to stress NEE
    env = pack_hdri(HDRI(Texture("e", img)))

    n_vec = jnp.array([[0.0, 0.0, 1.0]])
    v_vec = normalize(jnp.array([[0.4, 0.1, 0.9]]))

    # --- ground truth by quadrature over a fine sphere grid -------------
    NT, NP = 256, 512
    theta = (np.arange(NT) + 0.5) / NT * np.pi
    phi = (np.arange(NP) + 0.5) / NP * 2 * np.pi
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    # reverse_spherical_mapping convention: u = phi/2pi, v = theta/pi.
    dirs = np.asarray(reverse_spherical_mapping(
        jnp.asarray(pg.reshape(-1) / (2 * np.pi), jnp.float32),
        jnp.asarray(tg.reshape(-1) / np.pi, jnp.float32)))
    M = dirs.shape[0]
    hdm = _hitdata(M)
    u, v = spherical_mapping(jnp.asarray(-dirs))
    L = np.asarray(env_fetch_uv(env, u, v))
    f = np.asarray(disney_eval(hdm, jnp.broadcast_to(v_vec, (M, 3)),
                               jnp.broadcast_to(n_vec, (M, 3)),
                               jnp.asarray(dirs)))
    cos = np.abs(np.asarray(dot(jnp.asarray(dirs),
                                jnp.broadcast_to(n_vec, (M, 3)))))
    dw = (np.pi / NT) * (2 * np.pi / NP) * np.sin(tg.reshape(-1))
    truth = (L * f * cos[:, None] * dw[:, None]).sum(axis=0)

    # --- MIS estimator (the integrator's native math) --------------------
    N = 400_000
    key_rng = np.random.default_rng(11)
    r_nee = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    hdn = _hitdata(N)
    vN = jnp.broadcast_to(v_vec, (N, 3))
    nN = jnp.broadcast_to(n_vec, (N, 3))

    sx, sy = sample_env_exact(env, r_nee)
    # In-texel jitter, exactly as the native integrator samples.
    ju = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    jv = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    nu = (sx.astype(jnp.float32) + ju) / imgW
    nv = (sy.astype(jnp.float32) + jv) / imgH
    wi = -normalize(reverse_spherical_mapping(nu, nv))
    pdf_e = env_pdf_uv(env, nu, nv)
    f_nee = disney_eval(hdn, vN, nN, wi)
    pdf_b_at_nee = disney_pdf(hdn, vN, nN, wi)
    hw = balance_heuristic(pdf_e, pdf_b_at_nee)
    Lv = env_fetch_uv(env, nu, nv)
    c_nee = Lv * f_nee * jnp.abs(dot(wi, nN))[..., None] / \
        jnp.maximum(pdf_e, 1e-12)[..., None] * hw[..., None]

    r1 = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    r2 = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    r3 = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    wb = disney_sample(hdn, vN, nN, r1, r2, r3)
    wb = normalize(wb)
    pdf_b = disney_pdf(hdn, vN, nN, wb)
    ub, vb = spherical_mapping(-wb)
    pdf_e_at_b = env_pdf_uv(env, ub, vb)
    bw = balance_heuristic(pdf_b, pdf_e_at_b)
    f_b = disney_eval(hdn, vN, nN, wb)
    Lb = env_fetch_uv(env, ub, vb)
    c_b = Lb * f_b * jnp.abs(dot(wb, nN))[..., None] / \
        jnp.maximum(pdf_b, 1e-12)[..., None] * bw[..., None]

    est = np.asarray(c_nee.mean(axis=0) + c_b.mean(axis=0))
    rel = np.abs(est - truth) / truth
    assert (rel < 0.05).all(), (est, truth, rel)


def test_each_strategy_alone_is_unbiased_for_smooth_env():
    """Sanity: with a smooth env, NEE alone (hw=1) matches quadrature,
    pinning the pdf normalization independently of the MIS weights."""
    rng = np.random.default_rng(3)
    imgH, imgW = 16, 32
    img = rng.uniform(0.2, 1.0, (imgH, imgW, 3)).astype(np.float32)
    env = pack_hdri(HDRI(Texture("e", img)))
    n_vec = jnp.array([[0.0, 0.0, 1.0]])
    v_vec = normalize(jnp.array([[0.2, 0.0, 1.0]]))

    NT, NP = 192, 384
    theta = (np.arange(NT) + 0.5) / NT * np.pi
    phi = (np.arange(NP) + 0.5) / NP * 2 * np.pi
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.asarray(reverse_spherical_mapping(
        jnp.asarray(pg.reshape(-1) / (2 * np.pi), jnp.float32),
        jnp.asarray(tg.reshape(-1) / np.pi, jnp.float32)))
    M = dirs.shape[0]
    hdm = _hitdata(M)
    u, v = spherical_mapping(jnp.asarray(-dirs))
    L = np.asarray(env_fetch_uv(env, u, v))
    f = np.asarray(disney_eval(hdm, jnp.broadcast_to(v_vec, (M, 3)),
                               jnp.broadcast_to(n_vec, (M, 3)),
                               jnp.asarray(dirs)))
    cos = np.abs(np.asarray(dot(jnp.asarray(dirs),
                                jnp.broadcast_to(n_vec, (M, 3)))))
    dw = (np.pi / NT) * (2 * np.pi / NP) * np.sin(tg.reshape(-1))
    truth = (L * f * cos[:, None] * dw[:, None]).sum(axis=0)

    N = 300_000
    r = jnp.asarray(np.random.default_rng(5).uniform(0, 1, N).astype(np.float32))
    hdn = _hitdata(N)
    vN = jnp.broadcast_to(v_vec, (N, 3))
    nN = jnp.broadcast_to(n_vec, (N, 3))
    sx, sy = sample_env_exact(env, r)
    jrng = np.random.default_rng(6)
    ju = jnp.asarray(jrng.uniform(0, 1, N).astype(np.float32))
    jv = jnp.asarray(jrng.uniform(0, 1, N).astype(np.float32))
    nu = (sx.astype(jnp.float32) + ju) / imgW
    nv = (sy.astype(jnp.float32) + jv) / imgH
    wi = -normalize(reverse_spherical_mapping(nu, nv))
    pdf_e = env_pdf_uv(env, nu, nv)
    c = env_fetch_uv(env, nu, nv) * disney_eval(hdn, vN, nN, wi) * \
        jnp.abs(dot(wi, nN))[..., None] / jnp.maximum(pdf_e, 1e-12)[..., None]
    est = np.asarray(c.mean(axis=0))
    rel = np.abs(est - truth) / truth
    assert (rel < 0.05).all(), (est, truth, rel)


def test_alias_table_exact_proportionality():
    """The Walker alias table (ops/hdri.build_alias_table) must encode
    the texel distribution EXACTLY: summing each bucket's retained and
    donated mass recovers p to float tolerance, and a dense stratified
    sweep of the unit interval lands in each texel proportionally."""
    from elevenrender_tpu.ops.hdri import build_alias_table, sample_env_alias

    rng = np.random.default_rng(9)
    p = rng.uniform(0.0, 1.0, 64)
    p[5] = 40.0  # hot texel
    p[11] = 0.0  # empty texel
    p = p / p.sum()
    prob, alias = build_alias_table(p)
    n = p.size
    # Reconstruct: bucket j keeps prob[j]/n, donates (1-prob[j])/n to
    # alias[j].
    rec = prob / n
    np.add.at(rec, alias, (1.0 - prob) / n)
    np.testing.assert_allclose(rec, p, atol=1e-7)

    # Stratified sweep through the sampler itself (img 8x8 = 64 texels):
    # r1 stratified over buckets, r2 stratified within each bucket (the
    # dedicated threshold draw — see sample_env_alias).
    img = (p.reshape(8, 8, 1) / 3.0).repeat(3, axis=2).astype(np.float32)
    env = pack_hdri(HDRI(Texture("e", img)))
    N = 200_000
    r = jnp.asarray(((np.arange(N) + 0.5) / N).astype(np.float32))
    r2 = jnp.asarray((((np.arange(N) * 64) % N) / N + 0.5 / N
                      ).astype(np.float32))
    sx, sy = sample_env_alias(env, r, r2)
    flat = np.asarray(sy) * 8 + np.asarray(sx)
    hist = np.bincount(flat, minlength=64) / N
    np.testing.assert_allclose(hist, p, atol=2e-3)
    assert hist[11] == 0.0


def test_alias_nee_estimator_matches_cdf():
    """NEE through the alias sampler must estimate the same integral as
    the searchsorted CDF sampler (different-but-unbiased streams)."""
    from elevenrender_tpu.ops.hdri import sample_env_alias

    rng = np.random.default_rng(13)
    imgH, imgW = 8, 16
    img = rng.uniform(0.05, 1.0, (imgH, imgW, 3)).astype(np.float32)
    img[2, 3] = [30.0, 25.0, 20.0]
    env = pack_hdri(HDRI(Texture("e", img)))
    n_vec = jnp.array([[0.0, 0.0, 1.0]])
    v_vec = normalize(jnp.array([[0.3, 0.1, 1.0]]))

    N = 300_000
    key_rng = np.random.default_rng(17)
    r = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    ju = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    jv = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    hdn = _hitdata(N)
    vN = jnp.broadcast_to(v_vec, (N, 3))
    nN = jnp.broadcast_to(n_vec, (N, 3))

    r_thr = jnp.asarray(key_rng.uniform(0, 1, N).astype(np.float32))
    ests = []
    for sampler in (sample_env_exact, sample_env_alias):
        sx, sy = (sampler(env, r) if sampler is sample_env_exact
                  else sampler(env, r, r_thr))
        nu = (sx.astype(jnp.float32) + ju) / imgW
        nv = (sy.astype(jnp.float32) + jv) / imgH
        wi = -normalize(reverse_spherical_mapping(nu, nv))
        pdf_e = env_pdf_uv(env, nu, nv)
        c = env_fetch_uv(env, nu, nv) * disney_eval(hdn, vN, nN, wi) * \
            jnp.abs(dot(wi, nN))[..., None] / \
            jnp.maximum(pdf_e, 1e-12)[..., None]
        ests.append(np.asarray(c.mean(axis=0)))
    rel = np.abs(ests[0] - ests[1]) / np.maximum(ests[0], 1e-9)
    assert (rel < 0.05).all(), ests


def test_alias_sampler_renders_end_to_end():
    """env_sampler="alias" must run through the full integrator (catches
    wiring regressions) and converge to the same image as "cdf" within
    Monte-Carlo tolerance."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from scenes import cornell_scene
    from elevenrender_tpu.render.integrator import (BEAUTY, init_state,
                                                    render_samples_jit)

    scene, config, ir = cornell_scene(res=16, spp=32)
    config = config.replace(compat=False, max_bounces=2)
    # The alias sampler draws a dedicated threshold uniform, so its RNG
    # stream (and hence its noise) is fully independent of the cdf
    # render's — this is a convergence comparison, not a per-pixel one.
    imgs = {}
    for sampler in ("cdf", "alias"):
        cfg = config.replace(env_sampler=sampler)
        st = render_samples_jit(cfg, ir, init_state(cfg), 32)
        imgs[sampler] = np.asarray(st["passes"][BEAUTY, :, :3])
        assert np.isfinite(imgs[sampler]).all()
        assert imgs[sampler].max() > 0
    diff = np.abs(imgs["cdf"] - imgs["alias"]).mean()
    scale = imgs["cdf"].mean()
    assert diff < 0.5 * scale, (diff, scale)
