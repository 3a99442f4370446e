"""Inverse rendering (BASELINE config 4) + multi-device sharding tests."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from elevenrender_tpu.parallel.mesh import (PIXEL_AXIS, make_mesh,
                                            replicate_ir,
                                            shard_render_state)
from elevenrender_tpu.render.grad import (float_subtree,
                                          render_loss_and_grad)
from elevenrender_tpu.render.integrator import (BEAUTY, init_state,
                                                render_sample,
                                                render_sample_jit)

from scenes import cornell_scene

RES = 16


def small_config(**kw):
    scene, config, ir = cornell_scene(res=RES, spp=2)
    config = config.replace(compat=False, max_bounces=2, **kw)
    return config, ir


def test_albedo_gradient_signs():
    """Brightening the target must push albedo gradients negative (loss
    decreases when albedo increases toward a brighter target)."""
    config, ir = small_config()
    params = {"materials": float_subtree(ir["materials"])}

    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)["passes"][BEAUTY, :, :3])

    bright = jnp.asarray(img * 2.0 + 0.2)
    loss_b, grads_b = render_loss_and_grad(config, ir, params, bright, 1)
    dark = jnp.asarray(img * 0.2)
    loss_d, grads_d = render_loss_and_grad(config, ir, params, dark, 1)

    g_bright = np.asarray(grads_b["materials"]["albedo"])
    g_dark = np.asarray(grads_d["materials"]["albedo"])
    assert np.isfinite(g_bright).all() and np.isfinite(g_dark).all()
    # White wall (material 0) gradient: negative toward bright target,
    # positive toward dark target.
    assert g_bright[0].sum() < 0
    assert g_dark[0].sum() > 0


def test_inverse_rendering_recovers_albedo():
    """Gradient descent on wall albedo recovers a target albedo.

    The target is rendered with the SAME estimator (same spp, same RNG
    stream), so the true albedo is the exact minimizer and convergence is
    deterministic — the standard self-consistent inverse-rendering check.
    """
    from elevenrender_tpu.render.grad import render_beauty
    config, ir = small_config()
    target_ir = dict(ir)
    target_ir["materials"] = {
        **ir["materials"],
        "albedo": ir["materials"]["albedo"].at[0].set(
            jnp.array([0.2, 0.6, 0.3]))}
    target, _ = render_beauty(config, target_ir, 1)
    target = jax.lax.stop_gradient(target)

    import optax
    # Optimize only the white wall's albedo (material row 0) — a clean
    # 3-variable problem; other rows' gradients are masked out.
    params = {"materials": {"albedo": ir["materials"]["albedo"]}}
    row_mask = jnp.zeros_like(params["materials"]["albedo"]).at[0].set(1.0)
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    losses = []
    for it in range(80):
        loss, grads = render_loss_and_grad(config, ir, params, target, 1)
        losses.append(float(loss))
        grads["materials"]["albedo"] = grads["materials"]["albedo"] * row_mask
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params["materials"]["albedo"] = jnp.clip(
            params["materials"]["albedo"], 0.0, 1.0)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    rec = np.asarray(params["materials"]["albedo"][0])
    tgt = np.array([0.2, 0.6, 0.3])
    assert np.abs(rec - tgt).mean() < np.abs(np.array([0.73] * 3) - tgt).mean()


def test_accumulated_gradient_matches_direct():
    """The flat-memory two-pass accumulator (render_loss_and_grad_accum)
    must equal direct AD through the whole sample loop — same RNG
    streams, linearity of the Monte-Carlo mean makes it exact up to
    reduction order."""
    from elevenrender_tpu.render.grad import render_loss_and_grad_accum
    config, ir = small_config()
    params = {"materials": float_subtree(ir["materials"])}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.5 + 0.1)

    n = 3
    loss_d, grads_d = render_loss_and_grad(config, ir, params, target, n)
    loss_a, grads_a = render_loss_and_grad_accum(config, ir, params,
                                                 target, n)
    assert np.isclose(float(loss_d), float(loss_a), rtol=1e-5)
    flat_d = jax.tree.leaves(grads_d)
    flat_a = jax.tree.leaves(grads_a)
    assert len(flat_d) == len(flat_a)
    for a, d in zip(flat_a, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                   rtol=2e-4, atol=1e-6)


def test_trace_cache_replay_matches_retrace():
    """cache_traces=True (pass 2 replays pass 1's recorded hit ids and
    occlusion bits, running zero traversals/sorts) must give the same
    loss and gradients as the re-tracing accumulator: discrete trace
    results are detached constants of the backward pass either way."""
    from elevenrender_tpu.render.grad import render_loss_and_grad_accum
    config, ir = small_config()
    config = config.replace(n_lights=1)
    ir = dict(ir)
    ir["lights"] = {"pos": jnp.asarray([[0.0, 1.5, -1.0]], jnp.float32),
                    "rad": jnp.asarray([[6.0, 5.0, 4.0]], jnp.float32)}
    params = {"materials": float_subtree(ir["materials"]),
              "env": {"img": ir["env"]["img"]},
              "lights": {"rad": ir["lights"]["rad"]}}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.5 + 0.1)

    loss_r, grads_r = render_loss_and_grad_accum(config, ir, params,
                                                 target, 3,
                                                 cache_traces=False)
    loss_c, grads_c = render_loss_and_grad_accum(config, ir, params,
                                                 target, 3,
                                                 cache_traces=True)
    assert np.isclose(float(loss_r), float(loss_c), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_r), jax.tree.leaves(grads_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_material_fetch_mm_bwd_matches_gather():
    """material_fetch="mm_bwd" (gather forward, one-hot-matmul backward —
    the r5 default) must produce the same loss and the same material
    gradients as the plain scatter-add backward, up to f32 summation
    order; "onehot" (matmul both ways) must too, exactly in forward
    (one-hot rows have a single 1.0 coefficient)."""
    from elevenrender_tpu.render.grad import render_loss_and_grad
    config, ir = small_config()
    params = {"materials": float_subtree(ir["materials"])}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.5 + 0.1)

    results = {}
    for mf in ("gather", "mm_bwd", "onehot"):
        cfg = config.replace(material_fetch=mf)
        results[mf] = render_loss_and_grad(cfg, ir, params, target, 1)
    for mf in ("mm_bwd", "onehot"):
        assert np.isclose(float(results["gather"][0]),
                          float(results[mf][0]), rtol=1e-6), mf
        for a, b in zip(jax.tree.leaves(results["gather"][1]),
                        jax.tree.leaves(results[mf][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=mf)


def test_remat_bounces_gradients_match():
    """remat_bounces (jax.checkpoint on the bounce body — the memory
    knob that makes 1M-tri 1024² gradients fit HBM, docs/PERF.md) must
    not change forward results or gradients: recompute-vs-store only."""
    from elevenrender_tpu.render.grad import render_loss_and_grad_accum
    config, ir = small_config()
    params = {"materials": float_subtree(ir["materials"])}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.5 + 0.1)

    loss0, grads0 = render_loss_and_grad_accum(config, ir, params,
                                               target, 2)
    cfg_r = config.replace(remat_bounces=True)
    loss1, grads1 = render_loss_and_grad_accum(cfg_r, ir, params,
                                               target, 2)
    assert np.isclose(float(loss0), float(loss1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads0), jax.tree.leaves(grads1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_camera_and_hdri_gradients_finite():
    """Pixel gradients flow to camera position and HDRI radiance."""
    config, ir = small_config()
    state = init_state(config)
    img0 = render_sample_jit(config, ir, state)["passes"][BEAUTY, :, :3]
    target = jax.lax.stop_gradient(img0 * 1.5)

    def loss(cam_rot, cam_pos, env_img):
        ir2 = dict(ir)
        ir2["camera"] = {**ir["camera"], "rotation": cam_rot,
                         "position": cam_pos}
        ir2["env"] = {**ir["env"], "img": env_img}
        from elevenrender_tpu.render.integrator import render_sample
        st = render_sample(config, ir2, init_state(config))
        return jnp.mean((st["passes"][BEAUTY, :, :3] - target) ** 2)

    g_rot, g_pos, g_env = jax.grad(loss, argnums=(0, 1, 2))(
        ir["camera"]["rotation"], ir["camera"]["position"], ir["env"]["img"])
    assert np.isfinite(np.asarray(g_rot)).all()
    assert np.isfinite(np.asarray(g_pos)).all()
    assert np.isfinite(np.asarray(g_env)).all()
    # Env is visible (miss rays + NEE) -> nonzero grad.  Rotation changes
    # ray directions -> wo -> the BSDF -> nonzero grad.  (Position's grad
    # is legitimately ~0 with constant materials: radiance depends on the
    # origin only through discrete hit selection, which is detached.)
    assert np.abs(np.asarray(g_env)).sum() > 0
    assert np.abs(np.asarray(g_rot)).sum() > 0


def test_camera_gradients_match_finite_differences():
    """Camera rotation AND position gradients pinned against central
    finite differences (VERDICT r4 #3: the north star names camera
    gradients explicitly; finiteness alone is not a correctness check).

    A point light is added so radiance depends continuously on the hit
    POSITION (1/d² falloff + direction) — with constant materials and an
    env-only scene the position dependence is purely discrete (hit-id
    selection, detached by design) and both AD and FD would be ~0.
    Discrete decisions are identical under a small parameter bump with
    the fixed RNG stream, so the loss is locally smooth and FD is exact
    to O(eps²).

    max_bounces=1: camera parameters feed disney_sample through wo, and
    the sampled bounce direction is stop_gradient-detached (the
    detached-sampling estimator) — at 2+ bounces FD measures that path
    while AD intentionally excludes it (measured: rotation[0] FD 2.4x
    AD).  Direct lighting makes the detached path inert, so this pins
    the exact continuous chain AD computes: pixel jitter -> ray -> hit
    position -> point-light 1/d² + wo -> DisneyEval + env NEE."""
    config, ir = small_config()
    config = config.replace(n_lights=1, max_bounces=1)
    ir = dict(ir)
    ir["lights"] = {"pos": jnp.asarray([[0.0, 1.5, -1.0]], jnp.float32),
                    "rad": jnp.asarray([[6.0, 5.0, 4.0]], jnp.float32)}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.4 + 0.05)

    base_rot = ir["camera"]["rotation"]
    base_pos = ir["camera"]["position"]
    params = {"camera": {"rotation": base_rot, "position": base_pos}}
    loss0, grads = render_loss_and_grad(config, ir, params, target, 1)
    g_rot = np.asarray(grads["camera"]["rotation"])
    g_pos = np.asarray(grads["camera"]["position"])
    assert np.abs(g_rot).sum() > 0
    assert np.abs(g_pos).sum() > 0

    def loss_at(rot, pos):
        p2 = {"camera": {"rotation": rot, "position": pos}}
        l, _ = render_loss_and_grad(config, ir, p2, target, 1)
        return float(l)

    def fd_smooth(f, eps):
        """Central FD at eps and eps/2.  FD is only meaningful where the
        loss is locally smooth; a geometric-silhouette crossing inside
        the stencil makes FD measure a jump/(2 eps), which DOUBLES when
        eps halves — detect that and report the coordinate as
        edge-contaminated (None) instead of failing on it (measured:
        position[1] FD -193 vs AD -0.03 from exactly such an edge)."""
        fd1 = (f(eps) - f(-eps)) / (2 * eps)
        fd2 = (f(eps / 2) - f(-eps / 2)) / eps
        if abs(fd2 - fd1) > 0.05 * max(abs(fd1), abs(fd2)) + 1e-3:
            return None
        return fd2

    eps = 1e-3
    checked = 0
    for c in range(3):
        fd = fd_smooth(lambda e: loss_at(base_rot.at[c].add(e), base_pos),
                       eps)
        if fd is not None:
            np.testing.assert_allclose(g_rot[c], fd, rtol=2e-2, atol=5e-4,
                                       err_msg=f"rotation[{c}]")
            checked += 1
        fd = fd_smooth(lambda e: loss_at(base_rot, base_pos.at[c].add(e)),
                       eps)
        if fd is not None:
            np.testing.assert_allclose(g_pos[c], fd, rtol=2e-2, atol=5e-4,
                                       err_msg=f"position[{c}]")
            checked += 1
    # At least 4 of the 6 camera coordinates must admit a clean FD pin.
    assert checked >= 4, f"only {checked} smooth coordinates"


def test_env_gradients_match_finite_differences():
    """HDRI texel gradients pinned against central finite differences
    (VERDICT r4 #3: light gradients).  The CDF tables in ir['env'] stay
    fixed while img varies — the detached-sampling estimator's sampling
    distribution is a constant of the backward pass, and FD perturbs the
    same construction, so both sides measure the same derivative."""
    config, ir = small_config()
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.4 + 0.05)

    base = ir["env"]["img"]
    params = {"env": {"img": base}}
    loss0, grads = render_loss_and_grad(config, ir, params, target, 1)
    g = np.asarray(grads["env"]["img"])
    assert np.abs(g).sum() > 0

    def loss_at(env_img):
        l, _ = render_loss_and_grad(config, ir, {"env": {"img": env_img}},
                                    target, 1)
        return float(l)

    eps = 1e-3
    flat = np.abs(g).ravel()
    coords = {int(flat.argmax()), 0, flat.size // 2, flat.size - 1}
    checked = 0
    for c in coords:
        i, rem = divmod(c, g.shape[1] * g.shape[2])
        j, ch = divmod(rem, g.shape[2])
        fd = (loss_at(base.at[i, j, ch].add(eps))
              - loss_at(base.at[i, j, ch].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g[i, j, ch], fd, rtol=1e-2, atol=3e-4,
                                   err_msg=f"env[{i},{j},{ch}]")
        checked += 1
    assert checked >= 3


def test_sharded_render_matches_single_device():
    """8-virtual-device pixel sharding produces the same image."""
    config, ir = small_config()
    state = init_state(config)
    ref = render_sample_jit(config, ir, state)
    ref_img = np.asarray(ref["passes"])

    mesh = make_mesh(8)
    ir_r = replicate_ir(ir, mesh)
    st = shard_render_state(init_state(config), mesh)
    step = jax.jit(
        lambda ir, st: render_sample(config, ir, st),
        out_shardings={
            "passes": NamedSharding(mesh, P(None, PIXEL_AXIS, None)),
            "samples": NamedSharding(mesh, P(PIXEL_AXIS)),
            "rng": NamedSharding(mesh, P(PIXEL_AXIS)),
        })
    out = step(ir_r, st)
    np.testing.assert_allclose(np.asarray(out["passes"]), ref_img,
                               rtol=1e-4, atol=1e-5)


def test_shard_map_render_matches_single_device():
    """Explicit shard_map path (required for Pallas multi-chip) produces
    the same image as single-device, incl. global pixel index handling."""
    from elevenrender_tpu.parallel.mesh import shard_map_render_step
    config, ir = small_config()
    state = init_state(config)
    ref = render_sample_jit(config, ir, state)
    ref_img = np.asarray(ref["passes"])

    mesh = make_mesh(8)
    ir_r = replicate_ir(ir, mesh)
    st = shard_render_state(init_state(config), mesh)
    step = shard_map_render_step(config, mesh)(ir_r)
    out = step(ir_r, st)
    np.testing.assert_allclose(np.asarray(out["passes"]), ref_img,
                               rtol=1e-4, atol=1e-5)


def test_albedo_gradient_matches_finite_differences():
    """AD gradients must MATCH central finite differences, not just have
    the right sign (BASELINE.json: "pixel-grad allclose").  With the RNG
    stream fixed, the estimator is a deterministic function of albedo;
    discrete decisions (hit ids, opacity coin flips) are detached /
    unchanged under a small albedo bump, so the map is smooth and FD is
    exact to O(eps^2)."""
    from elevenrender_tpu.render.grad import render_loss_and_grad
    config, ir = small_config()
    params = {"materials": float_subtree(ir["materials"])}
    state = init_state(config)
    img = np.asarray(render_sample_jit(config, ir, state)[
        "passes"][BEAUTY, :, :3])
    target = jnp.asarray(img * 1.4 + 0.05)

    loss0, grads = render_loss_and_grad(config, ir, params, target, 1)
    g = np.asarray(grads["materials"]["albedo"])

    def loss_at(albedo):
        p2 = {"materials": {**params["materials"], "albedo": albedo}}
        l, _ = render_loss_and_grad(config, ir, p2, target, 1)
        return float(l)

    eps = 1e-3
    base = params["materials"]["albedo"]
    # Spot-check 4 coordinates across materials/channels, including the
    # largest-gradient one.
    flat = np.abs(g).ravel()
    coords = {int(flat.argmax())} | {0, g.shape[1] + 1, 2 * g.shape[1] + 2}
    checked = 0
    for c in coords:
        m, ch = divmod(c, g.shape[1])
        if m >= g.shape[0]:
            continue
        lp = loss_at(base.at[m, ch].add(eps))
        lm = loss_at(base.at[m, ch].add(-eps))
        fd = (lp - lm) / (2 * eps)
        # atol floor = the FD quantization limit: the float32 loss
        # (~4.0, ULP ~2.4e-7) divided by 2*eps gives ~1.2e-4 of noise on
        # small-gradient coordinates.
        np.testing.assert_allclose(g[m, ch], fd, rtol=5e-3, atol=2e-4,
                                   err_msg=f"albedo[{m},{ch}]")
        checked += 1
    assert checked >= 3
