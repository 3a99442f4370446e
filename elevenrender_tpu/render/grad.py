"""Differentiable rendering: pixel gradients w.r.t. scene parameters.

The reference has no gradients at all; this module delivers the north-star
capability (BASELINE.json): reverse-mode pixel gradients with respect to
material parameters (albedo/roughness/metallic/...), HDRI radiance, and
camera parameters, using the detached-sampling estimator — discrete
decisions (BVH hit ids, CDF texel choice, lobe choice, RNG stream) are
constants of the backward pass; radiance estimators stay differentiable
through DisneyEval, texture fetches, and the env lookups.  This is the
radiative-backprop-style adjoint without the explicit adjoint pass: the
forward wavefront is replayed by XLA's autodiff with the same O(depth)
structure.

Typical use (inverse rendering, BASELINE config 4)::

    params = {"materials": ir["materials"]}   # any differentiable subtree
    loss, grads = render_loss_and_grad(config, ir, params, target, n_samples)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .integrator import BEAUTY, init_state, render_sample, sample_radiance


def float_subtree(tree: dict) -> dict:
    """Keep only inexact (differentiable) leaves — int tables like texture
    ids are structural, not parameters."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            sub = float_subtree(v)
            if sub:
                out[k] = sub
        elif jnp.issubdtype(jnp.asarray(v).dtype, jnp.inexact):
            out[k] = v
    return out


def _merge(ir: dict, params: dict) -> dict:
    out = dict(ir)
    for k, v in params.items():
        if isinstance(v, dict) and isinstance(ir.get(k), dict):
            out[k] = {**ir[k], **v}
        else:
            out[k] = v
    return out


def render_beauty(config, ir, n_samples: int, state=None):
    """Render n samples and return the beauty pass [H*W, 3] (linear mean
    estimate — native accumulation, no compat dimming)."""
    if state is None:
        state = init_state(config)

    def body(s, st):
        return render_sample(config, ir, st)

    state = jax.lax.fori_loop(0, n_samples, body, state)
    return state["passes"][BEAUTY, :, :3], state


def loss_fn(config, ir, params, target, n_samples: int):
    """MSE between rendered beauty and target [H*W, 3]."""
    merged = _merge(ir, params)
    img, _ = render_beauty(config, merged, n_samples)
    return jnp.mean((img - target) ** 2)


@functools.partial(jax.jit, static_argnums=(0, 4))
def render_loss_and_grad(config, ir, params, target, n_samples: int):
    """Returns (loss, grads-pytree-matching-params)."""
    return jax.value_and_grad(loss_fn, argnums=2)(
        config, ir, params, target, n_samples)


def fwd_bwd_step(config, ir, target, n_samples: int = 1):
    """One forward+backward pass (the benchmark unit: rays traced in both
    directions).  Grads taken w.r.t. the full material table."""
    params = {"materials": float_subtree(ir["materials"])}
    return render_loss_and_grad(config, ir, params, target, n_samples)


@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=2)
def _accum_fwd_chunk(config, merged_ir, state, n: int):
    """n forward samples in one executable (pass 1 unit)."""
    def body(s, st):
        return render_sample(config, merged_ir, st)
    return jax.lax.fori_loop(0, n, body, state)


@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=2)
def _accum_fwd_chunk_record(config, merged_ir, state, n: int):
    """n forward samples in one executable, RECORDING each sample's
    discrete trace results (hit ids + occlusion bits) for pass 2 to
    replay.  Returns (state, caches) with caches stacked [n, ...]."""
    def body(st, _):
        st2, cache = render_sample(config, merged_ir, st, record=True)
        return st2, cache
    return jax.lax.scan(body, state, None, length=n)


@functools.partial(jax.jit, static_argnums=(0, 5))
def _accum_bwd_chunk(config, ir, params, seed, rng, n: int, caches=None):
    """n per-sample VJP accumulations in one executable (pass 2 unit).

    ``caches``: pass-1 trace recordings stacked [n, ...]; when given,
    each sample's VJP REPLAYS them — the backward pass then runs zero
    BVH traversals and zero ray sorts (together ~100% of the step;
    shading is ~0%, docs/PERF.md), which is exact because discrete trace
    results are detached constants of the estimator either way."""
    npix = seed.shape[0]

    def body(i, carry):
        grads, rng = carry
        cache_i = (None if caches is None
                   else jax.tree.map(lambda a: a[i], caches))

        def f(p):
            out, rng2 = sample_radiance(config, _merge(ir, p), rng, npix,
                                        trace_cache=cache_i)
            return out["light"], (out["ok"], rng2)

        light, vjp, (ok, rng2) = jax.vjp(f, params, has_aux=True)
        (g,) = vjp(seed * ok[:, None])
        grads = jax.tree.map(jnp.add, grads, g)
        return grads, rng2

    grads0 = jax.tree.map(jnp.zeros_like, params)
    return jax.lax.fori_loop(0, n, body, (grads0, rng))


def render_loss_and_grad_accum(config, ir, params, target, n_samples: int,
                               chunk: int | None = None,
                               cache_traces: bool = True):
    """Flat-memory n-sample gradient: the two-pass estimator.

    Differentiating render_loss_and_grad at the BASELINE shape (1024²,
    64 spp) would store 64 samples of wavefront residuals; instead use
    the linearity of the Monte-Carlo mean.  With per-pixel counts c and
    valid masks ok_s (the NaN guard):

        img = Σ_s ok_s · light_s / c,   L = mean((img − target)²)
        ∂L/∂θ = Σ_s VJP(light_s)[ ∂L/∂img · ok_s / c ]

    Pass 1 renders forward-only (no residuals) to get img and c; pass 2
    replays each sample from the same RNG stream and accumulates ONE
    sample's VJP at a time in a fori_loop carry — memory is that of a
    1-spp backward pass regardless of n_samples.  This is the
    radiative-backprop two-pass structure expressed through XLA autodiff.

    ``chunk``: samples per DISPATCH.  Both passes are driven by a host
    loop over jitted chunk programs instead of one 64-sample executable:
    the monolithic 64-sample program's ~300 s single dispatch killed the
    TPU worker in r3 — root-caused in r4 to single-dispatch WALL TIME
    (the tunnel worker's envelope is between ~46 s and ~140 s,
    scripts/multilaunch.py; docs/PERF.md).  Default (None) asks
    integrator.recommended_samples_per_dispatch, which bounds the chunk
    by scene scale (8 at 66k VMEM-mode ~ 19 s, 1 at 1M stream ~ 25 s).

    ``cache_traces`` (default on): pass 1 records each sample's discrete
    trace results (hit tri ids + occlusion bits, ~6 bytes/pixel/bounce —
    ~1.9 GB at the 1024² 64-spp headline shape) and pass 2 REPLAYS them,
    so the backward runs no traversal and no sorts at all.  Exact: the
    detached-sampling estimator treats those results as constants of the
    backward pass either way.  Turn off only when HBM is too tight for
    the cache (pass 2 then re-traces every sample).

    Native mode only (compat's sample-count-starts-at-1 average
    intentionally dims; gradients target the unbiased native estimate).
    """
    assert not config.compat, "accumulated gradients are native-mode only"
    if chunk is None:
        from .integrator import recommended_samples_per_dispatch
        chunk = recommended_samples_per_dispatch(config, ir)
    merged = _merge(ir, params)

    # ---- pass 1: forward only, chunked ---------------------------------
    state = init_state(config)
    caches = []
    done = 0
    while done < n_samples:
        n = min(chunk, n_samples - done)
        if cache_traces:
            state, cache = _accum_fwd_chunk_record(config, merged, state, n)
            caches.append(cache)
        else:
            state = _accum_fwd_chunk(config, merged, state, n)
        done += n
    img = state["passes"][BEAUTY, :, :3]
    count = jnp.maximum(state["samples"].astype(jnp.float32), 1.0)
    loss = jnp.mean((img - target) ** 2)
    # d loss / d img, folded with the per-sample progressive weight.
    seed = (2.0 * (img - target) / img.size) / count[:, None]
    seed = jax.lax.stop_gradient(seed)

    # ---- pass 2: per-sample VJP accumulation, chunked ------------------
    grads = jax.tree.map(jnp.zeros_like, params)
    rng = init_state(config)["rng"]
    done = 0
    ci = 0
    while done < n_samples:
        n = min(chunk, n_samples - done)
        g, rng = _accum_bwd_chunk(config, ir, params, seed, rng, n,
                                  caches[ci] if cache_traces else None)
        ci += 1
        grads = jax.tree.map(jnp.add, grads, g)
        done += n
    return loss, grads


def fwd_bwd_step_accum(config, ir, target, n_samples: int,
                       chunk: int | None = None):
    """The BASELINE headline unit at its own shape: n-sample render +
    n-sample accumulated backward, flat memory (BASELINE.md:21)."""
    params = {"materials": float_subtree(ir["materials"])}
    return render_loss_and_grad_accum(config, ir, params, target, n_samples,
                                      chunk=chunk)
