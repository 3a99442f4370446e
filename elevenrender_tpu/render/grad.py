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

from .integrator import BEAUTY, init_state, render_sample


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
