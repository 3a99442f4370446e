"""Programmable albedo shaders — the ASL analog.

The reference splices custom LLVM-IR function bodies into 4 placeholder
slots at build time (/root/reference/src/shader.{h,cpp},
function_body_replace.py; dispatch switch in shader.cpp:3-10; invoked when
material->albedoShaderID != -1, kernel.cpp:530-536).

The idiomatic JAX equivalent is a registry of jittable functions: each
shader is a Python function over batched arrays, traced and fused into the
render kernel by XLA — same extensibility, no IR splicing.  Dispatch is a
masked select over the (small, static) registry, the vectorized analog of
the reference's switch.

Shader signature::

    def shader(position, view_dir, normal, gnormal, tu, tv) -> rgb [..., 3]

MAX_SHADERS mirrors shader.h:5 (4 slots); the default body is the
reference placeholder's constant yellow (shader_placeholder.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_SHADERS = 4


def _placeholder(position, view_dir, normal, gnormal, tu, tv):
    """Default slot body: constant yellow (shader_placeholder.cpp:1-4)."""
    shape = position.shape[:-1] + (3,)
    return jnp.broadcast_to(jnp.array([1.0, 1.0, 0.0], jnp.float32), shape)


_REGISTRY: list = [_placeholder] * MAX_SHADERS


def register_shader(slot: int, fn) -> None:
    if not (0 <= slot < MAX_SHADERS):
        raise ValueError(f"shader slot must be in [0, {MAX_SHADERS})")
    _REGISTRY[slot] = fn


def reset_shaders() -> None:
    for i in range(MAX_SHADERS):
        _REGISTRY[i] = _placeholder


def apply_shaders(shader_id, albedo, position, view_dir, normal, gnormal,
                  tu, tv):
    """Replace albedo where shader_id != -1 (kernel.cpp:530-536).

    Evaluates every registered slot over the wavefront and selects by id —
    with <= 4 slots this is cheaper than any data movement a true branch
    would need on TPU.
    """
    out = albedo
    for slot in range(MAX_SHADERS):
        val = _REGISTRY[slot](position, view_dir, normal, gnormal, tu, tv)
        out = jnp.where((shader_id == slot)[..., None], val, out)
    return out
