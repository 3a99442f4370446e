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
# Bumped on every mutation; build_ir bakes it into the STATIC RenderConfig
# (shader_version) so a rebind after a compile forces a retrace — the
# registry is read at trace time, and without this a cached executable
# would keep the OLD shader body baked in while the server logs success.
_VERSION: int = 0


def registry_version() -> int:
    return _VERSION


def register_shader(slot: int, fn) -> None:
    global _VERSION
    if not (0 <= slot < MAX_SHADERS):
        raise ValueError(f"shader slot must be in [0, {MAX_SHADERS})")
    _REGISTRY[slot] = fn
    _VERSION += 1


def reset_shaders() -> None:
    global _VERSION
    for i in range(MAX_SHADERS):
        _REGISTRY[i] = _placeholder
    _VERSION += 1


def _checker(position, view_dir, normal, gnormal, tu, tv):
    """8x8 UV checkerboard — a classic procedural-shader demo body."""
    c = ((jnp.floor(tu * 8.0) + jnp.floor(tv * 8.0)) % 2.0)[..., None]
    return jnp.broadcast_to(c, position.shape[:-1] + (3,)) * 0.8 + 0.1


def _normal_rgb(position, view_dir, normal, gnormal, tu, tv):
    """Shading-normal visualization (n * 0.5 + 0.5)."""
    return normal * 0.5 + 0.5


def _uv_gradient(position, view_dir, normal, gnormal, tu, tv):
    """UV debug gradient (u, v, 0.5)."""
    return jnp.stack([tu, tv, jnp.full_like(tu, 0.5)], axis=-1)


# Named shader library for the wire protocol: `load_osl_material` selects
# one of these BY NAME (no code crosses the wire — the TPU analog of the
# reference's ASL slots, which are compiled into the binary at build time
# and merely *selected* at runtime via albedoShaderID, shader.h:5-18).
NAMED_SHADERS = {
    "yellow": _placeholder,
    "checker": _checker,
    "normal_rgb": _normal_rgb,
    "uv_gradient": _uv_gradient,
}


def register_named_shader(name: str, fn) -> None:
    """Extend the named library (Python API; server selection is by name)."""
    NAMED_SHADERS[name] = fn


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
