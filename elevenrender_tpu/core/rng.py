"""Counter-free per-pixel RNG.

Replicates the reference generator exactly so renders are reproducible
against the same algorithm: a xorshift32 stream seeded with a Jenkins
one-at-a-time hash of (pixel_index + 1)
(/root/reference/src/kernel.cpp:25-47).  State is a uint32 array with one
lane per pixel, carried across progressive samples just like the
reference's ``dev_randstate`` (/root/reference/src/kernel.cpp:483,645).

All ops are elementwise uint32 arithmetic -> pure VPU work on TPU.
A `jax.random`-based threefry path is available for native mode via
``native_uniform`` when bit-parity is not required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_UINT_MAX_F = 4294967295.0


def jenkins_hash(seed):
    """Jenkins one-at-a-time hash over the 4 bytes of a uint32.

    Parity with kernel.cpp:25-36 (byte order: LSB first).
    """
    seed = seed.astype(jnp.uint32)
    h = jnp.zeros_like(seed)
    for i in range(4):
        h = h + ((seed >> jnp.uint32(i * 8)) & jnp.uint32(0xFF))
        h = h + (h << jnp.uint32(10))
        h = h ^ (h >> jnp.uint32(6))
    h = h + (h << jnp.uint32(3))
    h = h ^ (h >> jnp.uint32(11))
    h = h + (h << jnp.uint32(15))
    return h


def init_state(pixel_idx):
    """RngGenerator(idx) seeds with jenkins(idx + 1) (kernel.cpp:38-40)."""
    return jenkins_hash(pixel_idx.astype(jnp.uint32) + jnp.uint32(1))


def next_state(state):
    """One xorshift32 step (kernel.cpp:42-46)."""
    state = state ^ (state << jnp.uint32(13))
    state = state ^ (state >> jnp.uint32(17))
    state = state ^ (state << jnp.uint32(5))
    return state


def to_float(state):
    """float(state) / UINT_MAX, matching the reference's conversion."""
    return state.astype(jnp.float32) / jnp.float32(_UINT_MAX_F)


def next_float(state):
    """Advance and return (new_state, uniform in [0,1])."""
    state = next_state(state)
    return state, to_float(state)


def next_float_masked(state, mask):
    """Advance only lanes where ``mask`` is True.

    Divergent lanes in the reference consume different numbers of randoms
    (e.g. the opacity pass-through path, kernel.cpp:539-592); masking the
    state update keeps the per-pixel streams bit-identical to the scalar
    program.
    Returns (new_state, value).  Value for masked-off lanes is whatever the
    advanced state would produce — callers must not use it there.
    """
    new = next_state(state)
    state = jnp.where(mask, new, state)
    return state, to_float(new)


def native_uniform(key, shape):
    """Native-mode generator: threefry, decorrelated, for production use."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)
