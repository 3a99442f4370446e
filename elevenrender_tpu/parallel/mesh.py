"""Multi-device rendering: pixel-axis sharding over a device Mesh.

The reference is single-device SYCL; its only parallel decomposition is
per-pixel work-items (kernel.cpp:659-706).  The TPU-native scale-out is
the same axis made explicit: a 1-D ``jax.sharding.Mesh`` over the pixel
dimension, with the scene IR replicated and per-pixel accumulator state
sharded.  The forward render needs NO collectives (embarrassingly parallel
over rays); inverse rendering's parameter gradients are all-reduced over
ICI automatically by GSPMD when the sharded pixel loss backpropagates into
the replicated material/HDRI/camera tables.

Two entry points:
- ``shard_render_state`` / ``replicate_ir`` + a jitted step: GSPMD path
  (idiomatic; XLA partitions the whole integrator).
- ``make_mesh`` for explicit mesh control; multi-host via
  ``jax.distributed`` composes transparently (the Mesh just spans hosts).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIXEL_AXIS = "pixels"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (PIXEL_AXIS,))


def replicate_ir(ir: dict, mesh: Mesh) -> dict:
    """Scene tables live replicated on every device (BVH/material/texture
    replication — the 'model replication' analog)."""
    spec = NamedSharding(mesh, P())
    return jax.device_put(ir, spec)


def shard_render_state(state: dict, mesh: Mesh) -> dict:
    """Accumulator state sharded along the pixel axis."""
    return {
        "passes": jax.device_put(
            state["passes"], NamedSharding(mesh, P(None, PIXEL_AXIS, None))),
        "samples": jax.device_put(
            state["samples"], NamedSharding(mesh, P(PIXEL_AXIS))),
        "rng": jax.device_put(
            state["rng"], NamedSharding(mesh, P(PIXEL_AXIS))),
    }


def sharded_render_step(config, mesh: Mesh):
    """Build a jitted one-sample step with explicit output shardings
    (GSPMD path — fine for the jnp trace modes, where XLA partitions the
    whole program over the pixel axis)."""
    from ..render.integrator import render_sample

    state_sharding = {
        "passes": NamedSharding(mesh, P(None, PIXEL_AXIS, None)),
        "samples": NamedSharding(mesh, P(PIXEL_AXIS)),
        "rng": NamedSharding(mesh, P(PIXEL_AXIS)),
    }

    def step(ir, state):
        return render_sample(config, ir, state)

    return jax.jit(step, out_shardings=state_sharding, donate_argnums=1)


def shard_map_render_step(config, mesh: Mesh):
    """Explicit per-device step via shard_map: each device runs the
    integrator (including Pallas kernels, which GSPMD cannot partition)
    on its OWN pixel slice, with globally-correct pixel indices.

    This is the multi-chip path for trace_mode="pallas"/"packet"."""
    import jax.numpy as jnp
    shard_map = jax.shard_map
    from ..render.integrator import render_sample

    n_dev = mesh.size
    npix = config.x_res * config.y_res
    if npix % n_dev != 0:
        raise ValueError(f"{npix} pixels not divisible by {n_dev} devices")
    local = npix // n_dev

    state_specs = {"passes": P(None, PIXEL_AXIS, None),
                   "samples": P(PIXEL_AXIS), "rng": P(PIXEL_AXIS)}

    def ir_specs(ir):
        return jax.tree.map(lambda _: P(), ir)

    def make(ir_tree):
        @jax.jit
        def step(ir, state):
            def local_step(ir, state):
                off = jax.lax.axis_index(PIXEL_AXIS).astype(jnp.int32) * local
                return render_sample(config, ir, state, pixel_offset=off)
            return shard_map(local_step, mesh=mesh,
                             in_specs=(ir_specs(ir_tree), state_specs),
                             out_specs=state_specs,
                             check_vma=False)(ir, state)
        return step

    return make
