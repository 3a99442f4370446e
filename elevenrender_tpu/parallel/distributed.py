"""Multi-host rendering glue.

The reference is strictly single-process (SURVEY.md §5); scale-out here
follows the standard JAX multi-controller recipe: every host runs the same
program, ``jax.distributed.initialize`` wires the hosts into one system,
and the pixel-axis Mesh (parallel/mesh.py) simply spans all hosts' devices
— collectives ride ICI within a slice and DCN across slices, inserted by
GSPMD.  Scene tables are replicated per device; the per-pixel accumulator
state is sharded, so each host holds only its slice of the image.

Usage on each host::

    from elevenrender_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods auto-detect)
    mesh = distributed.global_mesh()  # 1-D mesh over ALL devices

    # build scene identically on every host, then:
    ir = replicate_ir(ir, mesh)
    state = shard_render_state(init_state(config), mesh)
    step = sharded_render_step(config, mesh)
    ...
    image = distributed.gather_image(state["passes"])  # host 0 only

Testable without a cluster: the 8-virtual-device CPU mesh exercises the
same sharded program (tests/test_grad_and_sharding.py,
tests/test_large_scene.py).
"""

from __future__ import annotations

import numpy as np

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection; explicit
    args for CPU/GPU clusters.  No-op if already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh():
    """1-D pixel mesh over every device of every host."""
    return make_mesh(devices=jax.devices())


def gather_image(passes) -> np.ndarray | None:
    """Assemble the full pass stack on process 0 (the only cross-host
    all-gather in the forward path, done once per readback — SURVEY.md §5
    'all-gathers only at image assembly')."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return np.asarray(passes)
    gathered = multihost_utils.process_allgather(passes, tiled=True)
    return np.asarray(gathered) if jax.process_index() == 0 else None
