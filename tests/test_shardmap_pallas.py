"""The REAL multi-chip composition: shard_map over the pixel axis with the
Pallas traversal inside each shard (VERDICT r1 item 7).

On a pod this is the path that runs: GSPMD cannot partition a pallas_call,
so each device executes the kernel on its own pixel slice via shard_map
(parallel/mesh.py:shard_map_render_step).  CPU runs the kernel in
interpret mode — same trace, same shardings, 8 virtual devices.
"""

import numpy as np

import jax

from scenes import cornell_scene

from elevenrender_tpu.parallel.mesh import (make_mesh, replicate_ir,
                                            shard_map_render_step,
                                            shard_render_state)
from elevenrender_tpu.render.integrator import init_state, render_sample


def _run(trace_mode):
    res = 32  # 1024 px / 8 devices = 128 per shard = pallas pad to 1 tile
    scene, config, ir = cornell_scene(res=res, spp=1)
    config = config.replace(compat=False, trace_mode=trace_mode,
                            max_bounces=3)

    # Single-device reference.
    ref = render_sample(config, ir, init_state(config))
    ref_img = np.asarray(ref["passes"][0, :, :3])

    mesh = make_mesh(8)
    ir_r = replicate_ir(ir, mesh)
    state = shard_render_state(init_state(config), mesh)
    step = shard_map_render_step(config, mesh)(ir_r)
    out = step(ir_r, state)
    img = np.asarray(out["passes"][0, :, :3])
    return ref_img, img


def test_shard_map_pallas_matches_single_device():
    assert len(jax.devices()) >= 8
    ref, img = _run("pallas")
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(img).all() and img.max() > 0.1


def test_shard_map_pallas_stream_matches_single_device():
    """The HBM-streaming kernel under shard_map — BASELINE config 5's
    actual pod path (~1M tris sharded across chips)."""
    ref, img = _run("pallas_stream")
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(img).all() and img.max() > 0.1
