"""Config-5-shaped bench stage (VERDICT r3 ask #3): the HARD scene.

Textured ~1M-tri heightfield (HBM-stream residency + checker-albedo
atlas fetches + normal mapping + point light) at 1024x1024, native mode:
  - fwd: progressive samples, ONE sample per dispatch (stream scale —
    bounded single-dispatch wall time, see docs/PERF.md);
  - fwd+bwd: the accumulated two-pass gradient at BENCH_C5_GRAD_SPP
    (default 2) samples, chunk=1;
  - alive fraction via the integrator's count_rays instrumentation.

Prints ONE JSON line; bench.py runs this in a SUBPROCESS and folds the
result into extra.config5_* so a worker fault in the hard stage cannot
lose the headline numbers.

Standalone: BENCH_GRID5=708 python scripts/bench_config5.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from scenes import textured_heightfield_scene
from elevenrender_tpu.render.grad import fwd_bwd_step_accum
from elevenrender_tpu.render.integrator import (init_state,
                                                render_samples_jit,
                                                _resolve_trace_mode)


def main():
    res = int(os.environ.get("BENCH_RES", "1024"))
    grid = int(os.environ.get("BENCH_GRID5", "708"))
    steps = int(os.environ.get("BENCH_C5_STEPS", "2"))
    grad_spp = int(os.environ.get("BENCH_C5_GRAD_SPP", "2"))

    scene, config, ir = textured_heightfield_scene(grid=grid, res=res,
                                                   compat=False)
    T = int(ir["tris"]["verts"].shape[0])
    mode = _resolve_trace_mode(config, ir)
    rays_per_sample = 2.0 * config.max_bounces * res * res

    def sync(state):
        return float(jnp.sum(state["samples"]))

    # ---- fwd, 1 sample per dispatch ------------------------------------
    state = init_state(config)
    state = render_samples_jit(config, ir, state, 1)
    sync(state)  # compile + warm
    t0 = time.time()
    for _ in range(steps):
        state = render_samples_jit(config, ir, state, 1)
    sync(state)
    dt = (time.time() - t0) / steps
    fwd_rate = rays_per_sample / dt
    print(f"[c5] fwd {fwd_rate:.0f} rays/s ({dt*1e3:.0f} ms/sample, "
          f"mode={mode})", file=sys.stderr, flush=True)

    # ---- alive accounting ----------------------------------------------
    cfg_count = config.replace(count_rays=True)
    st = init_state(cfg_count)
    st = render_samples_jit(cfg_count, ir, st, 1)
    alive_per_sample = float(st["ray_count"])
    alive_fraction = alive_per_sample / rays_per_sample

    # ---- fwd+bwd accumulated, chunk=1 ----------------------------------
    # remat_bounces: without it the per-sample VJP at this scale holds
    # ~5 bounces of wavefront residuals and overflows HBM by 63MB
    # (.runlogs/bench_config5_r04.log) — recompute beats spill.
    config = config.replace(remat_bounces=True)
    target = jnp.zeros((res * res, 3), jnp.float32)
    loss, grads = fwd_bwd_step_accum(config, ir, target, grad_spp, chunk=1)
    float(loss)
    float(jnp.sum(grads["materials"]["albedo"]))
    t0 = time.time()
    loss, grads = fwd_bwd_step_accum(config, ir, target, grad_spp, chunk=1)
    float(loss)
    float(jnp.sum(grads["materials"]["albedo"]))
    dt_bwd = (time.time() - t0) / grad_spp
    bwd_rate = rays_per_sample / dt_bwd
    print(f"[c5] fwd+bwd {bwd_rate:.0f} rays/s", file=sys.stderr, flush=True)

    print(json.dumps({
        "config5_tris": T,
        "config5_trace_mode": mode,
        "config5_rays_per_sec": round(fwd_rate, 1),
        "config5_fwd_bwd_rays_per_sec": round(bwd_rate, 1),
        "config5_ms_per_sample": round(dt * 1e3, 1),
        "config5_alive_fraction": round(alive_fraction, 4),
        "config5_alive_rays_per_sec": round(fwd_rate * alive_fraction, 1),
    }))


if __name__ == "__main__":
    main()
