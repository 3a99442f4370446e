"""Benchmark: rays/sec/chip on the BASELINE metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scene: a 65k-triangle heightfield + HDRI sky + glossy Disney terrain
(BASELINE config 5 shaped, VMEM-resident so the Pallas packet-traversal
kernel is exercised), rendered at 1024x1024 in native mode.  A "ray" is
one traced path or NEE shadow segment: the lockstep wavefront launches
2 * max_bounces rays per pixel per sample (masked lanes still occupy the
vector units).

Timing note: on the tunneled TPU (axon), block_until_ready does NOT wait
for remote execution — every timing boundary materializes a scalar
reduction instead.

vs_baseline compares against our recorded number in BASELINE_SELF.json
(the reference publishes none, BASELINE.md); 1.0 on the recording run.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "64"))
    grid = int(os.environ.get("BENCH_GRID", "182"))  # ~65k tris

    import jax
    # Persistent compile cache: the integrator at 1024x1024/65k tris takes
    # ~2min to compile on the tunneled TPU; cached reruns skip it.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scenes import heightfield_scene
    from elevenrender_tpu.render.integrator import init_state, render_sample_jit

    scene, config, ir = heightfield_scene(grid=grid, res=res, spp=spp,
                                          compat=False)

    def sync(state):
        return float(jnp.sum(state["samples"]))

    state = init_state(config)
    state = render_sample_jit(config, ir, state)
    sync(state)  # compile + first sample fully materialized

    n_bench = min(spp - 1, int(os.environ.get("BENCH_STEPS", "8")))
    t0 = time.time()
    for _ in range(n_bench):
        state = render_sample_jit(config, ir, state)
    sync(state)
    dt = time.time() - t0

    rays = 2.0 * config.max_bounces * res * res * n_bench
    rays_per_sec = rays / dt

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_SELF.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            recorded = json.load(f).get("rays_per_sec")
        if recorded:
            vs = rays_per_sec / recorded

    print(json.dumps({
        "metric": f"rays/sec/chip fwd, {grid*grid*2//1000}k tris at "
                  f"{res}x{res} ({n_bench} spp timed)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
