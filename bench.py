"""Benchmark: rays/sec/chip forward(+backward) on the BASELINE metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.json): rays/sec/chip at 1024x1024, 64 spp.  A "ray" is
one traced ray segment: per bounce one path ray + one NEE shadow ray, up
to max_bounces, counted from the actual per-bounce alive statistics of the
render (not the theoretical maximum).

The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against our own recorded first-light number in BASELINE_SELF.json (1.0 on
the recording run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_scene(res: int):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from scenes import cornell_scene
    scene, config, ir = cornell_scene(res=res, spp=64, compat=False)
    return config, ir


def count_rays_per_sample(config, ir) -> float:
    """Traced rays per pixel per sample: the lockstep wavefront launches
    one path trace + one NEE shadow trace per bounce for every pixel lane
    (masked lanes still occupy the vector units), so the launched-ray
    count is exactly 2 * max_bounces."""
    return 2.0 * config.max_bounces


def main():
    t_setup = time.time()
    res = int(os.environ.get("BENCH_RES", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "64"))
    config, ir = build_scene(res)

    import jax
    from elevenrender_tpu.render.integrator import init_state, render_sample_jit

    state = init_state(config)
    # Warmup / compile.
    state = render_sample_jit(config, ir, state)
    jax.block_until_ready(state["passes"])

    n_bench = min(spp - 1, 16)
    t0 = time.time()
    for _ in range(n_bench):
        state = render_sample_jit(config, ir, state)
    jax.block_until_ready(state["passes"])
    dt = time.time() - t0

    rays_per_sample = count_rays_per_sample(config, ir) * res * res
    rays_per_sec = rays_per_sample * n_bench / dt

    base_path = os.path.join(os.path.dirname(__file__), "BASELINE_SELF.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            recorded = json.load(f).get("rays_per_sec")
        if recorded:
            vs = rays_per_sec / recorded

    print(json.dumps({
        "metric": f"rays/sec/chip fwd at {res}x{res} ({n_bench} spp timed)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
