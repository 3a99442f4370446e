"""A/B the per-bounce sort implementation on the real integrator:
argsort (XLA comparison sort) vs counting (ops/sort.counting_order) —
docs/PERF.md 'next levers' #1.

Run: REPS=8 python -u scripts/ab_sortimpl.py | tee .runlogs/ab_sortimpl.log
"""
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

from scenes import heightfield_scene
from elevenrender_tpu.render.integrator import init_state, render_samples_jit

GRID = int(os.environ.get("GRID", "182"))
RES = int(os.environ.get("RES", "1024"))
REPS = int(os.environ.get("REPS", "8"))

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                      compat=False)
rays = 2.0 * config.max_bounces * RES * RES


def timeit(label, cfg):
    state = init_state(cfg)
    state = render_samples_jit(cfg, ir, state, 2)
    float(jnp.sum(state["samples"]))
    t0 = time.time()
    state = render_samples_jit(cfg, ir, state, REPS)
    float(jnp.sum(state["samples"]))
    dt = (time.time() - t0) / REPS
    print(f"{label:36s} {dt*1e3:8.1f} ms/sample ({rays/dt/1e6:.2f} Mrays/s)",
          flush=True)
    return dt


timeit("argsort (default) [burn]", config)
timeit("counting [burn]", config.replace(sort_impl="counting"))
a = timeit("argsort (default)", config)
b = timeit("counting", config.replace(sort_impl="counting"))
print(f"counting vs argsort: {b / a:.3f}x (<1 = counting wins)", flush=True)
