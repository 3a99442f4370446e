"""A/B narrow any-hit shadow tiles (config.shadow_pallas_sub) under the
r4 direction-major sort default (PERF.md 'next levers' #3: r3 measured
no win under position-major keys; dir-major tiles are
occlusion-correlated, so tile-granular early termination may now fire).

Run: REPS=8 python -u scripts/ab_shadowsub.py | tee .runlogs/ab_shadowsub.log
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
    print(f"{label:40s} {dt*1e3:8.1f} ms/sample ({rays/dt/1e6:.2f} Mrays/s)",
          flush=True)
    return dt


# Transient-proof ordering: both configs once sacrificially, then timed.
timeit("shadow_sub=32 (default) [burn]", config)
timeit("shadow_sub=8 [burn]", config.replace(shadow_pallas_sub=8))
a = timeit("shadow_sub=32 (default)", config)
b = timeit("shadow_sub=8", config.replace(shadow_pallas_sub=8))
c = timeit("shadow_sub=16", config.replace(shadow_pallas_sub=16))
print(f"sub=8 vs 32: {b / a:.3f}x   sub=16 vs 32: {c / a:.3f}x "
      f"(<1 = narrow wins)", flush=True)
